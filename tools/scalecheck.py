"""Scaling probe: does per-row cost stay flat as input multiplies?

Replays representative operators over 1x / 4x / 16x unions of the
fixture tables (keys offset per copy so cardinalities scale too) and
reports wall seconds and Mrows/s per scale step. Flat-or-rising
throughput across steps means the plan's cost is data-proportional
with no super-linear term — the measurable form of the "survives a
100x scale-up" claim. Results table lives in SCALING.md.

Usage::

    python tools/scalecheck.py            # sf0.1 base, multipliers 1 4 16
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from real_time_big_data_architect_spark.session import get_spark  # noqa: E402
from real_time_big_data_architect_spark.operators.dedup import (  # noqa: E402
    _minhash_text,
)
from real_time_big_data_architect_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULTS = (1, 4, 16)


def _scaled(df: DataFrame, key: str, mult: int, stride: int) -> DataFrame:
    copies = [
        df.withColumn(key, F.col(key) + F.lit(i * stride)) for i in range(mult)
    ]
    return functools.reduce(DataFrame.unionByName, copies)


def _timed(label: str, mult: int, n_rows: int, df: DataFrame) -> dict:
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    rate = n_rows / dt / 1e6
    print(
        f"{label:24s} x{mult:<3d} {n_rows/1e6:8.2f} Mrows "
        f"{dt:7.2f}s  {rate:7.2f} Mrows/s",
        flush=True,
    )
    return {"op": label, "mult": mult, "rows": n_rows, "sec": round(dt, 2),
            "mrows_per_s": round(rate, 2)}


def main() -> None:
    spark = get_spark("scalecheck")
    ev_base = load_table(spark, SF_DIR, "events")
    doc_base = load_table(spark, SF_DIR, "documents")
    n_ev = ev_base.count()
    n_doc = doc_base.count()
    results = []

    for mult in MULTS:
        ev = _scaled(ev_base, "event_id", mult, 10_000_000)
        # tumbling agg: scan + one partial-agg shuffle
        results.append(_timed(
            "tumbling_agg", mult, n_ev * mult,
            ev.groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(30,4)")).alias("s")),
        ))
        # per-user window: shuffle on user_id + in-partition sort
        results.append(_timed(
            "sessionize_window", mult, n_ev * mult,
            ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count("*").alias("n")),
        ))
        # distinct agg: two-phase shuffle
        results.append(_timed(
            "distinct_count", mult, n_ev * mult,
            ev.groupBy("event_type").agg(
                F.countDistinct("user_id").alias("u")),
        ))

    for mult in MULTS:
        docs = _scaled(doc_base, "doc_id", mult, 10_000_000)
        # Arrow kernel: embarrassingly parallel per-doc compute
        results.append(_timed(
            "minhash_signatures", mult, n_doc * mult,
            docs.repartition(spark.sparkContext.defaultParallelism)
            .select("doc_id", _minhash_text("text").alias("mh")),
        ))

    import json

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
