"""Skew posture probe: does a hot join key break the engine?

Builds a deliberately skewed fact table (half of ALL rows carry ONE
join key) at growing multipliers and joins it to a non-broadcastable
dimension three ways: plain shuffle join with AQE skew handling on,
the same with it off, and the engine's manual salting pattern
(operators/joins.py join_skew_salted).

Honest finding (recorded in SCALING.md): at fixture scale the hot
partition is a SUB-SECOND task, so AQE's skew split — which targets
partitions big enough to serialize a stage for minutes — correctly
never fires, and on/off walls are identical. The probe's value is the
salted row: its constant overhead at toy scale is the insurance
premium; at real scale the same plan bounds every task at
|fact|/N_SALT per hot key. Broadcast is disabled for the probe (a
broadcastable dim would sidestep shuffle skew entirely — that IS the
first-choice fix; the probe measures the case where the dim is too
big for it).

Usage::

    python tools/skewcheck.py          # sf0.1 events, multipliers 1 4 16
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from real_time_big_data_architect_spark.session import get_spark  # noqa: E402
from real_time_big_data_architect_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULTS = (1, 4, 16)
HOT_KEY = 7
N_SALT = 16


def _skewed_fact(ev: DataFrame, mult: int) -> DataFrame:
    """mult× union of events where half of ALL rows get user_id=HOT_KEY."""
    copies = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
        for i in range(mult)
    ]
    u = functools.reduce(DataFrame.unionByName, copies)
    return u.withColumn(
        "user_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(HOT_KEY)).otherwise(
            F.col("user_id")
        ),
    )


def _dim(spark, ev: DataFrame) -> DataFrame:
    # unique-key dim wide enough that broadcast would be the wrong
    # reflex at scale; broadcast is disabled in the probe session anyway
    return (
        ev.select("user_id")
        .distinct()
        .withColumn("dim_payload", F.md5(F.col("user_id").cast("string")))
    )


def _timed(df: DataFrame) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(
        "skewcheck",
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    dim = _dim(spark, ev).persist()
    dim.count()
    agg = lambda j: j.groupBy("user_id").agg(  # noqa: E731
        F.count("*").alias("n"), F.count("dim_payload").alias("nd")
    )
    print("mode         mult  rows(M)   sec")
    results = []
    for mult in MULTS:
        fact = _skewed_fact(ev, mult).persist()
        n = fact.count()
        joined = agg(fact.join(dim, "user_id"))

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        t_aqe = _timed(joined)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t_off = _timed(joined)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

        salt = F.pmod(F.col("event_id"), F.lit(N_SALT))
        fact_s = fact.withColumn("salt", salt)
        dim_s = dim.crossJoin(
            spark.range(N_SALT).select(F.col("id").cast("int").alias("salt"))
        )
        t_salt = _timed(
            agg(fact_s.join(dim_s, ["user_id", "salt"]))
        )
        for mode, t in (
            ("aqe_skew", t_aqe),
            ("no_skew_opt", t_off),
            ("salted", t_salt),
        ):
            print(f"{mode:12s} x{mult:<4d} {n/1e6:7.2f} {t:6.2f}s", flush=True)
            results.append(
                {"mode": mode, "mult": mult, "rows": n, "sec": round(t, 2)}
            )
        fact.unpersist()
    import json

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
