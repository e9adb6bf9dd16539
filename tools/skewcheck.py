"""Skew posture probe: does a hot join key break the engine?

Builds a deliberately skewed fact table (half of ALL rows carry ONE
join key, each row dragging a ~128 B payload so the hot partition has
real shuffle BYTES) at growing multipliers and joins it to a
non-broadcastable dimension three ways: plain shuffle join with AQE
skew handling on, the same with it off, and the engine's manual
salting pattern (operators/joins.py join_skew_salted).

The r8 probe planted a key too mild to cross AQE's split thresholds,
so on/off walls were identical and the table demonstrated nothing
(r8 verdict item 4). This probe scales the THRESHOLD to the fixture
instead of scaling the fixture to the production threshold — the
ratios are what AQE keys on: hot partition ≫ skewedPartitionThreshold
≫ advisoryPartitionSize, here 28–112 MB ≫ 8 MB ≫ 2 MB at ×4/×16 vs
the production 256 MB / 64 MB defaults — so the probe exercises the
REAL splitter path (OptimizeSkewedJoin) and records, per run, the
wall time and the reduce-side task count of the join stage (split
visible as task count ≫ shuffle partitions).

Broadcast is disabled for the probe (a broadcastable dim would
sidestep shuffle skew entirely — that IS the first-choice fix; the
probe measures the case where the dim is too big for it).

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
#: probe-scaled AQE skew thresholds (see module docstring)
SKEW_THRESHOLD = "8m"
ADVISORY_SIZE = "2m"


def _skewed_fact(ev: DataFrame, mult: int) -> DataFrame:
    """mult× union of events where half of ALL rows get user_id=HOT_KEY
    and every row carries a ~128 B incompressible payload — the hot
    partition must have BYTES, not just rows, to cross the skew
    threshold."""
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
    ).withColumn(
        "payload",
        F.concat(*[
            F.md5(F.concat(F.col("event_id").cast("string"), F.lit(s)))
            for s in ("a", "b", "c", "d")
        ]),
    )


def _dim(spark, ev: DataFrame) -> DataFrame:
    # unique-key dim wide enough that broadcast would be the wrong
    # reflex at scale; broadcast is disabled in the probe session anyway.
    # MATERIALIZED (localCheckpoint) so the distinct()'s hash
    # partitioning on user_id does not flow into the join: a dim side
    # whose partitioning already satisfies the SMJ skips its join-side
    # exchange, and OptimizeSkewedJoin — which pattern-matches BOTH
    # sides as plain Sort-over-ShuffleQueryStage — then refuses to
    # split EITHER side, fact included (second r8-probe bug, found by
    # plan bisection; see SCALING.md skew section).
    return (
        ev.select("user_id")
        .distinct()
        .withColumn("dim_payload", F.md5(F.col("user_id").cast("string")))
        .localCheckpoint(eager=True)
    )


def _timed_with_tasks(spark, df: DataFrame) -> tuple[float, int]:
    """(wall seconds, total task count across the run's jobs) — the
    task count makes an AQE skew split visible: a split hot partition
    runs as many extra reduce tasks."""
    df.write.format("noop").mode("overwrite").save()  # warm
    tracker = spark.sparkContext.statusTracker()
    before_jobs = set(tracker.getJobIdsForGroup(None) or [])
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    tasks = 0
    for jid in set(tracker.getJobIdsForGroup(None) or []) - before_jobs:
        ji = tracker.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = tracker.getStageInfo(sid)
            if si is not None:
                tasks += si.numTasks
    return dt, tasks


def main() -> None:
    spark = get_spark(
        "skewcheck",
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                SKEW_THRESHOLD,
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": ADVISORY_SIZE,
        },
    )
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    dim = _dim(spark, ev)  # eager localCheckpoint: already materialized
    # CONSUME the join without requiring its partitioning: a
    # groupBy(user_id) directly on the join output reuses the join's
    # hash distribution, and OptimizeSkewedJoin correctly refuses to
    # split a partition some downstream operator depends on — the r8
    # probe's real bug, beyond the mild key. A map-side projection
    # (per-row hash + noop write) leaves AQE free to split.
    agg = lambda j: j.select(  # noqa: E731
        F.xxhash64("payload", "dim_payload").alias("h")
    )
    print("mode         mult  rows(M)   sec  tasks")
    results = []
    for mult in MULTS:
        fact = _skewed_fact(ev, mult).persist()
        n = fact.count()
        joined = agg(fact.join(dim, "user_id"))

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        t_aqe, k_aqe = _timed_with_tasks(spark, joined)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t_off, k_off = _timed_with_tasks(spark, joined)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

        salt = F.pmod(F.col("event_id"), F.lit(N_SALT))
        fact_s = fact.withColumn("salt", salt)
        dim_s = dim.crossJoin(
            spark.range(N_SALT).select(F.col("id").cast("int").alias("salt"))
        )
        t_salt, k_salt = _timed_with_tasks(
            spark, agg(fact_s.join(dim_s, ["user_id", "salt"]))
        )
        for mode, t, k in (
            ("aqe_skew", t_aqe, k_aqe),
            ("no_skew_opt", t_off, k_off),
            ("salted", t_salt, k_salt),
        ):
            print(
                f"{mode:12s} x{mult:<4d} {n/1e6:7.2f} {t:6.2f}s  {k}",
                flush=True,
            )
            results.append(
                {"mode": mode, "mult": mult, "rows": n, "sec": round(t, 2),
                 "tasks": k}
            )
        fact.unpersist()
    import json

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
