"""Lakehouse mutation patterns — MERGE upsert and SCD2 history.

The reference has no persistence at all (each tick recomputes and
discards, app.py:37); a lake-backed engine needs the two standard
mutation idioms, both expressed as pure joins/windows so they run
anywhere Spark runs:

* ``merge_upsert`` — MERGE INTO semantics (update-on-match,
  insert-on-no-match) as a full-outer join + coalesce. This is the
  copy-on-write kernel inside Delta/Iceberg MERGE: one shuffle on the
  merge key for each side, no driver involvement, and at 100 TB both
  sides partition on the same key so AQE plans a co-located join. The
  change-set here is derived deterministically from the base table
  (every 7th key updated, every 11th inserted under a shifted key) so
  the oracle can rebuild it exactly.

* ``scd2_history`` — a slowly-changing-dimension type-2 build: collapse
  an event log into attribute versions with [valid_from, valid_to)
  ranges via lag-change detection + lead. Two windows over the same
  (user_id) partitioning — one shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.tables import load_table

#: deterministic change-set rules (mirrored in the oracle SQL)
UPDATE_MOD = 7
INSERT_MOD = 11
INSERT_REMAINDER = 3
INSERT_KEY_SHIFT = 100_000_000


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO orders: update matched keys, insert unmatched ones."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = base.filter(F.col("o_orderkey") % UPDATE_MOD == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("R").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
    )
    inserts = base.filter(
        F.col("o_orderkey") % INSERT_MOD == INSERT_REMAINDER
    ).select(
        (F.col("o_orderkey") + INSERT_KEY_SHIFT).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    changes = updates.unionAll(inserts)
    b = base.alias("b")
    c = changes.alias("c")
    return b.join(c, "o_orderkey", "full_outer").select(
        "o_orderkey",
        F.coalesce(F.col("c.o_custkey"), F.col("b.o_custkey")).alias(
            "o_custkey"
        ),
        F.coalesce(F.col("c.o_orderstatus"), F.col("b.o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.coalesce(F.col("c.o_totalprice"), F.col("b.o_totalprice")).alias(
            "o_totalprice"
        ),
        F.when(F.col("b.o_custkey").isNull(), F.lit("insert"))
        .when(F.col("c.o_custkey").isNotNull(), F.lit("update"))
        .otherwise(F.lit("keep"))
        .alias("merge_action"),
    )


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2: per-user event_type versions with validity ranges.

    A version starts whenever the attribute differs from its lag;
    ``valid_to`` is the next version's start (NULL = current). Change
    detection and the lead both run over the ``user_id`` partitioning,
    so the whole build is one shuffle + two in-stage sorts.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    wv = W.partitionBy("user_id").orderBy("ts", "event_id")
    return flagged.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wv).alias("valid_to"),
        F.row_number().over(wv).alias("version"),
    )


QUERIES = {
    "merge_upsert": merge_upsert,
    "scd2_history": scd2_history,
}

ORACLE = {
    "merge_upsert": """
        WITH base AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM orders
        ),
        changes AS (
            SELECT o_orderkey, o_custkey,
                   'R' AS o_orderstatus,
                   o_totalprice + 100.0 AS o_totalprice
            FROM base WHERE o_orderkey % 7 = 0
            UNION ALL
            SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice
            FROM base WHERE o_orderkey % 11 = 3
        )
        SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
               COALESCE(c.o_custkey, b.o_custkey) AS o_custkey,
               COALESCE(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
               COALESCE(c.o_totalprice, b.o_totalprice) AS o_totalprice,
               CASE WHEN b.o_custkey IS NULL THEN 'insert'
                    WHEN c.o_custkey IS NOT NULL THEN 'update'
                    ELSE 'keep' END AS merge_action
        FROM base b FULL OUTER JOIN changes c USING (o_orderkey)
    """,
    "scd2_history": """
        WITH flagged AS (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        versions AS (
            SELECT user_id, event_type, ts, event_id
            FROM flagged
            WHERE prev_type IS NULL OR prev_type <> event_type
        )
        SELECT user_id, event_type,
               ts AS valid_from,
               LEAD(ts) OVER w AS valid_to,
               CAST(ROW_NUMBER() OVER w AS INT) AS version
        FROM versions
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
}
