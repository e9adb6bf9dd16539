"""Window functions — absent from the reference (SURVEY §2.5 NS3).

rank / row_number, running aggregates, lag/lead, top-k per group.

Scale notes: a window = one shuffle on partitionBy + per-partition sort.
Every ORDER BY below carries a unique tiebreak column so results are
deterministic (and hash-stable vs the oracle). Running sums accumulate
in exact decimal: a running frame is evaluated strictly in frame order
by both engines, but the decimal path removes any fp drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.tables import load_table


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number + rank per customer over order price (NS3)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
    )


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running sum over event time (NS3)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(30,4)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + inter-event gap per user (NS3)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (
            F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
        ).alias("gap_seconds"),
    )


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the canonical window top-k (NS3).

    At 100 TB the window shuffle is unavoidable, but the rn<=k filter
    runs inside the same stage — nothing beyond the top-k rows leaves
    the sort.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour sum per user — an interval RANGE frame (NS3).

    The timeseries staple ("rolling 1h spend"). The frame is expressed
    over ``unix_micros(ts)`` so the range bound is an exact integer in
    both engines (Spark range frames need a numeric ORDER BY; DuckDB
    mirrors with ``epoch_us``). All rows with equal ts are frame peers
    in both engines. Decimal accumulation keeps the sum hash-stable.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)  # 1 hour in microseconds
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(30,4)"))
        .over(w)
        .cast("double")
        .alias("trailing_1h_value"),
    )


QUERIES = {
    "window_rank": window_rank,
    "window_running_sum": window_running_sum,
    "window_lag": window_lag,
    "topk_per_group": topk_per_group,
    "window_range_frame": window_range_frame,
}

ORACLE = {
    "window_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER w AS INT) AS rn,
               CAST(RANK() OVER w AS INT) AS rnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    "window_running_sum": """
        SELECT user_id, event_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(30,4))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_value
        FROM events
    """,
    "window_lag": """
        SELECT user_id, event_id,
               LAG(value) OVER w AS prev_value,
               LEAD(value) OVER w AS next_value,
               epoch(ts) - LAG(epoch(ts)) OVER w AS gap_seconds
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "window_range_frame": """
        SELECT user_id, event_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(30,4))) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS trailing_1h_value
        FROM events
    """,
    "topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
}
