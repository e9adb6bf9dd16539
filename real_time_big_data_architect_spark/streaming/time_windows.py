"""Event-time windows: tumbling / sliding / session (north star NS5).

All three run on the batch events table here (Spark's ``window`` and
``session_window`` are batch-capable since 3.2) — identical expressions
drive the streaming variants in ``stateful.py``. Tumbling and session
shapes are SQL-expressible, so they get DuckDB oracles; sliding's
overlapping assignment is oracled with a range() cross-join expansion.

Null-ts rows: Spark's ``window``/``session_window`` grouping silently
DROPS rows whose event-time is NULL (the TimeWindowing rule filters
them), so every oracle filters ``ts IS NOT NULL`` explicitly — without
it a null-bearing vintage would keep a NULL-keyed group on the oracle
side only and fail the differential with a false 'operator wrong'
signal (r10 review finding; fixtures carry no NULL ts today).

Scale notes: a tumbling agg is an ordinary hash agg on (window, keys) —
one shuffle; sliding multiplies rows by windows/slide; session windows
shuffle by key then merge ranges in-state. Money/value sums accumulate
in exact decimal for hash-stable comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.tables import load_table


def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts/sums per event_type (NS5).

    Emits the window start as a plain timestamp (``date_trunc`` twin in
    the oracle).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 minutes (NS5).

    Each event lands in exactly 4 overlapping windows (window/slide =
    4), so the oracle reproduces the assignment by cross-joining each
    event with k∈0..3 and flooring to the slide boundary.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows per user (NS5).

    ``session_window`` merges events whose gap is ≤ 30 min — the
    boundary is INCLUSIVE (an event exactly gap-distance after the
    previous one extends the session; verified against Spark by the
    adversarial differential, which caught the oracle using the
    strict inequality). The oracle reproduces the same sessionization
    with lag + cumulative session ids, splitting only when the gap is
    strictly greater than 30 min.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,4)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


QUERIES = {
    "tumbling_window_agg": tumbling_window_agg,
    "sliding_window_agg": sliding_window_agg,
    "session_window_agg": session_window_agg,
}

ORACLE = {
    "sliding_window_agg": """
        SELECT window_start,
               window_start + INTERVAL 1 HOUR AS window_end,
               event_type,
               COUNT(*) AS n_events
        FROM (
            SELECT TIMESTAMP '1970-01-01 00:00:00'
                     + INTERVAL (CAST(floor(epoch(ts)/900) AS BIGINT)*900
                                 - r.range*900) SECOND AS window_start,
                   event_type
            FROM events CROSS JOIN range(4) r
            WHERE ts IS NOT NULL
        )
        GROUP BY 1, 2, 3
    """,
    "tumbling_window_agg": """
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
        FROM events
        WHERE ts IS NOT NULL
        GROUP BY 1, 2
    """,
    "session_window_agg": """
        WITH ordered AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL 30 MINUTE
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WHERE ts IS NOT NULL
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM ordered
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
        FROM sessions
        GROUP BY user_id, session_id
    """,
}
