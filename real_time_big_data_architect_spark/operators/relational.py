"""Scans, projections, filters, sorts, limits — the reference's core surface.

Reference parity (SURVEY.md §2.1/§2.3): projection (A1, app.py:96-102),
count (A3, app.py:196), equality filter + project (A4, app.py:204-205),
drop-null filter (A6, app.py:211), sort-desc + top-1 (A7, app.py:211,217),
last-k tail (A8, app.py:287), source-side limit pushdown (S4,
app.py:42,45,48).

Scale notes: every query here is a single parquet scan with
filter/projection pushed into the reader (verify via
``.explain`` → ``PushedFilters`` / ``ReadSchema``), no shuffle except
the global sort-limit queries, which Spark executes as per-partition
top-K + single-reduce (TakeOrderedAndProject) — O(K) driver memory even
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.functions.ranking import (
    range_partitioned_prefix_max,
)
from real_time_big_data_architect_spark.tables import load_table


def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + range predicate, both pushed to the parquet scan (A1/S4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


def count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record count (A3: ``len(df)``, app.py:196)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(F.count("*").alias("n_rows"))


def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter + projection (A4: ``df.loc[df.asset=='bitcoin','usd']``)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value"
    )


def filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop-null filter (A6: ``df.dropna(subset=['mag'])``, app.py:211)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.na.drop(subset=["value"]).select("event_id", "event_type", "value")


def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate on a date column (north-star NS; pushdown-checked)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")
    )


def topk_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-desc + top-1 / argmax (A7: latest quake, app.py:211).

    event_id is a deterministic tiebreak so the oracle hash is stable.
    Physical plan: TakeOrderedAndProject (per-partition heap + driver
    merge), no full sort even on a 100 TB scan.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(1)
        .select("event_id", "ts", "event_type", "value")
    )


def lastk_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-30-by-time window for charting (A8: ``.tail(30)``, app.py:287)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(30)
        .select("event_id", "ts", "value")
    )


def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline: parts not dominated on (cheaper price, larger size).

    A part is dominated iff some part is ≤ on price AND ≥ on size with
    one strict. Instead of the O(N²) dominance self-join the oracle
    spells, the plan collapses to per-price group maxima (one partial
    agg) plus one running max over price order: dominated ⇔ a strictly
    cheaper price group reaches my size, or my own price group exceeds
    it. The running max uses the sketch-bounded two-pass prefix-max
    (functions/ranking.py — literal quantile bounds, keyed window,
    nothing persisted), NOT an unpartitioned window — prices are
    near-continuous, so the distinct-price table scales WITH the corpus
    and a single-task window here would be the same scale-killer the
    r5 rank rewires removed. One agg shuffle + one keyed-window
    shuffle + a broadcast join back — the standard distributed skyline
    for 2 dimensions.
    """
    p = load_table(spark, sf_dir, "part")
    gp = p.groupBy("p_retailprice").agg(F.max("p_size").alias("gmax"))
    gp = range_partitioned_prefix_max(
        gp, "p_retailprice", "gmax", "prior_max"
    )
    joined = p.join(F.broadcast(gp), "p_retailprice")
    dominated = (
        F.col("prior_max").isNotNull()
        & (F.col("prior_max") >= F.col("p_size"))
    ) | (F.col("gmax") > F.col("p_size"))
    return joined.filter(~dominated).select(
        "p_partkey", "p_retailprice", "p_size"
    )


#: ONE ANSI SQL string executed verbatim by BOTH engines — see
#: :func:`sql_ansi_interface`. Portability comes from the repo's
#: dialect discipline: round-before-decimal (HALF_UP vs
#: half-away-from-zero agree on positives), explicit final casts, and
#: a deterministic rank tiebreak.
_ANSI_SQL = """
    WITH rev AS (
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(SUM(CAST(round(o.o_totalprice, 2) AS DECIMAL(12,2)))
                    AS DOUBLE) AS revenue
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT n_name, c_custkey, c_name, revenue, CAST(rn AS INT) AS rnk
    FROM (
        SELECT rev.*, ROW_NUMBER() OVER (
            PARTITION BY n_name ORDER BY revenue DESC, c_custkey) AS rn
        FROM rev
    ) ranked
    WHERE rn <= 2
"""


def sql_ansi_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL-STRING surface: ``tables.register_views`` +
    one ANSI query (CTE → join → exact-decimal agg → window rank)
    executed by Catalyst — and the ORACLE is the IDENTICAL string run
    by DuckDB. A user who talks SQL instead of the DataFrame API gets
    the same catalog, the same semantics, and (by the repo's dialect
    discipline) bit-identical results; Catalyst still plans broadcasts
    and partial aggs underneath exactly as the DataFrame twin would.
    """
    from real_time_big_data_architect_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_ANSI_SQL)


QUERIES = {
    "sql_ansi_interface": sql_ansi_interface,
    "scan_project": scan_project,
    "count_rows": count_rows,
    "filter_eq": filter_eq,
    "filter_notnull": filter_notnull,
    "filter_range": filter_range,
    "topk_order_limit": topk_order_limit,
    "lastk_tail": lastk_tail,
    "pareto_frontier": pareto_frontier,
}

ORACLE = {
    "sql_ansi_interface": _ANSI_SQL,  # the IDENTICAL string, by design
    "pareto_frontier": """
        SELECT b.p_partkey, b.p_retailprice, b.p_size
        FROM part b
        WHERE NOT EXISTS (
            SELECT 1 FROM part a
            WHERE a.p_retailprice <= b.p_retailprice
              AND a.p_size >= b.p_size
              AND (a.p_retailprice < b.p_retailprice
                   OR a.p_size > b.p_size)
        )
    """,
    "scan_project": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """,
    "count_rows": "SELECT COUNT(*) AS n_rows FROM events",
    "filter_eq": """
        SELECT event_id, user_id, value
        FROM events
        WHERE event_type = 'purchase'
    """,
    "filter_notnull": """
        SELECT event_id, event_type, value
        FROM events
        WHERE value IS NOT NULL
    """,
    "filter_range": """
        SELECT l_orderkey, l_partkey, l_quantity, l_shipdate
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
    "topk_order_limit": """
        SELECT event_id, ts, event_type, value
        FROM events
        -- DESC NULLS LAST pinned explicitly (r11 review, reworded r12):
        -- DuckDB's default_null_order is a CONFIGURABLE setting (the
        -- 1.0 build in use ships nulls_last, so DESC already matches
        -- Spark's DESC = NULLS LAST today); the pin makes the oracle
        -- independent of that setting - a NULL-ts event must never
        -- outrank every real one as "latest". The real live divergence
        -- is on ASC (Spark NULLS FIRST vs DuckDB NULLS LAST).
        ORDER BY ts DESC NULLS LAST, event_id DESC
        LIMIT 1
    """,
    "lastk_tail": """
        SELECT event_id, ts, value
        FROM events
        -- DESC NULLS LAST pinned explicitly (r11 review, reworded r12):
        -- DuckDB's default_null_order is a CONFIGURABLE setting (the
        -- 1.0 build in use ships nulls_last, so DESC already matches
        -- Spark's DESC = NULLS LAST today); the pin makes the oracle
        -- independent of that setting - a NULL-ts event must never
        -- outrank every real one as "latest". The real live divergence
        -- is on ASC (Spark NULLS FIRST vs DuckDB NULLS LAST).
        ORDER BY ts DESC NULLS LAST, event_id DESC
        LIMIT 30
    """,
}
