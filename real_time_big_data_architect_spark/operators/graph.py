"""Graph analytics over the event stream (north star; absent from the
reference, which never relates rows to each other — SURVEY §2.5).

The graph is the click-stream *transition graph*: an edge u→v for each
pair of consecutive events (ordered by ts, event_id within an
event_type) issued by different users, weighted by transition count —
the structure behind "users who acted after you" recommendations and
bot-ring detection.

- **edge extraction** is one window pass (lag/lead shuffle keyed by
  event_type) + one (src,dst) count — both shapes scale linearly and
  reuse the sessionize/funnel partitioning.
- **PageRank** runs fixed-count weighted power iteration as a lazy
  unrolled DataFrame loop (the kmeans_clusters pattern): per round, one
  join of the edge list against the K-row... the N-row rank vector —
  both shuffle on user_id and AQE coalesces the tiny vector side — and
  one per-dst aggregation. Cross-engine exact: per-edge contributions
  round HALF_UP at scale 12 into DECIMAL(28,12), sums are
  order-independent decimals, and the damping expression mirrors
  token-for-token in the oracle. Dangling-node mass is dropped (not
  redistributed) — the simpler textbook variant; the oracle replays the
  same choice, so totals agree bit-for-bit.

At 100 TB the rank vector and edge list are both big: the join keys on
user_id, so pre-bucketing both by user_id makes every iteration
shuffle-free except the per-dst re-aggregation — the classic Pregel
partitioning, expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.tables import load_table

DAMPING = 0.85
#: (1 - d) precomputed in Python doubles: Spark constant-folds
#: lit(1.0) - lit(0.85) in IEEE double (…0002), while DuckDB folds the
#: literal difference in exact DECIMAL (0.15) — 1 ulp apart. Emitting
#: the already-folded double on both sides removes the divergence.
PR_BASE = 1.0 - DAMPING
PR_ITERS = 3
#: contribution rounding scale: far below rank gaps, high enough that
#: HALF_UP (Spark) and half-away-from-zero (DuckDB) agree on positives
PR_SCALE = 12


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    hops = ev.select(
        "user_id", F.lead("user_id").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull() & (F.col("nxt") != F.col("user_id")))
    return hops.groupBy(
        F.col("user_id").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count("*").alias("w"))


def transition_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weighted user-transition edge list itself."""
    return _edges(spark, sf_dir)


def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank on the transition graph, PR_ITERS rounds."""
    edges = _edges(spark, sf_dir).persist()
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    ew = edges.join(outw, "src").persist()
    nodes = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .persist()
    )
    n_tbl = nodes.agg(F.count("*").cast("double").alias("n"))
    pr = nodes.crossJoin(F.broadcast(n_tbl)).select(
        "user_id", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(PR_ITERS):
        contrib = (
            ew.join(pr.withColumnRenamed("user_id", "src"), "src")
            .select(
                F.col("dst").alias("user_id"),
                F.round(
                    F.col("pr")
                    * (F.col("w").cast("double") / F.col("outw").cast("double")),
                    PR_SCALE,
                )
                .cast(f"decimal(28,{PR_SCALE})")
                .alias("c"),
            )
            .groupBy("user_id")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            nodes.crossJoin(F.broadcast(n_tbl))
            .join(contrib, "user_id", "left")
            .select(
                "user_id",
                (
                    F.lit(PR_BASE) / F.col("n")
                    + F.lit(DAMPING)
                    * F.coalesce(
                        F.col("s"),
                        F.lit(0).cast(f"decimal(28,{PR_SCALE})"),
                    ).cast("double")
                ).alias("pr"),
            )
        )
    w = Window.orderBy(F.col("pr").desc(), F.col("user_id").asc())
    return pr.select(
        "user_id",
        F.col("pr").alias("pagerank"),
        F.row_number().over(w).alias("rank"),
    )


QUERIES = {
    "transition_edges": transition_edges,
    "pagerank": pagerank,
}

_EDGE_CTE = """
    ordered AS (
        SELECT user_id,
               LEAD(user_id) OVER (PARTITION BY event_type
                                   ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    edges AS (
        SELECT user_id AS src, nxt AS dst, CAST(COUNT(*) AS BIGINT) AS w
        FROM ordered
        WHERE nxt IS NOT NULL AND nxt <> user_id
        GROUP BY user_id, nxt
    )
"""


def _pagerank_oracle() -> str:
    parts = [
        """ordered AS (
            SELECT user_id,
                   LEAD(user_id) OVER (PARTITION BY event_type
                                       ORDER BY ts, event_id) AS nxt
            FROM events
        )""",
        """edges AS (
            SELECT user_id AS src, nxt AS dst, CAST(COUNT(*) AS BIGINT) AS w
            FROM ordered
            WHERE nxt IS NOT NULL AND nxt <> user_id
            GROUP BY user_id, nxt
        )""",
        """outw AS (
            SELECT src, CAST(SUM(w) AS BIGINT) AS outw FROM edges GROUP BY src
        )""",
        """nodes AS (SELECT DISTINCT user_id FROM events)""",
        """n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)""",
        """pr0 AS (
            SELECT user_id, 1.0 / n.n AS pr FROM nodes, n
        )""",
    ]
    for i in range(1, PR_ITERS + 1):
        parts.append(
            f"""contrib{i} AS (
            SELECT e.dst AS user_id,
                   SUM(CAST(round(p.pr * (CAST(e.w AS DOUBLE)
                                          / CAST(o.outw AS DOUBLE)),
                                  {PR_SCALE})
                            AS DECIMAL(28,{PR_SCALE}))) AS s
            FROM edges e
            JOIN pr{i - 1} p ON p.user_id = e.src
            JOIN outw o ON o.src = e.src
            GROUP BY e.dst
        )"""
        )
        parts.append(
            f"""pr{i} AS (
            SELECT nodes.user_id,
                   CAST({PR_BASE!r} AS DOUBLE) / n.n
                     + {DAMPING} * CAST(COALESCE(c.s,
                           CAST(0 AS DECIMAL(28,{PR_SCALE}))) AS DOUBLE) AS pr
            FROM nodes CROSS JOIN n
            LEFT JOIN contrib{i} c ON c.user_id = nodes.user_id
        )"""
        )
    ctes = ",\n        ".join(parts)
    return f"""
        WITH {ctes}
        SELECT user_id, pr AS pagerank,
               CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, user_id) AS INT)
                   AS rank
        FROM pr{PR_ITERS}
    """


ORACLE = {
    "transition_edges": f"""
        WITH {_EDGE_CTE.strip()}
        SELECT src, dst, w FROM edges
    """,
    "pagerank": _pagerank_oracle(),
}
