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

from real_time_big_data_architect_spark.functions.ranking import (
    quantile_partitioned_rank,
)
from real_time_big_data_architect_spark.tables import (
    estimate_rows,
    jvm_local_df,
    load_table,
)

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

#: iterative-loop shuffle sizing: rows per shuffle partition for the
#: graph loops' label/frontier/rank relations. AQE coalesces tiny
#: post-shuffle partitions, but every unrolled round still pays stage
#: scheduling + exchange round-trips per configured partition, and
#: checkpointed rounds (dedup_clusters) hide stats from Catalyst
#: entirely — so the loops size their shuffles from the INPUT row
#: count up front: min(session conf, ceil(rows / this)). The session
#: conf stays the ceiling, so a 100 TB session with partitions=2000
#: is never shrunk below what its data needs; at fixture scale the
#: 3-round loops stop paying 32-task exchanges for 1.5 k-row label
#: tables (measured 4.1 s → ~1.5 s on pagerank at sf0.1, r7 verdict
#: item 4).
LOOP_ROWS_PER_PARTITION = 200_000


def _loop_shuffle_conf(spark: SparkSession, n_rows: int):
    """Context manager scoping ``spark.sql.shuffle.partitions`` to the
    data-derived loop sizing; restores the session value on exit.

    The conf is SESSION-global: a query running concurrently in the
    same SparkSession while a loop holds this scope would bind the
    loop's (small) partition count. The engine's execution contract is
    one query at a time per session (bench/preflight/driver all run
    serially; ``batch_insights``' intra-query threads never overlap a
    loop operator); a harness that wants concurrent loop queries must
    isolate them with ``spark.newSession()`` per thread, which scopes
    runtime confs. Per-plan REPARTITION hints were considered and
    rejected: they pin exact partition counts and defeat AQE's
    post-shuffle coalescing everywhere else in the plan.
    """
    from contextlib import contextmanager

    conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = max(1, min(conf, -(-n_rows // LOOP_ROWS_PER_PARTITION)))

    @contextmanager
    def _scope():
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", str(conf))

    return _scope()


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # NULLS LAST explicitly (r11 review): Spark ASC defaults NULLS
    # FIRST while the oracles' ORDER BY ts defaults NULLS LAST in
    # DuckDB — a NULL-ts event would shift the whole LEAD sequence and
    # silently change the edge list for every graph query (same latent
    # class as the r10 batch_cep_pattern/ohlc_bars fixes; fixtures
    # carry no NULL ts today, so hashes are unchanged)
    w = Window.partitionBy("event_type").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id")
    )
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
    """Weighted PageRank on the transition graph, PR_ITERS rounds.

    Round shape (r13 optimization, guide §2.4): the damping re-attach
    is FUSED into the contribution aggregation — every node
    contributes an explicit zero-valued row into the per-dst sum, so
    one union + one aggregation replaces the former
    ``nodes ⟕ contrib`` left join. Decimal addition is exact and a +0
    term changes no sum, so ranks are bit-identical; per round the
    node-sized join shuffle disappears outright (at 100 TB that is one
    node-relation shuffle per iteration). The final rank pass consumes
    its input three times (bounds, counts, keyed window), so the
    node-sized final pr is truncated with an eager ``localCheckpoint``
    first — the former lazy persist left the rank plan embedding the
    whole unrolled loop ~3× (797 KB formatted; the bfs_khop plan
    disease). LocalCheckpoint blocks are executor-local and
    non-replicated: an executor loss during the rank pass fails the
    job instead of recomputing — acceptable within one derivation; a
    cluster deployment that needs fault tolerance here should use
    reliable ``checkpoint()`` instead (same truncation, replicated
    storage).
    """
    # footer-stat estimate: no COUNT job per invocation (r8 verdict 6)
    n_events = estimate_rows(sf_dir, "events")
    with _loop_shuffle_conf(spark, n_events):

        edges = _edges(spark, sf_dir).persist()
        outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
        ew = edges.join(outw, "src").persist()
        # a NULL user_id is no node (r11 adversarial finding): edges
        # already exclude it (NULL never equals/differs), and the final
        # rank's user_id tie-break would otherwise place the NULL row
        # differently per engine (Spark ASC NULLS FIRST vs DuckDB LAST)
        nodes = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("user_id").isNotNull())
            .select("user_id")
            .distinct()
            .persist()
        )
        n_tbl = nodes.agg(F.count("*").cast("double").alias("n"))
        pr = nodes.crossJoin(F.broadcast(n_tbl)).select(
            "user_id", (F.lit(1.0) / F.col("n")).alias("pr")
        )
        dec = f"decimal(28,{PR_SCALE})"
        # every node as a zero contribution: keeps the aggregation's key
        # set equal to the node set (edge dsts are a subset of nodes),
        # replacing the per-round nodes left join — see docstring
        zero_rows = nodes.select("user_id", F.lit(0).cast(dec).alias("c"))
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
                    .cast(dec)
                    .alias("c"),
                )
                .unionByName(zero_rows)
                .groupBy("user_id")
                .agg(F.sum("c").alias("s"))
            )
            pr = contrib.crossJoin(F.broadcast(n_tbl)).select(
                "user_id",
                (
                    F.lit(PR_BASE) / F.col("n")
                    + F.lit(DAMPING) * F.col("s").cast("double")
                ).alias("pr"),
            )
        # eager lineage truncation before the three-consumer rank pass
        # (see docstring); materializes the whole loop here, so every
        # intermediate cache can release immediately
        pr = pr.localCheckpoint(eager=True)
        ew.unpersist()
        edges.unpersist()
        nodes.unpersist()
        return (
            quantile_partitioned_rank(
                pr, "pr", "user_id", descending=True, rank_col="rank"
            )
            .select("user_id", F.col("pr").alias("pagerank"), "rank")
        )



#: adaptive triangle-plan switch: below this undirected edge count the
#: wedge+semi plan wins (exchange reuse, fewer stages — stage latency
#: dominates small graphs); above it the edge-iterator avoids
#: materializing the wedge set entirely and wins by ~2× at ×16
#: (measured r13: ×1 = 96 k edges wedge 3.77 s vs edge-iter 4.52 s;
#: ×4 = 382 k a wash, 4.16 vs 4.24; ×16 = 1.53 M edges wedge 10.97 s
#: vs edge-iter 5.58 s — the crossover sits near ×4, the threshold a
#: comfortable step past it). Data-derived like AQE's strategy picks:
#: both plans are exact, the count decides only the physical shape.
TRIANGLE_EDGE_ITER_MIN_EDGES = 1_000_000


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the undirected transition graph — the
    clustering-coefficient / community-density primitive.

    Degree-ordered orientation (Schank & Wagner 2005; the same
    orientation GraphX's TriangleCount uses): each undirected edge is
    oriented from its lower-``(degree, id)`` endpoint to the higher, so
    every vertex's out-degree is O(√m) even at hub nodes — which is
    what makes this survive a power-law graph at 100 TB (a naive a<b<c
    edge triple join explodes at the hubs). Each triangle is counted
    exactly once at its minimum-``(deg, id)`` vertex. The oracle
    replays the naive a<b<c triple join — same count, different
    (non-scalable) plan.

    The PHYSICAL plan is chosen by a footer-stat edge-count bound
    (r13, guide §1/§3): small graphs run the wedge self-join + LEFT SEMI close
    (fewest stages — stage latency dominates); graphs past
    ``TRIANGLE_EDGE_ITER_MIN_EDGES`` run the edge-iterator — per
    oriented edge ``|N⁺(u) ∩ N⁺(v)|`` over sorted adjacency arrays —
    which never materializes the wedge set (wedges grow ~Σdeg² while
    edges grow linearly, so the wedge relation is the first thing to
    blow past memory/shuffle budgets on a growing graph). Both paths
    are exact and oracle-identical; see the constant's docstring for
    the crossover measurements.
    """
    und = (
        _edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .persist()
    )
    # plan choice from the parquet footer stat (the r8 no-COUNT-job
    # discipline): event count upper-bounds the edge count (each event
    # contributes at most one hop; measured ~0.96 edges/event on the
    # fixture), and the proxy's slack only shifts the switch point —
    # both plans are exact. An exact und.count() here cost an extra
    # job (~7% at sf0.1, measured).
    result = count_triangles(
        und, n_edges_hint=estimate_rows(sf_dir, "events")
    )
    und.unpersist()
    return result


def count_triangles(und: DataFrame, n_edges_hint: int | None = None) -> DataFrame:
    """Degree-ordered triangle count over a deduped undirected edge
    set ``(a, b)`` with a < b. Factored out so tests can plant known
    graphs; see triangle_count for the full scale rationale and the
    adaptive wedge/edge-iterator switch. ``n_edges_hint`` (an upper
    bound is fine) picks the physical plan; ``None`` keeps the
    small-graph wedge plan."""
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    ed = und.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    # persisted: both downstream shapes consume this relation more than
    # once (wedge self-join sides / adjacency build + probe sides)
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).persist()
    if (n_edges_hint or 0) >= TRIANGLE_EDGE_ITER_MIN_EDGES:
        # edge-iterator: sorted O(√m)-bounded out-adjacency per node,
        # one |N⁺(u) ∩ N⁺(v)| per oriented edge — shuffle joins only,
        # no broadcast, no wedge materialization
        adj = oriented.groupBy("src").agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs")
        )
        au = adj.select(F.col("src").alias("u"), F.col("nbrs").alias("nu"))
        av = adj.select(F.col("src").alias("v"), F.col("nbrs").alias("nv"))
        per_edge = (
            oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .join(au, "u")
            .join(av, "v")
            .select(F.size(F.array_intersect("nu", "nv")).alias("k"))
        )
        n_tri = per_edge.agg(
            F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("n_triangles")
        )
    else:
        o1 = oriented.select("src", F.col("dst").alias("x"))
        o2 = oriented.select("src", F.col("dst").alias("y"))
        wedges = o1.join(
            o2, (o1.src == o2.src) & (F.col("x") < F.col("y"))
        ).drop(o2.src)
        closed = wedges.join(
            und,
            (F.least("x", "y") == und.a) & (F.greatest("x", "y") == und.b),
            "left_semi",
        )
        n_tri = closed.agg(F.count("*").alias("n_triangles"))
    n_edges = und.agg(F.count("*").alias("n_edges"))
    # materialize the 1-row result via collect, then release the
    # cache and return a JVM-side literal relation: no persisted
    # relation escapes the call (r11 advisor: the returned .persist()
    # was never unpersisted by any caller, so each invocation pinned a
    # storage entry for the life of the session). jvm_local_df keeps
    # the literal JVM-side — no Python-RDD leaf on re-consumption.
    row = n_edges.crossJoin(n_tri).collect()[0]
    oriented.unpersist()
    return jvm_local_df(
        und.sparkSession,
        [(row["n_edges"], row["n_triangles"])],
        "n_edges bigint, n_triangles bigint",
    )


#: BFS seed rule and hop bound: every 97th user seeds the frontier,
#: distances are truncated at 4 hops (the recursive-CTE oracle carries
#: the same bound, so both engines explore the identical ball).
BFS_SEED_MOD = 97
BFS_MAX_HOPS = 4


def bfs_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS: min hop-distance (≤ BFS_MAX_HOPS) from the
    seed set over the transition graph — the reachability / blast-radius
    primitive (influence cones, contamination spread).

    Frontier-relaxation BFS as a bounded DataFrame loop: each round
    joins the current frontier against the edge list (shuffle keyed on
    src == user_id, the same partitioning every round). min(dist) over
    the union of all frontiers IS the BFS distance (a node's first
    appearance is its shortest level), so no per-round visited-set
    anti-join is needed — frontiers may revisit nodes, bounded by |V|
    per round; the anti-join is kept because in a dense graph the
    frontier collapses after 1-2 rounds, so later rounds join
    near-empty inputs. Each frontier is an **eager localCheckpoint**
    (r12 optimization, guide §3.3/§5): the former lazy-persist loop
    compounded every prior frontier's plan into the next round's
    anti-join — the analyzed tree roughly doubled per hop (measured
    2.8 MB formatted plan, 4.7 k Exchange nodes at 4 hops) and
    Catalyst re-optimized that whole tree on every action. Truncating
    lineage at each round bounds the plan at O(1) per hop (the same
    fix dedup_clusters' CC loop uses; the LocalCheckpointRDD leaf is
    pure-JVM, planaudit-allowlisted). Measured at sf0.1: 2.56 s →
    1.06 s with results bit-identical. At 100 TB the right physical
    layout is both sides bucketed by user_id (the Pregel partitioning,
    same note as pagerank above).

    Fault-tolerance tradeoff (r12 verdict item 2): localCheckpoint
    blocks are executor-local and non-replicated — losing an executor
    after a frontier is checkpointed fails the job instead of
    recomputing the lost frontier, and the eager materialization means
    building this DataFrame runs the whole BFS loop up front. Within
    one derivation that trade is deliberate (the recompute path the
    old persist() offered was itself the compounding-plan problem); a
    cluster run that must survive executor loss mid-query should use
    reliable ``checkpoint()`` to replicated storage — same lineage
    truncation, durable blocks, one extra write/read of each frontier.
    """
    # footer-stat estimate: no COUNT job per invocation (r8 verdict 6)
    n_events = estimate_rows(sf_dir, "events")
    with _loop_shuffle_conf(spark, n_events):

        edges = _edges(spark, sf_dir).select("src", "dst").persist()
        ev = load_table(spark, sf_dir, "events")
        seeds = (
            ev.filter(F.col("user_id") % BFS_SEED_MOD == 0)
            .select("user_id")
            .distinct()
            .localCheckpoint(eager=True)
        )
        from functools import reduce

        frontiers = [seeds]
        frontier = seeds
        for hop in range(1, BFS_MAX_HOPS + 1):
            reached = (
                frontier.join(edges, frontier["user_id"] == edges["src"])
                .select(F.col("dst").alias("user_id"))
                .distinct()
            )
            # anti-join against the (lazy) union of checkpointed prior
            # frontiers: in a dense graph the frontier collapses after
            # round 1-2, so later rounds join near-empty inputs — the
            # shrinkage pays for the anti-join many times over. The
            # eager localCheckpoint both materializes the round (the
            # join/distinct/anti-join shuffles run inside the
            # _loop_shuffle_conf scope) and truncates the plan to an
            # RDD leaf, so round k's analysis cost no longer embeds
            # rounds 0..k-1 (see docstring; measured 2.4× end-to-end).
            visited = reduce(DataFrame.unionByName, frontiers)
            frontier = reached.join(visited, "user_id", "left_anti").localCheckpoint(
                eager=True
            )
            frontiers.append(frontier)
        # The returned union is narrow (no shuffle) over the k+1
        # checkpointed frontiers, so no persist+count barrier is needed:
        # re-consumption replays only the union over checkpoint blocks,
        # never the loop. Checkpoint blocks release when the returned
        # DataFrame is garbage-collected (ContextCleaner), the same
        # lifetime the former persisted result had. edges can release
        # now — every frontier is already materialized.
        edges.unpersist()
        return reduce(
            DataFrame.unionByName,
            (f.withColumn("dist", F.lit(i)) for i, f in enumerate(frontiers)),
        ).select("user_id", F.col("dist").cast("int").alias("dist"))



def sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source weighted shortest path (≤ BFS_MAX_HOPS relaxation
    rounds) over the transition graph — the cost-aware twin of
    bfs_khop. Edge cost is 1/w (popular transitions are "cheaper", the
    latency-like convention of recommendation path scoring).

    Bounded Bellman-Ford as a lazy unrolled loop: each round joins the
    current distance table against the edge list (shuffle keyed on
    src == user_id — the Pregel partitioning; at 100 TB bucket both
    sides by user_id and rounds are shuffle-free except the per-dst
    min) and folds with min. Determinism: each path's cost is the same
    left-to-right double additions in both engines and every round's
    min runs over identical value multisets, so the oracle — the SAME
    recurrence unrolled as k SQL CTEs, not a generic all-paths search —
    hash-matches bit-exactly. At fixture scale the distance table is
    carried whole per round; the frontier-delta optimization bfs_khop
    documents applies identically when rounds grow.
    """
    # footer-stat estimate: no COUNT job per invocation (r8 verdict 6)
    n_events = estimate_rows(sf_dir, "events")
    with _loop_shuffle_conf(spark, n_events):

        edges = _edges(spark, sf_dir).select(
            "src", "dst", (F.lit(1.0) / F.col("w").cast("double")).alias("cost")
        ).persist()
        ev = load_table(spark, sf_dir, "events")
        dist = (
            ev.filter(F.col("user_id") % BFS_SEED_MOD == 0)
            .select("user_id")
            .distinct()
            .select("user_id", F.lit(0.0).alias("dist"))
        )
        for _ in range(BFS_MAX_HOPS):
            relaxed = dist.join(edges, dist["user_id"] == edges["src"]).select(
                F.col("dst").alias("user_id"),
                (F.col("dist") + F.col("cost")).alias("dist"),
            )
            dist = (
                dist.unionByName(relaxed)
                .groupBy("user_id")
                .agg(F.min("dist").alias("dist"))
            )
        # one lazy job; materialize once so the edge persist can release
        # immediately (the bfs_khop cache-hygiene convention)
        out = dist.persist()
        out.count()
        edges.unpersist()
        return out



LPA_ROUNDS = 3


def label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via synchronous weighted label propagation
    (LPA_ROUNDS rounds) on the undirected transition graph — the
    community primitive the graph family was missing (bot-ring /
    audience-cluster discovery).

    Every node starts as its own label; each round every node adopts
    the label with the greatest incident edge weight among its
    neighbors (ties broken by the SMALLEST label — the determinism
    rule), isolated nodes keep their own. Weights are integer counts,
    the argmax is a (weight DESC, label ASC) row_number per node, and
    rounds unroll lazily — so the whole loop is exact arithmetic and
    the oracle replays the identical recurrence round by round.

    Scale shape: per round one join keyed on user_id + one (node,
    label) partial-agg shuffle + one per-node window — all keyed on
    user_id (Pregel bucketing note as above). Synchronous LPA on a
    bipartite-ish structure can oscillate; a fixed round count is the
    standard bound (GraphFrames does the same).
    """
    # footer-stat estimate: no COUNT job per invocation (r8 verdict 6)
    n_events = estimate_rows(sf_dir, "events")
    with _loop_shuffle_conf(spark, n_events):

        e = _edges(spark, sf_dir)
        und = (
            e.select("src", "dst", "w")
            .unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .persist()
        )
        # NULL user_id excluded explicitly (it already vanished on both
        # engines via the inner label joins — this states the intent
        # and keeps the node set identical to pagerank's)
        nodes = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("user_id").isNotNull())
            .select("user_id")
            .distinct()
            .persist()
        )
        labels = nodes.select("user_id", F.col("user_id").alias("label"))
        for _ in range(LPA_ROUNDS):
            contrib = (
                labels.join(und, labels["user_id"] == und["src"])
                .groupBy(F.col("dst").alias("node"), "label")
                .agg(F.sum("w").alias("lw"))
            )
            win = Window.partitionBy("node").orderBy(
                F.col("lw").desc(), F.col("label").asc()
            )
            best = (
                contrib.withColumn("rn", F.row_number().over(win))
                .filter(F.col("rn") == 1)
                .select(F.col("node").alias("user_id"), F.col("label").alias("new_label"))
            )
            labels = (
                nodes.join(labels, "user_id")
                .join(best, "user_id", "left")
                .select(
                    "user_id",
                    F.coalesce("new_label", "label").alias("label"),
                )
            )
        out = labels.persist()
        out.count()
        und.unpersist()
        nodes.unpersist()
        return out



def _lpa_oracle() -> str:
    """Unrolled LPA twin: round r's CTE applies the same
    (weight DESC, label ASC) argmax over the same undirected weighted
    edges — exact integer arithmetic end to end."""
    rounds = []
    prev = "l0"
    for r in range(1, LPA_ROUNDS + 1):
        cur = f"l{r}"
        rounds.append(f"""
        c{r} AS (
            SELECT u.dst AS node, p.label, SUM(u.w) AS lw
            FROM {prev} p JOIN und u ON u.src = p.user_id
            GROUP BY u.dst, p.label
        ),
        b{r} AS (
            SELECT node AS user_id, label AS new_label FROM (
                SELECT node, label, ROW_NUMBER() OVER (
                    PARTITION BY node ORDER BY lw DESC, label ASC) AS rn
                FROM c{r}
            ) WHERE rn = 1
        ),
        {cur} AS (
            SELECT n.user_id, COALESCE(b.new_label, p.label) AS label
            FROM nodes n
            JOIN {prev} p ON p.user_id = n.user_id
            LEFT JOIN b{r} b ON b.user_id = n.user_id
        )""")
        prev = cur
    chain = ",".join(rounds)
    return f"""
        WITH {_EDGE_CTE.strip()},
        und AS (
            SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
                SELECT src, dst, w FROM edges
                UNION ALL
                SELECT dst AS src, src AS dst, w FROM edges
            ) GROUP BY src, dst
        ),
        nodes AS (SELECT DISTINCT user_id FROM events
                  WHERE user_id IS NOT NULL),
        l0 AS (SELECT user_id, user_id AS label FROM nodes),{chain}
        SELECT user_id, label FROM {prev}
    """


#: ONE dialect-shared recursive recurrence (Spark 4 supports WITH
#: RECURSIVE): the walk CTE is token-identical in the Catalyst
#: execution form and the DuckDB oracle — the sql_ansi_interface
#: discipline applied to iterative graph SQL. (Since r13 the Spark
#: side materializes the edges CTE up front — Catalyst's UnionLoop
#: would otherwise re-derive it per hop; the oracle keeps the inline
#: single-string form.) Contract matches bfs_khop exactly (same seeds,
#: same hop bound, same min-dist semantics), so the engine proves
#: THREE independent implementations agree: the DataFrame frontier
#: loop, the Catalyst recursive CTE, and DuckDB's recursive CTE.
_REACH_RECURSIVE_SQL: str  # assigned below BFS constants


def recursive_cte_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source bounded reachability as ONE recursive SQL query —
    Spark 4's ``WITH RECURSIVE`` executing the same iterative workload
    ``bfs_khop`` runs as a DataFrame frontier loop.

    The recursion is depth-bounded (``dist < BFS_MAX_HOPS``) with
    UNION ALL expansion and an outer MIN(dist) — a node's first level
    is its BFS distance, so results are identical to the frontier
    loop's (three-way equality pinned by test).

    r13 (guide §1/§2.4): the recursive member joins a MATERIALIZED
    edge view. Catalyst's ``UnionLoop`` re-executes the recursive
    member per iteration, and with ``edges`` as a plain CTE that meant
    re-running the whole window+aggregate edge derivation over events
    every hop (profiled: the edge build dominated the query, ~4×
    repeated). The edge list is now derived once, truncated with an
    eager localCheckpoint (executor-local blocks — the bfs_khop
    fault-tolerance note applies), and the recursion joins the
    checkpointed view: measured 3.56 s → 2.19 s at sf0.1, identical
    rows. The oracle keeps the original single-string form
    (``_REACH_RECURSIVE_SQL``) — DuckDB evaluates the edges CTE once
    anyway, and the recurrence itself is token-identical in both
    engines.
    """
    # register just the one view the SQL reads (the full-catalog
    # register_views would fail on partial dirs like the scale probes')
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    edges.createOrReplaceTempView("__reach_edges")
    return spark.sql(_REACH_RECURSIVE_SQL_OVER_VIEW)


def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the transition graph — the first plot of
    any graph analysis (is this power-law? where do the hubs start?):
    per direction, how many nodes have each (distinct-neighbor) degree.

    Two dimension-keyed aggregations per direction (node → degree,
    degree → node count); output cardinality is the number of DISTINCT
    degrees — tiny at any scale. The hub tail this surfaces is exactly
    what decides the triangle_count orientation and the skew-join
    strategy upstream.
    """
    edges = _edges(spark, sf_dir)

    def dist(key: str, direction: str) -> DataFrame:
        return (
            edges.groupBy(F.col(key).alias("node"))
            .agg(F.count("*").alias("degree"))
            .groupBy("degree")
            .agg(F.count("*").alias("n_nodes"))
            .select(F.lit(direction).alias("direction"), "degree", "n_nodes")
        )

    return dist("src", "out").unionByName(dist("dst", "in"))


QUERIES = {
    "recursive_cte_reachability": recursive_cte_reachability,
    "degree_distribution": degree_distribution,
    "transition_edges": transition_edges,
    "pagerank": pagerank,
    "triangle_count": triangle_count,
    "bfs_khop": bfs_khop,
    "sssp_weighted": sssp_weighted,
    "label_propagation": label_propagation,
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

# see recursive_cte_reachability — one string, two engines. Kept to the
# dialect intersection: LEAD window, UNION ALL recursion (Spark rejects
# UNION-distinct recursion), depth bound, outer MIN. The recursive
# member is SELECT DISTINCT — per-LEVEL dedup, which is what makes the
# recursion frontier-shaped: without it UNION ALL enumerates PATHS, and
# a dense graph blows past Spark's 1M recursion-row limit at sf0.01
# (measured); with it every level is ≤ |V| rows, total ≤ (K+1)·|V|,
# path-count-independent. (Verified to parse and return identical rows
# on Spark 4 and DuckDB 1.0.)
_REACH_RECURSIVE_SQL = f"""
    WITH RECURSIVE {_EDGE_CTE.strip()},
    walk(user_id, dist) AS (
        SELECT DISTINCT user_id, 0 FROM events
        WHERE user_id % {BFS_SEED_MOD} = 0
        UNION ALL
        SELECT DISTINCT e.dst, w2.dist + 1
        FROM walk w2 JOIN edges e ON e.src = w2.user_id
        WHERE w2.dist < {BFS_MAX_HOPS}
    )
    SELECT user_id, CAST(MIN(dist) AS INT) AS dist
    FROM walk GROUP BY user_id
"""

#: the Spark-side execution form: the same recurrence, but joining the
#: pre-materialized `__reach_edges` temp view instead of an inline
#: edges CTE that UnionLoop would re-derive from events every hop (see
#: recursive_cte_reachability docstring). The seed member and the
#: walk recurrence are token-identical to _REACH_RECURSIVE_SQL.
_REACH_RECURSIVE_SQL_OVER_VIEW = f"""
    WITH RECURSIVE
    walk(user_id, dist) AS (
        SELECT DISTINCT user_id, 0 FROM events
        WHERE user_id % {BFS_SEED_MOD} = 0
        UNION ALL
        SELECT DISTINCT e.dst, w2.dist + 1
        FROM walk w2 JOIN __reach_edges e ON e.src = w2.user_id
        WHERE w2.dist < {BFS_MAX_HOPS}
    )
    SELECT user_id, CAST(MIN(dist) AS INT) AS dist
    FROM walk GROUP BY user_id
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
        """nodes AS (SELECT DISTINCT user_id FROM events
            WHERE user_id IS NOT NULL)""",
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


def _sssp_oracle() -> str:
    """Unrolled Bellman-Ford twin of sssp_weighted: round r's CTE is
    literally min(d_{r-1} ∪ relax(d_{r-1})) — the engine's recurrence,
    not a generic all-paths search, so every double addition and min
    runs over identical values and the hash is bit-exact."""
    rounds = []
    prev = "d0"
    for r in range(1, BFS_MAX_HOPS + 1):
        cur = f"d{r}"
        rounds.append(f"""
        {cur} AS (
            SELECT user_id, MIN(dist) AS dist FROM (
                SELECT user_id, dist FROM {prev}
                UNION ALL
                SELECT e.dst AS user_id, d.dist + e.cost AS dist
                FROM {prev} d JOIN ecost e ON e.src = d.user_id
            ) GROUP BY user_id
        )""")
        prev = cur
    chain = ",".join(rounds)
    return f"""
        WITH {_EDGE_CTE.strip()},
        ecost AS (
            SELECT src, dst, 1.0 / CAST(w AS DOUBLE) AS cost FROM edges
        ),
        d0 AS (
            SELECT DISTINCT user_id, 0.0 AS dist FROM events
            WHERE user_id % {BFS_SEED_MOD} = 0
        ),{chain}
        SELECT user_id, dist FROM {prev}
    """


ORACLE = {
    "recursive_cte_reachability": _REACH_RECURSIVE_SQL,  # identical string
    "degree_distribution": f"""
        WITH {_EDGE_CTE.strip()}
        , outd AS (
            SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM edges GROUP BY src
        ),
        ind AS (
            SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM edges GROUP BY dst
        )
        SELECT 'out' AS direction, degree,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM outd GROUP BY degree
        UNION ALL
        SELECT 'in' AS direction, degree,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM ind GROUP BY degree
    """,
    "sssp_weighted": _sssp_oracle(),
    "label_propagation": _lpa_oracle(),
    "transition_edges": f"""
        WITH {_EDGE_CTE.strip()}
        SELECT src, dst, w FROM edges
    """,
    "pagerank": _pagerank_oracle(),
    # the SAME recursive string as recursive_cte_reachability: one
    # hand-maintained recurrence for the whole BFS family (frontier
    # loop, Catalyst recursion, DuckDB replay all pinned identical)
    "bfs_khop": _REACH_RECURSIVE_SQL,
    "triangle_count": f"""
        WITH {_EDGE_CTE.strip()},
        und AS (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM edges
        ),
        tri AS (
            SELECT e1.a, e1.b, e2.b AS c
            FROM und e1
            JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles
    """,
}
