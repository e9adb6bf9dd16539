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


#: decorrelation alphabet shared by every probe (16 rotations for up to
#: 16 copies) — single source of truth so the probes stay comparable
_ALPHA = "aeiousnrtlcdmhgp"


def _rotated_doc_copies(doc_base: DataFrame, mult: int) -> DataFrame:
    """documents ×mult with per-copy character rotation: copies are NOT
    verbatim duplicates, so digest/near-dup group sizes stay constant
    and the measured workload scales like real data, not like a planted
    duplication (the main-probe discipline)."""
    copies = []
    for c in range(mult):
        rot = _ALPHA[c:] + _ALPHA[:c]
        copies.append(
            doc_base.withColumn(
                "doc_id", F.col("doc_id") + F.lit(c * 10_000_000)
            ).withColumn(
                "text", F.expr(f"translate(text, '{_ALPHA}', '{rot}')")
            )
        )
    return functools.reduce(DataFrame.unionByName, copies)


def _flipped_emb_copies(emb_base: DataFrame, mult: int) -> DataFrame:
    """embeddings ×mult with per-copy random sign flips — an isometry:
    intra-copy cosines are bit-identical, cross-copy cosines collapse
    to noise."""
    copies = []
    for c in range(mult):
        flip = (
            "transform(embedding, (v, i) -> CAST(v * (CASE WHEN "
            f"pmod(hash(i + {c} * 64), 2) = 0 THEN 1.0 ELSE -1.0 "
            "END) AS FLOAT))"
        )
        copies.append(
            emb_base.withColumn(
                "vec_id", F.col("vec_id") + F.lit(c * 10_000_000)
            ).withColumn("embedding", F.expr(flip))
        )
    return functools.reduce(DataFrame.unionByName, copies)


def _offset_event_copies(ev_base: DataFrame, mult: int) -> DataFrame:
    """events ×mult with user AND 20-year ts offsets per copy: disjoint
    users in disjoint time ranges, so window/lead chains stay within a
    copy and the graph is mult near-disjoint replicas."""
    copies = [
        ev_base.withColumn(
            "event_id", F.col("event_id") + F.lit(c * 10_000_000)
        ).withColumn(
            "user_id", F.col("user_id") + F.lit(c * 10_000_000)
        ).withColumn(
            "ts", F.col("ts") + F.expr(f"INTERVAL {c * 7300} DAYS")
        )
        for c in range(mult)
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


def hot_bucket_probe() -> None:
    """r5 verdict item 5: scale-prove the LSH hot-bucket chain path.

    Plants a fully degenerate corpus — 10 000 × mult verbatim copies of
    ONE boilerplate page, so all copies land in the SAME bucket of all
    8 bands — and times the full dedup_minhash_lsh pipeline. The chain
    guard bounds candidates at n·LSH_CHAIN_NEIGHBORS per band (distinct
    across bands), so wall-clock must grow ~linearly with n; the
    unguarded self-join would be n²/2 pairs (1.28 × 10¹⁰ at ×16 — hours,
    not seconds). Run: ``python tools/scalecheck.py hot``.
    """
    import shutil
    import tempfile

    from real_time_big_data_architect_spark.operators import dedup as dedup_ops

    spark = get_spark("scalecheck-hot")
    results = []
    root = tempfile.mkdtemp(prefix="scalehot_")
    boiler = " ".join(f"boilerplate{w % 23} filler{w % 7}" for w in range(60))
    try:
        for mult in MULTS:
            n_hot = 10_000 * mult
            d = f"{root}/x{mult}"
            spark.range(n_hot).selectExpr(
                "id AS doc_id",
                f"'{boiler}' AS text",
                "'en' AS lang",
                "'web' AS source",
                f"CAST({len(boiler)} AS BIGINT) AS n_chars",
            ).repartition(32).write.mode("overwrite").parquet(
                f"{d}/documents.parquet"
            )
            spark.catalog.clearCache()
            dedup_ops.dedup_minhash_lsh(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()  # warm
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out = dedup_ops.dedup_minhash_lsh(spark, d)
            out.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            n_pairs = out.count()
            bound = n_hot * dedup_ops.LSH_CHAIN_NEIGHBORS
            print(
                f"lsh_hot_bucket x{mult:<3d} n={n_hot:<7d} {dt:6.2f}s "
                f"pairs={n_pairs} (bound n*k={bound}, naive n^2/2="
                f"{n_hot * (n_hot - 1) // 2})",
                flush=True,
            )
            assert n_pairs <= bound, "chain guard violated"
            results.append({"op": "lsh_hot_bucket", "mult": mult,
                            "n_hot": n_hot, "sec": round(dt, 2),
                            "pairs": n_pairs, "bound": bound})
    finally:
        shutil.rmtree(root, ignore_errors=True)
    import json

    print(json.dumps(results))
    spark.stop()


def x64_probe() -> None:
    """r5 verdict item 8: extend the ×64 spot-checks to the three
    headline queries with the largest shuffle-to-input ratios after the
    graph family — record_linkage (block-keyed self-join + best-match
    window), interval_merge (two frames on one user_id sort), and
    window_count_distinct (two keyed window sorts). Times each
    end-to-end at ×16 and ×64 scaled fixture dirs; throughput must not
    fall from ×16 to ×64. Run: ``python tools/scalecheck.py x64``.
    """
    import shutil
    import tempfile

    from real_time_big_data_architect_spark.plans import workload

    spark = get_spark("scalecheck-x64")
    qs = workload.build_queries()
    ev_base = load_table(spark, SF_DIR, "events")
    cust_base = load_table(spark, SF_DIR, "customer")
    n_ev, n_cust = ev_base.count(), cust_base.count()
    results = []
    root = tempfile.mkdtemp(prefix="scale64_")
    try:
        for mult in (16, 64):
            d = f"{root}/x{mult}"
            # events: user+ts offsets per copy (disjoint users/ranges,
            # the main-probe discipline)
            _offset_event_copies(ev_base, mult).write.mode(
                "overwrite"
            ).parquet(f"{d}/events.parquet")
            # customer: custkey offsets. Under the old mod-1000 blocking
            # every copy stacked onto the same 1000 blocks, so block
            # population grew with mult and this probe measured the
            # block join going quadratic (13.7 s → 142.7 s for 4× data)
            # — the finding that forced the DIV-span blocking now in
            # record_linkage (block population bounded at
            # LINK_BLOCK_SPAN for ANY corpus size)
            _scaled(cust_base, "c_custkey", mult, 10_000_000).write.mode(
                "overwrite"
            ).parquet(f"{d}/customer.parquet")
            for name, fn, n_rows in (
                ("record_linkage", qs["record_linkage"], n_cust * mult),
                ("interval_merge", qs["interval_merge"], n_ev * mult),
                ("window_count_distinct", qs["window_count_distinct"],
                 n_ev * mult),
            ):
                # none of these materialize at build time, so the shared
                # _timed (warm write + timed write on one frame) applies;
                # clearCache isolates runs exactly like the main probe
                spark.catalog.clearCache()
                results.append(_timed(name, mult, n_rows, fn(spark, d)))
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    import json

    print(json.dumps(results))
    spark.stop()


def x64graph_probe() -> None:
    """r9 follow-on: extend the ×64 spot-checks to the GRAPH family —
    the remaining heavy-shuffle queries without a ×64 row (pagerank's
    3 power rounds, triangle_count's oriented wedge join, bfs_khop's
    4-round frontier relaxation). Copies are disjoint subgraphs
    (user+ts offsets), so the workload is mult× replicas and per-row
    cost must stay flat-or-falling from ×16 to ×64. These operators
    materialize stages during construction (persist/localCheckpoint),
    so each is timed END-TO-END with the cache cleared, exactly like
    the main probe's e2e section. Run:
    ``python tools/scalecheck.py x64graph [op ...] [mult ...]``
    (default: all five graph operators at ×16/×64; name a subset to
    extend the table without re-measuring the rest; bare integers in
    the argument list override the multiplier steps — e.g.
    ``x64graph pagerank bfs_khop 64 256`` reproduces the ×256
    spot-check).
    """
    import json
    import shutil
    import tempfile

    from real_time_big_data_architect_spark.operators import graph as graph_ops

    args = sys.argv[2:]
    mults = tuple(int(a) for a in args if a.isdigit()) or (16, 64)
    only = {a for a in args if not a.isdigit()}
    known = {"pagerank", "triangle_count", "bfs_khop", "sssp_weighted",
             "label_propagation"}
    unknown = only - known
    if unknown:
        print(f"unknown operator(s) {sorted(unknown)}; "
              f"valid: {sorted(known)}", file=sys.stderr)
        sys.exit(2)
    spark = get_spark("scalecheck-x64graph")
    ev_base = load_table(spark, SF_DIR, "events")
    n_ev = ev_base.count()
    results = []
    root = tempfile.mkdtemp(prefix="scale64g_")
    try:
        for mult in mults:
            d = f"{root}/x{mult}"
            _offset_event_copies(ev_base, mult).write.mode(
                "overwrite"
            ).parquet(f"{d}/events.parquet")

            def _timed_e2e(label: str, mk) -> dict:
                n_rows = n_ev * mult
                spark.catalog.clearCache()
                mk().write.format("noop").mode("overwrite").save()  # warm
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                mk().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                rate = n_rows / dt / 1e6
                print(
                    f"{label:16s} x{mult:<3d} {n_rows/1e6:8.2f} Mrows "
                    f"{dt:7.2f}s  {rate:7.2f} Mrows/s",
                    flush=True,
                )
                return {"op": label, "mult": mult, "rows": n_rows,
                        "sec": round(dt, 2), "mrows_per_s": round(rate, 2)}

            ops = (
                ("pagerank", graph_ops.pagerank),
                ("triangle_count", graph_ops.triangle_count),
                ("bfs_khop", graph_ops.bfs_khop),
                ("sssp_weighted", graph_ops.sssp_weighted),
                ("label_propagation", graph_ops.label_propagation),
            )
            for op_name, op_fn in ops:
                if only and op_name not in only:
                    continue
                results.append(_timed_e2e(
                    op_name, lambda f=op_fn: f(spark, d)))
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))
    spark.stop()


def r6_probe() -> None:
    """Scale rows for the round-6 additions that carry real shuffles:
    pq_topk (codebook train + map-side ADC + per-query top-k window),
    recursive_cte_reachability (Catalyst WITH RECURSIVE — per-level
    joins must stay frontier-sized), curation_funnel (digest window).
    Embeddings get the sign-flip decorrelation, events the user/ts
    offsets — the main-probe discipline. Run:
    ``python tools/scalecheck.py r6``.
    """
    import shutil
    import tempfile

    from real_time_big_data_architect_spark.plans import workload

    spark = get_spark("scalecheck-r6")
    qs = workload.build_queries()
    ev_base = load_table(spark, SF_DIR, "events")
    emb_base = load_table(spark, SF_DIR, "embeddings")
    doc_base = load_table(spark, SF_DIR, "documents")
    n_ev, n_emb, n_doc = ev_base.count(), emb_base.count(), doc_base.count()
    results = []
    root = tempfile.mkdtemp(prefix="scale_r6_")
    try:
        for mult in MULTS:
            d = f"{root}/x{mult}"
            _flipped_emb_copies(emb_base, mult).write.mode(
                "overwrite"
            ).parquet(f"{d}/embeddings.parquet")
            _offset_event_copies(ev_base, mult).write.mode(
                "overwrite"
            ).parquet(f"{d}/events.parquet")
            # ROTATED copies, not verbatim (r6 review finding): verbatim
            # texts would grow curation_funnel's md5(text) digest groups
            # with the multiplier and measure planted-duplication
            # inflation instead of scaling
            _rotated_doc_copies(doc_base, mult).write.mode(
                "overwrite"
            ).parquet(f"{d}/documents.parquet")
            for name, n_rows in (
                ("pq_topk", n_emb * mult),
                ("recursive_cte_reachability", n_ev * mult),
                ("curation_funnel", n_doc * mult),
            ):
                spark.catalog.clearCache()
                results.append(_timed(name, mult, n_rows, qs[name](spark, d)))
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    import json

    print(json.dumps(results))
    spark.stop()


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
        # DISTINCT-window rewrite (r5): two keyed window sorts — cost
        # must track the event volume, the windows stay partitioned.
        # Probes the SHIPPED plan via the shared frame helper.
        from real_time_big_data_architect_spark.operators.windows import (
            running_count_distinct_frame,
        )

        results.append(_timed(
            "window_count_distinct", mult, n_ev * mult,
            running_count_distinct_frame(ev),
        ))

    # star join: lineitem and orders scale together (orderkey offsets
    # keep the join 1:1 per copy); customers stay fixed, so each
    # customer simply accrues mult× orders — realistic growth. Joins
    # are the canonical super-linear risk (a widening shuffle or a
    # dropped broadcast shows up immediately in this row).
    o_base = load_table(spark, SF_DIR, "orders")
    dims = {n: load_table(spark, SF_DIR, n) for n in ("customer", "nation", "region")}
    for mult in MULTS:
        li = _scaled(ev_base.sparkSession.read.parquet(
            f"{SF_DIR}/lineitem.parquet"), "l_orderkey", mult, 100_000_000)
        o = _scaled(o_base, "o_orderkey", mult, 100_000_000)
        price = F.col("l_extendedprice").cast("decimal(8,2)")
        disc = F.col("l_discount").cast("decimal(8,2)")
        net = (price * (F.lit(1).cast("decimal(8,2)") - disc)).alias("net")
        star = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(dims["customer"], o.o_custkey == dims["customer"].c_custkey)
            .join(F.broadcast(dims["nation"]),
                  dims["customer"].c_nationkey == dims["nation"].n_nationkey)
            .join(F.broadcast(dims["region"]),
                  dims["nation"].n_regionkey == dims["region"].r_regionkey)
            .select(F.col("r_name").alias("region_name"), net)
            .groupBy("region_name")
            .agg(F.sum("net").cast("double").alias("revenue"),
                 F.count("*").alias("n_lineitems"))
        )
        n_li = li.count()
        results.append(_timed("star_join", mult, n_li, star))

    # bloom-pruned join: the dim (ASIA customers) stays fixed while the
    # fact side multiplies — the runtime-filter's sweet spot. The probe
    # is k broadcast semi-joins, so cost must track the fact scan.
    from real_time_big_data_architect_spark.operators.joins import (  # noqa: E402
        bloom_prune,
    )

    bloom_dim = (
        dims["customer"]
        .join(F.broadcast(dims["nation"]),
              dims["customer"].c_nationkey == dims["nation"].n_nationkey)
        .join(F.broadcast(dims["region"]),
              dims["nation"].n_regionkey == dims["region"].r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    n_o = o_base.count()
    for mult in MULTS:
        o = _scaled(o_base, "o_orderkey", mult, 100_000_000)
        pruned = bloom_prune(o, "o_custkey", bloom_dim, "c_custkey")
        results.append(_timed(
            "bloom_prune_join", mult, n_o * mult,
            pruned.join(bloom_dim,
                        pruned.o_custkey == bloom_dim.c_custkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
                 .alias("rev")),
        ))

    for mult in MULTS:
        docs = _scaled(doc_base, "doc_id", mult, 10_000_000)
        # Arrow kernel: embarrassingly parallel per-doc compute
        results.append(_timed(
            "minhash_signatures", mult, n_doc * mult,
            docs.repartition(spark.sparkContext.defaultParallelism)
            .select("doc_id", _minhash_text("text").alias("mh")),
        ))

    # Heavy LLM-family operators run against SCALED FIXTURE DIRS so the
    # full declared pipelines (persist stages, IVF training, iterative
    # CC rounds) execute unmodified. Copies are DECORRELATED — texts get
    # a per-copy character rotation, embeddings a per-copy random sign
    # flip (an isometry: intra-copy cosines are bit-identical, cross-
    # copy cosines collapse to noise) — otherwise every copy of a doc
    # would near-dup-pair with every other copy and the measured
    # workload itself would grow quadratically with the multiplier.
    import shutil
    import tempfile

    from real_time_big_data_architect_spark.operators import (  # noqa: E402
        aggregates as agg_ops,
        behavioral as behavioral_ops,
        curation as curation_ops,
        dedup as dedup_ops,
        graph as graph_ops,
        quality as quality_ops,
        similarity as sim_ops,
        sketches as sketches_ops,
        text as text_ops,
        windows as windows_ops,
    )

    scale_root = tempfile.mkdtemp(prefix="scalecheck_")
    try:
        emb_base = load_table(spark, SF_DIR, "embeddings")
        n_emb = emb_base.count()
        for mult in MULTS:
            d = f"{scale_root}/x{mult}"
            # shared decorrelation helpers (single source of truth for
            # every probe): rotated texts, sign-flipped embeddings,
            # user+20-year-ts-offset events (offsetting user_id alone
            # is not enough — same-ts rows from different copies would
            # interleave in the transition-edge window and manufacture
            # cross-copy edges)
            _rotated_doc_copies(doc_base, mult).write.mode(
                "overwrite"
            ).parquet(f"{d}/documents.parquet")
            _flipped_emb_copies(emb_base, mult).write.mode(
                "overwrite"
            ).parquet(f"{d}/embeddings.parquet")
            _offset_event_copies(ev_base, mult).write.mode(
                "overwrite"
            ).parquet(f"{d}/events.parquet")

            # these operators materialize stages DURING construction
            # (persist, localCheckpoint, centroid training), so they
            # are timed END-TO-END: rebuild the DataFrame inside the
            # timed region with the cache cleared — otherwise the
            # second write would just re-read checkpointed results and
            # measure nothing
            def _timed_e2e(label: str, n_rows: int, mk) -> dict:
                spark.catalog.clearCache()
                mk().write.format("noop").mode("overwrite").save()  # warm
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                mk().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                rate = n_rows / dt / 1e6
                print(
                    f"{label:24s} x{mult:<3d} {n_rows/1e6:8.2f} Mrows "
                    f"{dt:7.2f}s  {rate:7.2f} Mrows/s",
                    flush=True,
                )
                return {"op": label, "mult": mult, "rows": n_rows,
                        "sec": round(dt, 2), "mrows_per_s": round(rate, 2)}

            results.append(_timed_e2e(
                "dedup_minhash_lsh", n_doc * mult,
                lambda: dedup_ops.dedup_minhash_lsh(spark, d),
            ))
            results.append(_timed_e2e(
                "dedup_clusters", n_emb * mult,
                # clear the session pair stage so BOTH the warm and the
                # timed run pay the full pair-generation pipeline (the
                # stage would otherwise turn the timed run into a
                # parquet read of the warm run's artifact)
                lambda: (
                    sim_ops.clear_pair_stage(),
                    dedup_ops.dedup_clusters(spark, d),
                )[1],
            ))
            results.append(_timed_e2e(
                "ivf_topk", n_emb * mult,
                lambda: sim_ops.ivf_topk(spark, d),
            ))
            results.append(_timed_e2e(
                "triangle_count", n_ev * mult,
                lambda: graph_ops.triangle_count(spark, d),
            ))
            results.append(_timed_e2e(
                "bigram_lm_score", n_doc * mult,
                lambda: quality_ops.bigram_lm_score(spark, d),
            ))
            # round-4 additions. bfs_khop: copies are disjoint
            # subgraphs (ts-shifted), each with its own %97 seeds, so
            # the frontier workload is mult× replicas. interval_merge:
            # one window+agg on user_id. collocations_lift: the
            # per-copy character rotation grows the vocab with mult
            # while bigram instances stay linear. (grid_radius_join is
            # deliberately absent: multiplying users on a fixed plane
            # densifies it, so the OUTPUT pair count grows ~mult² —
            # a property of the data, not a plan defect; its scale
            # story is the 9-cell candidate bound, asserted in tests.)
            results.append(_timed_e2e(
                "bfs_khop", n_ev * mult,
                lambda: graph_ops.bfs_khop(spark, d),
            ))
            results.append(_timed_e2e(
                "interval_merge", n_ev * mult,
                lambda: windows_ops.interval_merge(spark, d),
            ))
            results.append(_timed_e2e(
                "collocations_lift", n_doc * mult,
                lambda: text_ops.collocations_lift(spark, d),
            ))
            # HLL: register state is CONSTANT per type regardless of
            # input, so throughput must rise steeply with the multiplier
            results.append(_timed_e2e(
                "hll_distinct", n_ev * mult,
                lambda: sketches_ops.hll_distinct(spark, d),
            ))
            # audience overlap: distinct self-join fan-out is bounded by
            # |types|² per user — linear in users despite the self-join
            results.append(_timed_e2e(
                "audience_overlap", n_ev * mult,
                lambda: behavioral_ops.audience_overlap(spark, d),
            ))
            # round-5 rewires: the range-partitioned two-pass rank
            # replaced single-partition windows in auc_rank /
            # curation_score / pagerank — these rows are the direct
            # evidence the global rank now scales (throughput must stay
            # flat-or-rising; the old WindowExec plan would flatline at
            # one core and nosedive)
            results.append(_timed_e2e(
                "auc_rank", n_emb * mult,
                lambda: agg_ops.auc_rank(spark, d),
            ))
            results.append(_timed_e2e(
                "curation_score", n_doc * mult,
                lambda: curation_ops.curation_score(spark, d),
            ))
            results.append(_timed_e2e(
                "pagerank", n_ev * mult,
                lambda: graph_ops.pagerank(spark, d),
            ))
            # r5c graph loops: both relax/propagate over the same
            # near-disjoint replica graph — per-round cost must stay
            # data-proportional (joins keyed on user_id, no global node)
            results.append(_timed_e2e(
                "sssp_weighted", n_ev * mult,
                lambda: graph_ops.sssp_weighted(spark, d),
            ))
            results.append(_timed_e2e(
                "label_propagation", n_ev * mult,
                lambda: graph_ops.label_propagation(spark, d),
            ))
            # vocab_coverage: the global top-V vocabulary now selects
            # via orderBy().limit() (TakeOrderedAndProject per-partition
            # heaps) instead of row_number() over ONE unpartitioned
            # window; the per-copy character rotation grows the word
            # count table with mult, so a single-task rank would
            # flatline here
            results.append(_timed_e2e(
                "vocab_coverage", n_doc * mult,
                lambda: text_ops.vocab_coverage(spark, d),
            ))
            spark.catalog.clearCache()  # drop per-dir persisted stages
    finally:
        shutil.rmtree(scale_root, ignore_errors=True)

    import json

    print(json.dumps(results))
    spark.stop()


def r7_probe() -> None:
    """r6 verdict item 6: planted-skew probes for the remaining
    pair-generators. Run: ``python tools/scalecheck.py r7``.

    - ``dedup_ngram_jaccard`` / ``media_phash_dedup``: a fully
      degenerate corpus (10 000 × mult verbatim copies of one
      boilerplate page) lands every doc in the same LSH / phash-band
      buckets; the shared chain guard must bound candidates at n·k and
      keep wall ~linear (the unguarded join would be n²/2 pairs).
    - ``grid_radius_join``: 250 × mult points planted into ONE grid
      cell (user ids rejection-sampled JVM-side so their md5-derived
      coordinates land in cell (0,0)). A radius join's CONTRACT is all
      qualifying pairs, so output is genuinely Θ(n²) for a dense cell —
      the scale invariant here is emitted PAIRS/s flat-or-rising, i.e.
      the bin-and-verify plan adds no overhead beyond the
      semantically-required output.
    """
    import json
    import shutil
    import tempfile

    from real_time_big_data_architect_spark.operators import (
        dedup as dedup_ops,
        joins as join_ops,
        multimodal as mm_ops,
    )

    spark = get_spark("scalecheck-r7")
    results = []
    root = tempfile.mkdtemp(prefix="scale_r7_")
    boiler = " ".join(f"boilerplate{w % 23} filler{w % 7}" for w in range(24))
    try:
        # ---- hot-key corpora for the two guarded pair-generators ----
        for mult in MULTS:
            n_hot = 10_000 * mult
            d = f"{root}/hot{mult}"
            spark.range(n_hot).selectExpr(
                "id AS doc_id",
                f"'{boiler}' AS text",
                "'en' AS lang",
                "'web' AS source",
                f"CAST({len(boiler)} AS BIGINT) AS n_chars",
            ).repartition(32).write.mode("overwrite").parquet(
                f"{d}/documents.parquet"
            )
            for label, fn in (
                ("ngram_jaccard_hot", dedup_ops.dedup_ngram_jaccard),
                ("phash_hot_bucket", mm_ops.media_phash_dedup),
            ):
                spark.catalog.clearCache()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                out = fn(spark, d)
                out.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                n_pairs = out.count()
                # phash corpus plants +2% variants (n/50 exact + n/50
                # near copies); bound accordingly
                n_eff = n_hot + (n_hot // 50) * 2 if label.startswith("ph") else n_hot
                bound = n_eff * dedup_ops.LSH_CHAIN_NEIGHBORS
                print(
                    f"{label} x{mult:<3d} n={n_hot:<7d} {dt:6.2f}s"
                    f" pairs={n_pairs} (bound n*k={bound}, naive n^2/2="
                    f"{n_eff * (n_eff - 1) // 2})",
                    flush=True,
                )
                assert n_pairs <= bound, f"{label}: chain guard violated"
                results.append({"op": label, "mult": mult, "n_hot": n_hot,
                                "sec": round(dt, 2), "pairs": n_pairs,
                                "bound": bound})

        # ---- grid_radius_join: one dense cell ----
        # rejection-sample user ids whose md5-derived point lands in
        # cell (0,0): JVM-side vectorized scan, no driver loop
        accept = (
            spark.range(60_000_000)
            .selectExpr(
                "id",
                "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10)"
                " AS BIGINT) % 10000 AS hx",
                "CAST(conv(substring(md5(CAST(id AS STRING)), 9, 8), 16, 10)"
                " AS BIGINT) % 10000 AS hy",
            )
            .where("hx < 150 AND hy < 150")  # x,y in [0,15) => cell (0,0)
            .limit(250 * MULTS[-1])
            .select("id")
        )
        hot_ids = [r.id for r in accept.collect()]
        assert len(hot_ids) >= 250 * MULTS[-1], "not enough sampled ids"
        for mult in MULTS:
            n_pts = 250 * mult
            d = f"{root}/grid{mult}"
            spark.createDataFrame(
                [(int(u),) for u in hot_ids[:n_pts]], "user_id long"
            ).selectExpr(
                "user_id",
                "'click' AS event_type",
                "CAST(user_id AS DOUBLE) AS value",
                "TIMESTAMP '2024-01-01 00:00:00' AS ts",
            ).repartition(32).write.mode("overwrite").parquet(
                f"{d}/events.parquet"
            )
            spark.catalog.clearCache()
            join_ops.grid_radius_join(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out = join_ops.grid_radius_join(spark, d)
            out.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            n_pairs = out.count()
            print(
                f"grid_hot_cell x{mult:<3d} n={n_pts:<6d} {dt:6.2f}s"
                f" pairs={n_pairs}"
                f" ({n_pairs / dt / 1e6:.2f} Mpairs/s)",
                flush=True,
            )
            results.append({"op": "grid_hot_cell", "mult": mult,
                            "n_pts": n_pts, "sec": round(dt, 2),
                            "pairs": n_pairs,
                            "mpairs_s": round(n_pairs / dt / 1e6, 2)})

        # ---- pca_certify: the r7 mapInArrow Gram at x1/x4/x16 ----
        # (the r6 verdict flagged the missing SCALING row for the then-
        # slowest query; the probe now times the rebuilt kernel)
        from real_time_big_data_architect_spark.operators import (
            similarity as sim_ops,
        )

        emb_base = load_table(spark, SF_DIR, "embeddings")
        n_emb = emb_base.count()
        for mult in MULTS:
            d = f"{root}/pca{mult}"
            _flipped_emb_copies(emb_base, mult).write.mode(
                "overwrite"
            ).parquet(f"{d}/embeddings.parquet")
            spark.catalog.clearCache()
            sim_ops.pca_certify(spark, d).collect()  # warm
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            sim_ops.pca_certify(spark, d).collect()
            dt = time.perf_counter() - t0
            n = n_emb * mult
            print(
                f"pca_certify x{mult:<3d} n={n:<7d} {dt:6.2f}s"
                f" ({n / dt / 1e3:.1f} kvec/s)",
                flush=True,
            )
            results.append({"op": "pca_certify", "mult": mult, "n": n,
                            "sec": round(dt, 2),
                            "kvec_s": round(n / dt / 1e3, 1)})
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))
    spark.stop()


def x256_probe() -> None:
    """r9 verdict item 5: extend ×256 scaling evidence beyond the graph
    family to the shuffle-heaviest non-graph queries —
    ``dedup_minhash_lsh`` (banded bucket join), ``dedup_clusters``
    (IVF pair generation + star-contraction CC), ``record_linkage``
    (DIV-span block self-join + best-match window) and
    ``bigram_lm_score`` (corpus bigram join). Times each end-to-end at
    ×64 and ×256 scaled fixture dirs with the shared decorrelation
    discipline (rotated texts / sign-flipped embeddings / key-offset
    customers, so copies cannot cross-match); per-row cost must be
    flat-or-falling from ×64 to ×256. Run:
    ``python tools/scalecheck.py x256 [mult ...]``.
    """
    import json
    import shutil
    import tempfile

    from real_time_big_data_architect_spark.operators import (
        dedup as dedup_ops,
        quality as quality_ops,
        similarity as sim_ops,
    )
    from real_time_big_data_architect_spark.plans import workload

    bad = [a for a in sys.argv[2:] if not a.isdigit()]
    if bad:  # no operator filter here — only multiplier overrides
        print(f"x256 takes only integer multipliers, got {bad}",
              file=sys.stderr)
        sys.exit(2)
    mults = tuple(int(a) for a in sys.argv[2:]) or (64, 256)
    spark = get_spark("scalecheck-x256")
    qs = workload.build_queries()
    doc_base = load_table(spark, SF_DIR, "documents")
    emb_base = load_table(spark, SF_DIR, "embeddings")
    cust_base = load_table(spark, SF_DIR, "customer")
    n_doc, n_emb, n_cust = (
        doc_base.count(), emb_base.count(), cust_base.count()
    )
    results = []
    root = tempfile.mkdtemp(prefix="scale256_")
    try:
        for mult in mults:
            d = f"{root}/x{mult}"
            _rotated_doc_copies(doc_base, mult).write.mode(
                "overwrite"
            ).parquet(f"{d}/documents.parquet")
            _flipped_emb_copies(emb_base, mult).write.mode(
                "overwrite"
            ).parquet(f"{d}/embeddings.parquet")
            _scaled(cust_base, "c_custkey", mult, 10_000_000).write.mode(
                "overwrite"
            ).parquet(f"{d}/customer.parquet")

            def _timed_e2e(label: str, n_rows: int, mk) -> dict:
                spark.catalog.clearCache()
                mk().write.format("noop").mode("overwrite").save()  # warm
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                mk().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                rate = n_rows / dt / 1e6
                print(
                    f"{label:20s} x{mult:<4d} {n_rows/1e6:8.2f} Mrows "
                    f"{dt:7.2f}s  {rate:7.2f} Mrows/s",
                    flush=True,
                )
                return {"op": label, "mult": mult, "rows": n_rows,
                        "sec": round(dt, 2), "mrows_per_s": round(rate, 2)}

            results.append(_timed_e2e(
                "dedup_minhash_lsh", n_doc * mult,
                lambda: dedup_ops.dedup_minhash_lsh(spark, d),
            ))
            results.append(_timed_e2e(
                "dedup_clusters", n_emb * mult,
                # clear the session pair stage so BOTH the warm and the
                # timed run pay the full pair-generation pipeline (the
                # stage would otherwise turn the timed run into a
                # parquet read of the warm run's artifact)
                lambda: (
                    sim_ops.clear_pair_stage(),
                    dedup_ops.dedup_clusters(spark, d),
                )[1],
            ))
            results.append(_timed_e2e(
                "record_linkage", n_cust * mult,
                lambda: qs["record_linkage"](spark, d),
            ))
            results.append(_timed_e2e(
                "bigram_lm_score", n_doc * mult,
                lambda: quality_ops.bigram_lm_score(spark, d),
            ))
            spark.catalog.clearCache()
            shutil.rmtree(d, ignore_errors=True)  # bound disk across mults
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "hot":
        hot_bucket_probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "x64":
        x64_probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "x64graph":
        x64graph_probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "x256":
        x256_probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "r6":
        r6_probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "r7":
        r7_probe()
    else:
        main()
