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
    alpha = "aeiousnrtlcdmhgp"  # 16 rotations for up to 16 copies
    try:
        emb_base = load_table(spark, SF_DIR, "embeddings")
        n_emb = emb_base.count()
        for mult in MULTS:
            d = f"{scale_root}/x{mult}"
            doc_copies = []
            emb_copies = []
            for c in range(mult):
                rot = alpha[c:] + alpha[:c]
                doc_copies.append(
                    doc_base.withColumn(
                        "doc_id", F.col("doc_id") + F.lit(c * 10_000_000)
                    ).withColumn(
                        "text",
                        F.expr(f"translate(text, '{alpha}', '{rot}')"),
                    )
                )
                flip = (
                    "transform(embedding, (v, i) -> CAST(v * (CASE WHEN "
                    f"pmod(hash(i + {c} * 64), 2) = 0 THEN 1.0 ELSE -1.0 "
                    "END) AS FLOAT))"
                )
                emb_copies.append(
                    emb_base.withColumn(
                        "vec_id", F.col("vec_id") + F.lit(c * 10_000_000)
                    ).withColumn("embedding", F.expr(flip))
                )
            functools.reduce(DataFrame.unionByName, doc_copies).write.mode(
                "overwrite"
            ).parquet(f"{d}/documents.parquet")
            functools.reduce(DataFrame.unionByName, emb_copies).write.mode(
                "overwrite"
            ).parquet(f"{d}/embeddings.parquet")
            # events: offset user_id AND ts per copy. The user offset
            # alone is not enough for a disjoint-subgraph claim: the
            # transition-edge window orders by ts within event_type, and
            # same-ts rows from different copies would interleave,
            # manufacturing cross-copy edges. Shifting each copy by 20
            # years puts copies in disjoint time ranges, so the lead()
            # chain stays within a copy (except one boundary hop per
            # event_type where a copy's last event leads into the next
            # copy — O(mult) edges among ~100k, noise) and the graph is
            # mult near-disjoint replicas.
            ev_copies = [
                ev_base.withColumn(
                    "event_id", F.col("event_id") + F.lit(c * 10_000_000)
                ).withColumn(
                    "user_id", F.col("user_id") + F.lit(c * 10_000_000)
                ).withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {c * 7300} DAYS")
                )
                for c in range(mult)
            ]
            functools.reduce(DataFrame.unionByName, ev_copies).write.mode(
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
                lambda: dedup_ops.dedup_clusters(spark, d),
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


if __name__ == "__main__":
    main()
