"""Semantic locks for the rows-only streaming queries.

Append-mode watermark emission is engine-timing-specific (which windows
finalize depends on per-batch watermark advancement), so these queries
carry no SQL oracle — but every window they DO emit must carry the
complete, batch-identical aggregate: a finalized window can never lose
or double-count late rows that the batch plan sees. That subset
equality is the testable core of watermark correctness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_architect_spark.operators import multimodal
from real_time_big_data_architect_spark.streaming import stateful, time_windows
from real_time_big_data_architect_spark.tables import load_table


def test_stream_tumbling_emits_batch_identical_windows(spark, sf_small):
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in stateful.stream_tumbling_watermark(spark, sf_small).collect()
    }
    assert got, "availableNow drain emitted nothing"
    want = {
        (r.window_start, r.event_type): r.n_events
        for r in load_table(spark, sf_small, "events")
        .groupBy(
            F.window("ts", "1 hour").start.alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    for key, n in got.items():
        assert want[key] == n, f"finalized window {key} diverges from batch"


def test_stream_sliding_emits_batch_identical_windows(spark, sf_small):
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in stateful.stream_sliding_watermark(spark, sf_small).collect()
    }
    assert got
    want = {
        (r.window_start, r.event_type): r.n_events
        for r in load_table(spark, sf_small, "events")
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").start.alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    for key, n in got.items():
        assert want[key] == n


def test_stream_session_windows_are_batch_sessions(spark, sf_small):
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in stateful.stream_session_watermark(spark, sf_small).collect()
    }
    assert got
    want = {
        (r.user_id, r.session_start): r.n_events
        for r in load_table(spark, sf_small, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
        .collect()
    }
    for key, n in got.items():
        assert want[key] == n


def test_approx_distinct_certified_and_exact(spark, sf_small):
    from real_time_big_data_architect_spark.operators import aggregates

    got = {
        r.event_type: (r.exact_users, r.hll_in_bounds)
        for r in aggregates.approx_distinct(spark, sf_small).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for k in exact:
        assert got[k][0] == exact[k], f"{k}: exact path diverged"
        assert got[k][1], f"{k}: HLL estimate outside 3-sigma bound"


def test_multimodal_bundle_flattened_scalars(spark, sf_small):
    """r6 contract: the struct is BUILT internally and every output
    column is read back through it, flattened to hashable scalars
    (text md5, in-order embedding fold, metadata fields)."""
    df = multimodal.multimodal_bundle(spark, sf_small)
    fields = {f.name: f.dataType.typeName() for f in df.schema.fields}
    assert fields == {
        "doc_id": "long",
        "text_md5": "string",
        "embedding_sum": "double",
        "lang": "string",
        "source": "string",
        "n_chars": "long",
        "label": "integer",
    }
    rows = df.collect()
    assert rows
    # md5/field access went THROUGH the struct: spot-check one row
    # against a direct join projection
    direct = {
        r.doc_id: (r.m, float(sum(float(x) for x in r.embedding)))
        for r in spark.read.parquet(f"{sf_small}/documents.parquet")
        .join(
            spark.read.parquet(f"{sf_small}/embeddings.parquet"),
            F.col("doc_id") == F.col("vec_id"),
        )
        .select("doc_id", F.md5("text").alias("m"), "embedding")
        .collect()
    }
    for r in rows:
        assert r.text_md5 == direct[r.doc_id][0]
        assert abs(r.embedding_sum - direct[r.doc_id][1]) < 1e-6
