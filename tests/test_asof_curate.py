"""Tests for the as-of join and the corpus-curation pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_architect_spark.operators import dedup, joins, text
from real_time_big_data_architect_spark.tables import load_table


def test_asof_join_invariants(spark, sf_small):
    out = joins.asof_join(spark, sf_small)
    rows = out.collect()
    n_purchases = (
        load_table(spark, sf_small, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert len(rows) == n_purchases  # left join keeps every purchase
    for r in rows:
        if r.view_event_id is not None:
            assert r.view_ts <= r.ts  # matched view is at-or-before
            assert r.gap_us >= 0
        else:
            assert r.view_ts is None and r.gap_us is None


def test_asof_join_matches_python_recompute(spark, sf_small):
    """Cross-check one user's matches against a straightforward scan."""
    ev = load_table(spark, sf_small, "events")
    uid = ev.filter(F.col("event_type") == "purchase").first().user_id
    user_events = sorted(
        ev.filter(F.col("user_id") == uid).collect(), key=lambda r: r.ts
    )
    views = {}  # ts -> max event_id
    for r in user_events:
        if r.event_type == "view":
            views[r.ts] = max(views.get(r.ts, -1), r.event_id)
    expected = {}
    for r in user_events:
        if r.event_type == "purchase":
            prior = [(ts, eid) for ts, eid in views.items() if ts <= r.ts]
            expected[r.event_id] = max(prior)[1] if prior else None
    got = {
        r.event_id: r.view_event_id
        for r in joins.asof_join(spark, sf_small).filter(F.col("user_id") == uid).collect()
    }
    assert got == expected


def test_curate_corpus_gates_hold(spark, sf_small):
    out = text.curate_corpus(spark, sf_small).collect()
    assert len(out) > 0
    for r in out:
        assert r.lang in text.CURATE_LANGS
        assert r.n_words >= text.CURATE_MIN_WORDS
        assert r.est_bpe_tokens >= 1


def test_curate_corpus_is_subset_of_survivors(spark, sf_small):
    survivors = {r.doc_id for r in dedup.dedup_survivors(spark, sf_small).collect()}
    curated = {r.doc_id for r in text.curate_corpus(spark, sf_small).collect()}
    assert curated <= survivors


def test_curate_corpus_no_duplicate_texts(spark, sf_small):
    curated = text.curate_corpus(spark, sf_small).select("doc_id")
    d = load_table(spark, sf_small, "documents")
    joined = curated.join(d, "doc_id").select(F.md5("text").alias("h"))
    assert joined.count() == joined.distinct().count()


def test_salted_join_equals_plain_join(spark, sf_small):
    """Salting must not change semantics, only the shuffle layout."""
    salted = sorted(map(tuple, joins.join_skew_salted(spark, sf_small).collect()))
    ev = load_table(spark, sf_small, "events")
    dim = ev.groupBy("event_type").agg(F.count("*").alias("n_type_events"))
    plain = sorted(map(tuple, ev.join(dim, "event_type")
                       .select("event_id", "event_type", "n_type_events").collect()))
    assert salted == plain


def test_salt_spreads_keys(spark, sf_small):
    """Each hot key must actually occupy all N_SALTS sub-keys."""
    ev = load_table(spark, sf_small, "events")
    salts = (
        ev.select("event_type", F.pmod(F.xxhash64("event_id"), F.lit(joins.N_SALTS)).alias("salt"))
        .groupBy("event_type")
        .agg(F.countDistinct("salt").alias("n_salts"))
        .collect()
    )
    assert all(r.n_salts == joins.N_SALTS for r in salts)
