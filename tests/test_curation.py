"""Invariant tests for the corpus-curation operators (NS6).

The oracle gate already certifies value-exactness vs DuckDB; these
tests pin the *semantic* invariants the SQL twin can't express:
packing respects the token budget, quotas cap every domain, the shard
permutation is a bijection, and the scrub removes every planted PII
token.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.operators import curation
from real_time_big_data_architect_spark.tables import load_table


@pytest.fixture(scope="module")
def sf_small():
    return "/root/testdata/sf0.001"


def test_sample_stratified_rates(spark, sf_small):
    total = load_table(spark, sf_small, "documents").groupBy("lang").count()
    sampled = (
        curation.sample_stratified(spark, sf_small).groupBy("lang").count()
    )
    tot = {r.lang: r["count"] for r in total.collect()}
    got = {r.lang: r["count"] for r in sampled.collect()}
    # deterministic modulo sampling: rates land near the target percent
    for lang, n in got.items():
        rate = curation.SAMPLE_RATES.get(lang, curation.SAMPLE_RATE_DEFAULT)
        assert 0 < n <= tot[lang]
        assert abs(n / tot[lang] - rate / 100) < 0.2
    # rerun is identical (no rand() anywhere)
    again = {
        r.lang: r["count"]
        for r in curation.sample_stratified(spark, sf_small)
        .groupBy("lang")
        .count()
        .collect()
    }
    assert again == got


def test_pack_sequences_budget_and_contiguity(spark, sf_small):
    rows = curation.pack_sequences(spark, sf_small).collect()
    by_seq = {}
    for r in rows:
        by_seq.setdefault((r.lang, r.seq_id), []).append(r)
    for (lang, seq_id), docs in by_seq.items():
        docs.sort(key=lambda r: r.seq_pos)
        # positions are 1..n dense
        assert [d.seq_pos for d in docs] == list(range(1, len(docs) + 1))
        # all but the straddling last doc fit inside the budget
        tok_sum = sum(d.tok_est for d in docs)
        assert tok_sum - docs[-1].tok_est < curation.TOKENS_PER_SEQ
    # seq ids per lang are dense from 0
    for lang in {r.lang for r in rows}:
        ids = sorted({r.seq_id for r in rows if r.lang == lang})
        assert ids == list(range(len(ids)))


def test_cap_per_source_keeps_longest(spark, sf_small):
    capped = curation.cap_per_source(spark, sf_small).collect()
    per_src = {}
    for r in capped:
        per_src.setdefault(r.source, []).append(r)
    docs = load_table(spark, sf_small, "documents").collect()
    lengths = {}
    for d in docs:
        lengths.setdefault(d.source, []).append(d.n_chars)
    for src, kept in per_src.items():
        assert len(kept) <= curation.CAP_PER_SOURCE
        floor_kept = min(r.n_chars for r in kept)
        dropped = sorted(lengths[src], reverse=True)[len(kept):]
        assert all(n <= floor_kept for n in dropped)


def test_pii_scrub_removes_all_planted(spark, sf_small):
    out = curation.pii_scrub(spark, sf_small).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_emails == 1 and r.n_phones == 1
        assert len(r.scrub_md5) == 32


def test_shuffle_shards_is_a_permutation(spark, sf_small):
    rows = curation.shuffle_shards(spark, sf_small).collect()
    keys = [r.shuffle_key for r in rows]
    # affine map with odd multiplier is injective on distinct doc_ids
    assert len(set(keys)) == len(keys)
    assert set(r.shard for r in rows) == set(range(curation.N_SHARDS))
    # the shuffle actually reorders: sharded order != doc_id order
    by_key = [r.doc_id for r in sorted(rows, key=lambda r: r.shuffle_key)]
    assert by_key != sorted(by_key)
    # within-shard positions are dense
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r.shard, []).append(r.shard_pos)
    for poss in per_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_train_test_split_properties(spark, sf_small):
    """Ratios near 90/5/5, exhaustive assignment, leakage-safe grouping."""
    rows = curation.train_test_split(spark, sf_small).collect()
    n = len(rows)
    assert n == load_table(spark, sf_small, "documents").count()
    by_split = {}
    source_split = {}
    for r in rows:
        assert r.doc_split in ("train", "val", "test")
        by_split[r.doc_split] = by_split.get(r.doc_split, 0) + 1
        # every doc of a source gets the same source_split (no leakage)
        assert source_split.setdefault(r.source, r.source_split) == r.source_split
    assert 0.85 <= by_split["train"] / n <= 0.93
    assert by_split.get("val", 0) > 0 and by_split.get("test", 0) > 0
    # deterministic: a second run assigns identically
    again = {r.doc_id: r.doc_split for r in curation.train_test_split(spark, sf_small).collect()}
    assert all(again[r.doc_id] == r.doc_split for r in rows)


def test_doc_chunks_cover_and_overlap(spark, sf_small):
    """Chunks tile each document: starts step by the stride, every char
    of the doc appears in some chunk, and consecutive chunks overlap by
    CHUNK_SIZE - CHUNK_STRIDE chars."""
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_small, "documents").collect()
    }
    rows = curation.doc_chunks(spark, sf_small).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(docs)
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        text = docs[doc_id]
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c.chunk_start == 1 + c.chunk_id * curation.CHUNK_STRIDE
            assert c.chunk_text == text[c.chunk_start - 1 : c.chunk_start - 1 + curation.CHUNK_SIZE]
        # full coverage: last chunk reaches the end of the text
        last = chunks[-1]
        assert last.chunk_start + last.chunk_len - 1 == len(text)


def test_mix_reweight_flattens_skew(spark, sf_small):
    before = {
        r.lang: r["count"]
        for r in load_table(spark, sf_small, "documents")
        .groupBy("lang").count().collect()
    }
    rows = curation.mix_reweight(spark, sf_small).collect()
    after = {}
    for r in rows:
        after[r.lang] = after.get(r.lang, 0) + 1
        assert 0 < r.keep_rate <= 1.0
    # rarest language keeps everything (rate 1.0)
    rare = min(before, key=before.get)
    assert after[rare] == before[rare]
    # skew shrinks: max/min ratio after <= before
    ratio_before = max(before.values()) / min(before.values())
    ratio_after = max(after.values()) / min(after.values())
    assert ratio_after <= ratio_before


def test_dedup_incremental_drops_exactly_planted(spark, sf_small):
    d = load_table(spark, sf_small, "documents")
    batch_ids = [
        r.doc_id
        for r in d.filter(F.col("doc_id") % curation.BATCH_MOD == 0).collect()
    ]
    survivors = {r.doc_id for r in curation.dedup_incremental(spark, sf_small).collect()}
    corpus_ids = {
        r.doc_id
        for r in d.filter(F.col("doc_id") % curation.BATCH_MOD != 0).collect()
    }
    for doc_id in batch_ids:
        planted = doc_id % (2 * curation.BATCH_MOD) == 0 and (doc_id + 1) in corpus_ids
        assert (doc_id in survivors) == (not planted)


def test_sample_reservoir_group_uniform_and_stable(spark, sf_small):
    """Exactly min(k, |group|) rows per source, identical across runs,
    and equal to the md5-order prefix."""
    import hashlib

    from real_time_big_data_architect_spark.operators import curation as C
    from real_time_big_data_architect_spark.tables import load_table

    docs = load_table(spark, sf_small, "documents").collect()
    by_src: dict = {}
    for d in docs:
        by_src.setdefault(d.source, []).append(d.doc_id)
    expect = {}
    for src, ids in by_src.items():
        ordered = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        expect[src] = ordered[: C.RESERVOIR_K]
    run1 = C.sample_reservoir_group(spark, sf_small).collect()
    run2 = C.sample_reservoir_group(spark, sf_small).collect()
    assert {(r.doc_id, r.draw_rank) for r in run1} == {
        (r.doc_id, r.draw_rank) for r in run2
    }
    got: dict = {}
    for r in run1:
        got.setdefault(r.source, {})[r.draw_rank] = r.doc_id
    assert set(got) == set(expect)
    for src, picks in expect.items():
        assert [got[src][i + 1] for i in range(len(picks))] == picks


def test_sample_exact_k_size_determinism_and_heap_plan(spark, sf_small):
    from real_time_big_data_architect_spark.operators.curation import (
        SAMPLE_EXACT_K,
        sample_exact_k,
    )
    from real_time_big_data_architect_spark.plans import explain

    a = sample_exact_k(spark, sf_small)
    ids_a = sorted(r.doc_id for r in a.collect())
    assert len(ids_a) == SAMPLE_EXACT_K
    # rerun-stable: the same rows on a fresh plan
    ids_b = sorted(r.doc_id for r in sample_exact_k(spark, sf_small).collect())
    assert ids_a == ids_b
    # O(k)-driver physical plan: per-partition heaps, no global sort
    assert "TakeOrderedAndProject" in explain.formatted_plan(a)
