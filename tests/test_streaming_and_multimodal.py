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
    expected = {"doc_id": "bigint", "media_type": "string"}
    expected.update({f"f{k}": "double" for k in range(8)})
    assert dict(out.dtypes) == expected
    rows = out.collect()
    assert len(rows) > 0
    # bucket shares form a probability vector over the payload bytes
    for r in rows[:10]:
        shares = [getattr(r, f"f{k}") for k in range(8)]
        assert abs(sum(shares) - 1.0) < 1e-9
        assert all(s >= 0.0 for s in shares)
    # stub is deterministic: same input → same features
    again = multimodal.multimodal_features(spark, sf_small).collect()
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in again)


def test_multimodal_join_covers_embedded_docs(spark, sf_small):
    out = multimodal.multimodal_join(spark, sf_small)
    n_emb = load_table(spark, sf_small, "embeddings").count()
    n_docs = load_table(spark, sf_small, "documents").count()
    assert out.count() == min(n_emb, n_docs) or out.count() > 0


def test_stateful_counts_accumulate_across_micro_batches(
    spark, sf_small, tmp_path_factory
):
    """3 event files -> 3 micro-batches (maxFilesPerTrigger=1): the
    applyInPandasWithState counters must accumulate across batches and
    the final per-user state must equal the all-batches batch answer."""
    import pyarrow.parquet as pq

    tmp = tmp_path_factory.mktemp("multibatch")
    table = pq.read_table(f"{sf_small}/events.parquet")
    n = table.num_rows
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        pq.write_table(table.slice(lo, hi - lo), str(tmp / f"events{i}.parquet"))

    out = stateful.stream_stateful_counts(spark, str(tmp)).collect()
    # update-mode sink holds one row per (user, batch-with-change);
    # the final state per user is the max n_events emission
    final = {}
    for r in out:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, round(r.total_value, 6))
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in load_table(spark, sf_small, "events")
        .na.fill(0.0, ["value"])
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert final == want
    # state really did span batches: some user must appear more than once
    from collections import Counter

    per_user = Counter(r.user_id for r in out)
    assert max(per_user.values()) > 1


def test_stream_stream_join_matches_batch_range_join(spark, sf_small):
    """The drained stream-stream join equals the batch time-range join."""
    got = sorted(
        (r.purchase_id, r.view_id)
        for r in stateful.stream_stream_join(spark, sf_small).collect()
    )
    ev = load_table(spark, sf_small, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    want = sorted(
        (r.pid, r.vid)
        for r in p.join(
            v,
            (F.col("pu") == F.col("vu"))
            & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("vts") <= F.col("pts")),
        ).collect()
    )
    assert got == want


import pytest


def test_tws_available_in_driver_env():
    """Environment pin (r5 verdict item 4): the driver environment MUST
    carry transformWithStateInPandas' protobuf dependency, so the three
    TWS queries (stream_transform_with_state, stream_pattern_cep,
    stream_pattern_cep_eventtime) register unconditionally and their
    NotImplementedError guard is unreachable in preflight. If this
    fails, the environment lost google.protobuf — the guarded skips
    below would otherwise hide that silently."""
    assert stateful.TWS_AVAILABLE, (
        "google.protobuf missing: TWS queries degraded to"
        " NotImplementedError — fix the environment, do not skip"
    )


@pytest.mark.skipif(
    not stateful.TWS_AVAILABLE,
    reason="transformWithStateInPandas needs google.protobuf (absent here)",
)
def test_transform_with_state_matches_batch(spark, sf_small):
    got = {}
    for r in stateful.stream_transform_with_state(spark, sf_small).collect():
        if r.user_id not in got or r.n_events > got[r.user_id][0]:
            got[r.user_id] = (r.n_events, round(r.total_value, 6))
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in load_table(spark, sf_small, "events")
        .na.fill(0.0, ["value"])
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want


def test_stream_static_join_matches_batch(spark, sf_small):
    got = sorted(
        (r.event_id, r.n_type_events)
        for r in stateful.stream_static_join(spark, sf_small).collect()
    )
    ev = load_table(spark, sf_small, "events")
    dim = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    want = sorted((r.event_id, r.n) for r in ev.join(dim, "event_type").collect())
    assert got == want


def test_media_resize_geometry(spark, sf_small):
    out = multimodal.media_resize(spark, sf_small).collect()
    assert len(out) > 0
    for r in out:
        assert (r.out_width, r.out_height) == multimodal.RESIZE_TARGET
        assert r.scale_x > 0 and r.scale_y > 0
        assert r.out_bytes == 224 * 224 * 3


def test_media_frame_sample_expands_and_covers(spark, sf_small):
    frames = multimodal.media_frame_sample(spark, sf_small).collect()
    videos = {
        r.doc_id: len(bytes(r.payload))
        for r in multimodal.build_media_table(spark, sf_small)
        .filter(F.col("media_type") == "video")
        .collect()
    }
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(videos)
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r.frame_idx)
        n = videos[doc_id]
        assert [r.frame_idx for r in rows] == list(range(len(rows)))
        assert sum(r.frame_bytes for r in rows) == n  # frames tile the payload


def test_incremental_etl_resumes_from_checkpoint(spark, sf_small, tmp_path):
    """Exactly-once incremental ingest: a second run after new files
    land processes ONLY the delta — no reprocessing, no duplicates."""
    import shutil

    from real_time_big_data_architect_spark.streaming.incremental import (
        incremental_etl,
    )

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "in").mkdir()

    # batch 1: the sf0.001 events file
    shutil.copy(f"{sf_small}/events.parquet", f"{in_dir}/events0.parquet")
    incremental_etl(spark, in_dir, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    src1 = spark.read.parquet(f"{in_dir}/events0.parquet").count()
    assert n1 == src1

    # re-run with NO new input: checkpoint must suppress reprocessing
    incremental_etl(spark, in_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n1

    # batch 2: new file lands; only the delta is ingested
    shutil.copy(f"{sf_small}/events.parquet", f"{in_dir}/events1.parquet")
    incremental_etl(spark, in_dir, out_dir, ckpt)
    out = spark.read.parquet(out_dir)
    assert out.count() == 2 * n1
    # normalization applied: the derived partition-pruning column exists
    assert "event_hour" in out.columns
    # exactly-once: each event_id appears exactly twice (once per copy)
    dup = out.groupBy("event_id").count().filter("count != 2").count()
    assert dup == 0


def test_foreachbatch_mv_merges_across_micro_batches(
    spark, sf_small, tmp_path_factory
):
    """2 event files -> 2 micro-batches: the foreachBatch merge must
    produce a view equal to the batch aggregate over ALL events —
    the MV-maintenance invariant (merge is associative, so the split
    into batches cannot change the final view)."""
    import pyarrow.parquet as pq

    tmp = tmp_path_factory.mktemp("fbmv")
    table = pq.read_table(f"{sf_small}/events.parquet")
    n = table.num_rows
    pq.write_table(table.slice(0, n // 2), str(tmp / "events0.parquet"))
    pq.write_table(table.slice(n // 2), str(tmp / "events1.parquet"))

    got = {
        r.event_type: (round(r.sum_value, 4), r.n_events)
        for r in stateful.stream_foreachbatch_mv(spark, str(tmp)).collect()
    }
    want = {
        r.event_type: (round(r.s, 4), r.n)
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(30,4)"))
            .cast("double")
            .alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert got == want


def test_mv_merge_replay_and_crash_safety(spark, sf_small, tmp_path_factory):
    """The MV commit protocol must (a) skip a replayed micro-batch
    (foreachBatch is at-least-once — double-merging double-counts),
    (b) survive a crash between view write and pointer commit (the
    previous version stays readable), and (c) never treat a transient
    read failure as 'first batch'."""
    import os

    work = str(tmp_path_factory.mktemp("mv_protocol"))
    merge = stateful.make_mv_merge(work)
    ev = load_table(spark, sf_small, "events").limit(100).cache()
    ev.count()

    merge(ev, 0)
    first = stateful.mv_committed(work)
    assert first is not None and first[0] == 0
    view0 = spark.read.parquet(first[1]).collect()

    # replayed batch 0: pointer and view must be untouched
    merge(ev, 0)
    assert stateful.mv_committed(work) == first
    assert spark.read.parquet(first[1]).collect() == view0

    # batch 1 merges: totals double
    merge(ev, 1)
    second = stateful.mv_committed(work)
    assert second is not None and second[0] == 1
    n0 = {r.event_type: r.n_events for r in view0}
    n1 = {
        r.event_type: r.n_events
        for r in spark.read.parquet(second[1]).collect()
    }
    assert n1 == {k: 2 * v for k, v in n0.items()}
    # superseded version got GC'd, committed one survives
    assert not os.path.isdir(first[1])

    # crash simulation: a batch-2 view written but NOT committed (no
    # pointer replace) must leave batch 1 authoritative
    spark.read.parquet(second[1]).write.mode("overwrite").parquet(
        f"{work}/mv_v2"
    )
    assert stateful.mv_committed(work) == second


def test_media_phash_dedup_replay_and_exact_pairs(spark, sf_small):
    """Signatures match a numpy replay of the byte-4-gram SimHash;
    planted exact copies pair at Hamming 0 and one-byte variants within
    the threshold; the banded+guarded join equals all-pairs truth; and
    the signature is DISCRIMINATIVE (qualifying pairs ≪ all pairs —
    the r6 degenerate shape where every pair qualified is pinned out)."""
    import hashlib

    import numpy as np

    from real_time_big_data_architect_spark.operators import multimodal as M
    from real_time_big_data_architect_spark.tables import load_table

    docs = load_table(spark, sf_small, "documents").collect()

    def phash(text: str) -> int:
        raw = text.encode("utf-8")
        if len(raw) < 4:
            return 0
        shifts = np.arange(64, dtype=np.uint64)
        feats = np.fromiter(
            (
                int(
                    hashlib.md5(
                        raw[i : i + 4].hex().upper().encode()
                    ).hexdigest()[:16],
                    16,
                )
                for i in range(len(raw) - 3)
            ),
            dtype=np.uint64,
            count=len(raw) - 3,
        )
        bits = ((feats[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        return int(((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))

    off = M.phash_copy_offset(sf_small)
    expect = {d.doc_id: phash(d.text) for d in docs}
    for d in docs:  # planted corpus: exact copies + one-byte variants
        if d.doc_id % 50 == 0:
            expect[d.doc_id + off] = phash(d.text)
        if d.doc_id % 50 == 25:
            expect[d.doc_id + 2 * off] = phash(d.text + ".")
    got_sigs = {
        r.doc_id: r.phash & ((1 << 64) - 1)
        for r in M.media_phash(spark, sf_small).collect()
    }
    assert got_sigs == expect
    pairs = M.media_phash_dedup(spark, sf_small).collect()
    got = {(r.doc_a, r.doc_b, r.hamming) for r in pairs}
    # COMPLETE recall, not just precision: with 4 disjoint 16-bit bands
    # and threshold 3, pigeonhole guarantees every qualifying pair
    # shares a band — so (buckets under the chain-guard cap, asserted
    # below) the banded join's output must EQUAL all-pairs truth
    ids = sorted(expect)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            hm = (expect[a] ^ expect[b]).bit_count()
            if hm <= M.PHASH_MAX_HAMMING:
                truth.add((a, b, hm))
    assert got == truth
    # every planted exact copy surfaces at Hamming 0, every one-byte
    # variant within the threshold — the operator provably finds the
    # near-dups it exists to find
    for d in docs:
        if d.doc_id % 50 == 0:
            assert (d.doc_id, d.doc_id + off, 0) in got
        if d.doc_id % 50 == 25:
            assert any(
                a == d.doc_id and b == d.doc_id + 2 * off
                for a, b, _ in got
            )
    # discriminative: sparse qualifying set, not all-pairs (r6 weak)
    n = len(expect)
    assert len(got) < n * (n - 1) // 2 * 0.01
    # chain guard never bites on this corpus: every band bucket under cap
    from collections import Counter

    from real_time_big_data_architect_spark.operators.dedup import (
        LSH_BUCKET_CAP,
    )

    buckets = Counter()
    for doc_id, sig in expect.items():
        for band in range(M.PHASH_BANDS):
            buckets[(band, (sig >> (16 * band)) & 0xFFFF)] += 1
    assert max(buckets.values()) <= LSH_BUCKET_CAP


def test_stream_hll_split_invariance(spark, sf_small, tmp_path_factory):
    """3 event files -> 3 micro-batches: MAX-merged registers must give
    the SAME estimate as batch hll_distinct over all events (register
    merge is associative/commutative/idempotent, so the micro-batch
    split cannot change the sketch)."""
    import pyarrow.parquet as pq

    from real_time_big_data_architect_spark.operators import sketches as sk

    tmp = tmp_path_factory.mktemp("shll")
    table = pq.read_table(f"{sf_small}/events.parquet")
    n = table.num_rows
    pq.write_table(table.slice(0, n // 3), str(tmp / "events0.parquet"))
    pq.write_table(
        table.slice(n // 3, n // 3), str(tmp / "events1.parquet")
    )
    pq.write_table(table.slice(2 * (n // 3)), str(tmp / "events2.parquet"))

    got = {
        r.event_type: (r.n_zero_regs, r.hll_raw, r.hll_estimate)
        for r in stateful.stream_hll_distinct(spark, str(tmp)).collect()
    }
    want = {
        r.event_type: (r.n_zero_regs, r.hll_raw, r.hll_estimate)
        for r in sk.hll_distinct(spark, sf_small).collect()
    }
    assert got == want


def test_stream_cdc_apply_equals_v2(spark, sf_small):
    """Replaying the change feed forward over a seeded v1 view yields
    exactly the v2 snapshot, across 2 micro-batches."""
    from real_time_big_data_architect_spark.operators import mutations as MU

    got = {
        (r.o_orderkey, r.o_orderstatus, round(r.o_totalprice, 4))
        for r in stateful.stream_cdc_apply(spark, sf_small).collect()
    }
    v1 = MU._cdc_v1(spark, sf_small)
    want = {
        (r.o_orderkey, r.o_orderstatus, round(float(r.o_totalprice), 4))
        for r in MU._cdc_v2(v1).collect()
    }
    assert got == want
    # and it differs from v1 (the apply did real work)
    base = {
        (r.o_orderkey, r.o_orderstatus, round(float(r.o_totalprice), 4))
        for r in v1.collect()
    }
    assert got != base


def test_stream_watermark_boundary_emits_at_equality(spark, tmp_path):
    """Pin the append-mode emission predicate the drain oracles rely
    on: a window whose end EQUALS the final watermark (max ts − delay)
    IS emitted; a window whose end exceeds it is not. Crafted so
    max(ts) = 03:10:00.000000 exactly → watermark 03:00:00 = the end
    of window [02:00, 03:00)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from real_time_big_data_architect_spark.streaming import stateful as S

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 10, "view", base.replace(hour=2, minute=30)),
        (2, 11, "view", base.replace(hour=2, minute=59)),
        (3, 12, "view", base.replace(hour=3, minute=5)),
        (4, 13, "view", base.replace(hour=3, minute=10)),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = S.stream_tumbling_watermark(spark, str(tmp_path)).collect()
    got = {(str(r.window_start), r.n_events) for r in out}
    assert got == {("2024-01-01 02:00:00", 2)}


def test_phash_and_features_oracles_handle_empty_and_huge_docs(
    spark, tmp_path
):
    """r5 review regression: the multimodal oracles must not truncate
    large payloads nor drop zero-byte documents. Plants an empty-text
    doc (kernel emits sig=0 / all-zero shares), a ~120 kB doc (past the
    old fixed 100000-byte oracle bound), and a normal doc, then
    requires hash-grade equality between engine and oracle on both
    media_phash_dedup and multimodal_features."""
    import duckdb

    from real_time_big_data_architect_spark.operators import multimodal as M
    from real_time_big_data_architect_spark.plans import workload

    docs = [
        (0, "", "en", "alpha", 0),
        (1, "xyz " * 30000, "en", "alpha", 120000),
        (2, "normal document text", "en", "beta", 20),
        (3, "", "de", "beta", 0),  # second empty: empty-empty pair
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet.dir")
    )
    import glob
    import shutil

    part = glob.glob(str(tmp_path / "documents.parquet.dir" / "part-*.parquet"))[0]
    shutil.move(part, str(tmp_path / "documents.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path}/documents.parquet')"
    )
    oracles = workload.build_oracle_sql()
    for name, fn in (
        ("media_phash_dedup", M.media_phash_dedup),
        ("multimodal_features", M.multimodal_features),
    ):
        got = sorted(tuple(r) for r in fn(spark, str(tmp_path)).collect())
        want = sorted(tuple(r) for r in con.execute(oracles[name]).fetchall())
        assert got == want, name
    # the empty-empty pair is present at hamming 0
    pairs = {
        (r.doc_a, r.doc_b)
        for r in M.media_phash_dedup(spark, str(tmp_path)).collect()
    }
    assert (0, 3) in pairs


def test_stream_left_outer_null_emission_boundary(spark, tmp_path):
    """Pin the outer-join null-emission predicate the
    stream_stream_left_outer oracle relies on: an unmatched purchase
    STRICTLY below the final watermark (min over both sides of
    max(event time) − 10 min) emits a null-extended row in the drain;
    an unmatched purchase at or above it stays in state and never
    surfaces. Crafted so the watermark lands exactly on one purchase's
    ts (03:00) to pin the at-equality case, with tail events at 03:10
    on BOTH sides setting the watermark."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from real_time_big_data_architect_spark.streaming import stateful as S

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: matched pair (view 30 min before the purchase)
        (1, 1, "view", base.replace(hour=0, minute=30)),
        (2, 1, "purchase", base.replace(hour=1)),
        # user 2: unmatched purchase far below the watermark -> null row
        (3, 2, "purchase", base.replace(hour=1)),
        # user 3: unmatched purchase AT the watermark (03:00 exactly)
        (4, 3, "purchase", base.replace(hour=3)),
        # user 4: unmatched purchase above the watermark -> stays in state
        (5, 4, "purchase", base.replace(hour=3, minute=5)),
        # tails on both sides (DIFFERENT users, so they can't match
        # each other): watermark = 03:10 - 10 min = 03:00
        (6, 8, "view", base.replace(hour=3, minute=10)),
        (7, 9, "purchase", base.replace(hour=3, minute=10)),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = S.stream_stream_left_outer(spark, str(tmp_path)).collect()
    matched = {(r.purchase_id, r.view_id) for r in out if r.view_id is not None}
    nulls = {r.purchase_id for r in out if r.view_id is None}
    assert matched == {(2, 1)}
    # strictly-below emits; at-equality and above do not
    assert nulls == {3}


def test_stream_full_outer_both_sides_boundary(spark, tmp_path):
    """Pin BOTH null-emission predicates the stream_stream_full_outer
    oracle relies on. Purchase side: strictly below the watermark emits
    (the left-outer rule). View side: a view's last possible match is a
    purchase at view_ts + 1 h, so it null-emits iff
    view_ts + 1 h < watermark — crafted so one view lands exactly ON
    that boundary (02:00 + 1 h = 03:00 = wm) and must NOT emit."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from real_time_big_data_architect_spark.streaming import stateful as S

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: matched pair
        (1, 1, "view", base.replace(hour=0, minute=30)),
        (2, 1, "purchase", base.replace(hour=1)),
        # user 2: unmatched purchase far below wm -> null-view row
        (3, 2, "purchase", base.replace(hour=1)),
        # user 3: unmatched purchase AT wm (03:00) -> held in state
        (4, 3, "purchase", base.replace(hour=3)),
        # user 5: unmatched view far below (00:10 + 1h = 01:10 < 03:00)
        #         -> null-purchase row
        (8, 5, "view", base.replace(hour=0, minute=10)),
        # user 6: unmatched view AT the view boundary
        #         (02:00 + 1h = 03:00 = wm, not strictly below) -> held
        (9, 6, "view", base.replace(hour=2)),
        # tails on both sides: watermark = 03:10 - 10 min = 03:00
        (6, 8, "view", base.replace(hour=3, minute=10)),
        (7, 9, "purchase", base.replace(hour=3, minute=10)),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = S.stream_stream_full_outer(spark, str(tmp_path)).collect()
    matched = {
        (r.purchase_id, r.view_id)
        for r in out
        if r.view_id is not None and r.purchase_id is not None
    }
    null_view = {r.purchase_id for r in out if r.view_id is None}
    null_purchase = {r.view_id for r in out if r.purchase_id is None}
    assert matched == {(2, 1)}
    assert null_view == {3}
    assert null_purchase == {8}


def test_phash_all_identical_corpus_chain_guard(spark):
    """r7 verdict item 5: every doc in ONE bucket (all payloads
    byte-identical, population > LSH_BUCKET_CAP). The chain guard must
    (a) bound candidates by n·k instead of n²/2 and (b) keep the
    recall contract it documents — every doc still surfaces in at
    least one pair (all pairs Hamming 0 here)."""
    from real_time_big_data_architect_spark.operators import multimodal as M
    from real_time_big_data_architect_spark.operators.dedup import (
        LSH_BUCKET_CAP,
        LSH_CHAIN_NEIGHBORS,
    )

    n = LSH_BUCKET_CAP * 3  # decisively over the cap
    payload = b"identical media payload bytes!" * 4
    corpus = spark.createDataFrame(
        [(i, bytearray(payload)) for i in range(n)],
        "doc_id long, payload binary",
    )
    pairs = M.phash_dedup_pairs(corpus).collect()
    assert pairs, "no pairs from an all-identical corpus"
    # chain bound: each member chains to at most k neighbors per band,
    # pairs are deduped across the 4 bands
    assert len(pairs) <= n * LSH_CHAIN_NEIGHBORS
    assert all(p.hamming == 0 for p in pairs)
    # recall contract: no member is orphaned by the guard
    seen = {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    assert seen == set(range(n))


def test_phash_sub4byte_and_null_payloads(spark):
    """Boundary payloads (< 4 bytes, NULL) fold to sig 0 — the
    documented kernel rule — and pair only with each other."""
    from real_time_big_data_architect_spark.operators import multimodal as M

    corpus = spark.createDataFrame(
        [
            (0, bytearray(b"")),
            (1, bytearray(b"abc")),  # 3 bytes: no 4-gram window
            (2, None),
            (3, bytearray(b"a real payload with plenty of bytes" * 8)),
        ],
        "doc_id long, payload binary",
    )
    sigs = {r.doc_id: r.phash for r in M._phash_sigs(corpus).collect()}
    assert sigs[0] == 0 and sigs[1] == 0 and sigs[2] == 0
    assert sigs[3] != 0
    got = {
        (p.doc_a, p.doc_b) for p in M.phash_dedup_pairs(corpus).collect()
    }
    assert got == {(0, 1), (0, 2), (1, 2)}
