"""Round-4 operator invariants: Bloom join pruning, EWMA smoothing,
one-pass profiling, hard-negative mining, MAD outliers, bigram LM
scoring, vocabulary coverage, partition pruning, bucketed joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_architect_spark.operators import (
    joins,
    quality,
    sketches,
    similarity,
    text,
    windows,
)
from real_time_big_data_architect_spark.sources import lake
from real_time_big_data_architect_spark.streaming import stateful
from real_time_big_data_architect_spark.tables import load_table


def test_bloom_prune_sound_and_selective(spark, sf_medium):
    """The Bloom prune never drops a true match, and actually prunes."""
    o = load_table(spark, sf_medium, "orders")
    c = load_table(spark, sf_medium, "customer")
    n = load_table(spark, sf_medium, "nation")
    r = load_table(spark, sf_medium, "region")
    dim = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    keys = {row.c_custkey for row in dim.collect()}
    total = o.count()
    pruned = joins.bloom_prune(o, "o_custkey", dim, "c_custkey")
    pruned_rows = pruned.collect()
    true_matches = [row for row in o.collect() if row.o_custkey in keys]
    # sound: every true match survives
    surviving = {row.o_orderkey for row in pruned_rows}
    assert all(row.o_orderkey in surviving for row in true_matches)
    # selective: false-positive overhang is small (m=65536, k=3,
    # ~300 dim keys -> fp rate well under 1%)
    assert len(true_matches) <= len(pruned_rows) < total
    fp = len(pruned_rows) - len(true_matches)
    assert fp <= 0.01 * total


def test_bloom_join_prune_equals_plain_join(spark, sf_medium):
    got = {
        (r.o_orderpriority, r.n_orders, round(r.revenue, 2))
        for r in joins.bloom_join_prune(spark, sf_medium).collect()
    }
    o = load_table(spark, sf_medium, "orders")
    c = load_table(spark, sf_medium, "customer")
    n = load_table(spark, sf_medium, "nation")
    r = load_table(spark, sf_medium, "region")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
    want = {
        (r2.o_orderpriority, r2.n_orders, round(r2.revenue, 2))
        for r2 in plain.collect()
    }
    assert got == want


def test_ewma_hand_computed(spark, sf_small):
    rows = windows.ewma_smooth(spark, sf_small).collect()
    assert rows
    by_user: dict = {}
    ev = sorted(
        (
            r
            for r in load_table(spark, sf_small, "events").collect()
            if r.value is not None
        ),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.event_id, r.value))
    expect = {}
    for uid, seq in by_user.items():
        for t in range(len(seq)):
            num = den = 0.0
            for i in range(windows.EWMA_LAGS):
                if t - i < 0:
                    break
                num += windows._EWMA_W[i] * seq[t - i][1]
                den += windows._EWMA_W[i]
            expect[seq[t][0]] = num / den
    for r in rows:
        assert abs(r.ewma - expect[r.event_id]) < 1e-9
    # first event of a user: ewma == value exactly (single-term renorm)
    firsts = {seq[0][0] for seq in by_user.values()}
    for r in rows:
        if r.event_id in firsts:
            assert abs(r.ewma - r.value) < 1e-12


def test_profile_table_counts(spark, sf_small):
    prof = {r.column_name: r for r in sketches.profile_table(spark, sf_small).collect()}
    o = load_table(spark, sf_small, "orders")
    n = o.count()
    assert set(prof) == set(sketches._PROFILE_COLS)
    for c in sketches._PROFILE_COLS:
        row = prof[c]
        nn = o.filter(F.col(c).isNotNull()).count()
        nd = o.select(c).filter(F.col(c).isNotNull()).distinct().count()
        assert row.n_rows == n
        assert row.n_notnull == nn
        assert row.n_nulls == n - nn
        assert row.n_distinct == nd


def test_hard_negatives_label_disjoint_topk(spark, sf_small):
    rows = similarity.hard_negatives(spark, sf_small).collect()
    assert rows
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_small, "embeddings").collect()
    }
    import numpy as np

    embs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_small, "embeddings").collect()
    }
    per_q: dict = {}
    for r in rows:
        assert r.neg_label != r.query_label  # a negative, by label
        assert labels[r.vec_id] == r.neg_label
        assert labels[r.query_id] == r.query_label
        per_q.setdefault(r.query_id, []).append(r)
    for q, lst in per_q.items():
        lst.sort(key=lambda r: r.rn)
        assert [r.rn for r in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= similarity.HARD_NEG_K
        # scores are non-increasing in rank
        for a, b in zip(lst, lst[1:]):
            assert a.cosine >= b.cosine
        # each returned negative truly beats every non-returned
        # different-label vector (exactness of the top-k)
        q_emb = embs[q]
        qn = np.linalg.norm(q_emb)
        scored = sorted(
            (
                (float(embs[v] @ q_emb / (np.linalg.norm(embs[v]) * qn)), v)
                for v, lab in labels.items()
                if lab != labels[q]
            ),
            key=lambda t: (-t[0], t[1]),
        )
        want = [v for _, v in scored[: len(lst)]]
        assert [r.vec_id for r in lst] == want


def test_anomaly_mad_hand_check(spark, sf_small):
    import statistics

    rows = {r.event_type: r for r in quality.anomaly_mad(spark, sf_small).collect()}
    ev = [
        r
        for r in load_table(spark, sf_small, "events").collect()
        if r.value is not None
    ]
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    assert set(rows) == set(by_type)
    for t, vals in by_type.items():
        med = statistics.median(vals)
        mad = statistics.median(abs(v - med) for v in vals)
        n_out = sum(1 for v in vals if abs(v - med) > quality.MAD_K * mad)
        got = rows[t]
        assert got.n == len(vals)
        assert abs(got.median_value - med) < 1e-9
        assert abs(got.mad - mad) < 1e-9
        assert got.n_outliers == n_out


def test_bigram_lm_score_hand_check(spark, sf_small):
    from collections import Counter

    docs = load_table(spark, sf_small, "documents").collect()
    c_b: Counter = Counter()
    c_u: Counter = Counter()
    doc_bigrams = {}
    for d in docs:
        ws = d.text.split(" ")
        bgs = [(ws[i], ws[i + 1]) for i in range(len(ws) - 1)]
        doc_bigrams[d.doc_id] = bgs
        for b in bgs:
            c_b[b] += 1
            c_u[b[0]] += 1
    got = {r.doc_id: r for r in quality.bigram_lm_score(spark, sf_small).collect()}
    for doc_id, bgs in doc_bigrams.items():
        if not bgs:
            assert doc_id not in got
            continue
        score = sum(round(c_b[b] / c_u[b[0]], 12) for b in bgs) / len(bgs)
        assert got[doc_id].n_bigrams == len(bgs)
        assert abs(got[doc_id].lm_score - score) < 1e-9
    # discrimination: the scores are not all identical
    scores = {r.lm_score for r in got.values()}
    assert len(scores) > 1


def test_vocab_coverage_invariants(spark, sf_small):
    from collections import Counter

    docs = load_table(spark, sf_small, "documents").collect()
    wc: Counter = Counter()
    for d in docs:
        wc.update(d.text.split(" "))
    vocab = {
        w
        for w, _ in sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[
            : text.VOCAB_TOP
        ]
    }
    got = {r.doc_id: r for r in text.vocab_coverage(spark, sf_small).collect()}
    assert set(got) == {d.doc_id for d in docs}
    for d in docs:
        ws = d.text.split(" ")
        n_in = sum(1 for w in ws if w in vocab)
        r = got[d.doc_id]
        assert r.n_tokens == len(ws)
        assert r.n_in_vocab == n_in
        assert abs(r.oov_rate - (1.0 - n_in / len(ws))) < 1e-12
        assert 0.0 <= r.oov_rate <= 1.0


def test_partition_prune_plan_and_files(spark, sf_small, tmp_path):
    out = str(tmp_path / "events_p")
    ev = load_table(spark, sf_small, "events")
    lake.partitioned_write(ev, out, "event_type")
    import glob
    import os

    all_files = glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True)
    pruned = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "purchase" in plan
    # the scan's file listing covers only the purchase directory
    purchase_files = [p for p in all_files if "event_type=purchase" in p]
    assert purchase_files and len(purchase_files) < len(all_files)
    # pruned read returns exactly the purchase rows
    n_purchase = ev.filter(F.col("event_type") == "purchase").count()
    assert pruned.count() == n_purchase


def test_bucketed_join_no_exchange(spark, sf_small):
    try:
        lake.write_bucketed(
            spark,
            load_table(spark, sf_small, "orders"),
            "o_custkey",
            "orders_bkt",
        )
        lake.write_bucketed(
            spark,
            load_table(spark, sf_small, "customer"),
            "c_custkey",
            "customer_bkt",
        )
        joined = lake.colocated_join(spark)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no pre-join shuffle
        assert "selectedBucketsCount" in plan or "Bucketed: true" in plan
        # and the join is still correct
        o = load_table(spark, sf_small, "orders")
        c = load_table(spark, sf_small, "customer")
        want = o.join(c, o.o_custkey == c.c_custkey).count()
        assert joined.count() == want
    finally:
        for t in ("orders_bkt", "customer_bkt"):
            lake._drop_table_and_location(spark, t)


def test_stream_pattern_cep_matches_python_replay(spark, sf_small):
    """The streaming CEP machine equals a sequential replay of the same
    state machine over the batch fixture in event-time order."""
    # NOTE: stateful is imported at module top — its protobuf/PYTHONPATH
    # probe must run BEFORE the session fixture launches the JVM, or the
    # TWS state-server worker can't import the processor class
    import pytest

    if not stateful.TWS_AVAILABLE:
        pytest.skip("transformWithStateInPandas unavailable")
    got = sorted(
        (r.user_id, round(r.started_ts_s, 6), round(r.completed_ts_s, 6))
        for r in stateful.stream_pattern_cep(spark, sf_small).collect()
    )
    ev = sorted(
        load_table(spark, sf_small, "events").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    want = []
    state: dict = {}
    for r in ev:
        stage, started = state.get(r.user_id, (0, 0.0))
        t = r.ts.timestamp()
        if stage > 0 and t - started > stateful.CEP_WINDOW_S:
            stage = 0
        if r.event_type == stateful.CEP_STEPS[stage]:
            if stage == 0:
                started = t
            stage += 1
            if stage == len(stateful.CEP_STEPS):
                want.append((r.user_id, round(started, 6), round(t, 6)))
                stage = 0
        state[r.user_id] = (stage, started)
    assert got == sorted(want)
    assert got  # the fixture actually produces matches
    # durations honor the pattern window
    for _, s, c in got:
        assert 0.0 <= c - s <= stateful.CEP_WINDOW_S


def test_curation_score_deciles(spark, sf_small):
    from real_time_big_data_architect_spark.operators import curation

    rows = curation.curation_score(spark, sf_small).collect()
    n = len(rows)
    assert n > 0
    from collections import Counter

    sizes = Counter(r.decile for r in rows)
    assert set(sizes) == set(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1  # NTILE balance
    for r in rows:
        assert 0.0 <= r.score <= 1.0 + 1e-12
    # decile ordering respects score ordering
    by_decile = sorted(rows, key=lambda r: (r.decile, -r.score))
    for a, b in zip(by_decile, by_decile[1:]):
        if a.decile < b.decile:
            assert a.score >= b.score - 1e-12


def test_stream_pattern_cep_eventtime_out_of_order(
    spark, sf_small, tmp_path_factory
):
    """Cross-batch event-time disorder BOUNDED WITHIN the watermark
    delay must not change the event-time CEP's match set. Layout:
    file0 = events up to a cut point minus a planted subset S drawn
    from the last 6 days before the cut; file1 = S (arrives second:
    each S event is older than file0 events already seen, but still
    ABOVE the watermark max(file0)−7d, i.e. genuinely out of order yet
    not late); file2 = the post-cut tail, which advances the watermark
    so the machine must interleave S back into event-time order. The
    match set must equal the replay over the watermark-closed ordered
    prefix."""
    import os

    import pytest

    if not stateful.TWS_AVAILABLE:
        pytest.skip("transformWithStateInPandas unavailable")
    import pandas as pd
    import pyarrow.parquet as pq

    delay_s = 7 * 86400
    df = (
        pq.read_table(os.path.join(sf_small, "events.parquet"))
        .to_pandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    tmax = df["ts"].max()
    cut = tmax - pd.Timedelta(days=10)
    head = df[df["ts"] <= cut]
    tail = df[df["ts"] > cut]
    late_zone = head[head["ts"] > cut - pd.Timedelta(days=6)]
    s_mask = late_zone.index[1::2]  # every 2nd late-zone event -> S
    s_part = head.loc[s_mask]
    file0 = head.drop(index=s_mask)
    assert len(s_part) > 0 and len(tail) > 0
    # S really is out of order on arrival: older than data already seen
    assert s_part["ts"].min() < file0["ts"].max()
    # ...but within the delay: above the batch-1 watermark
    wm1 = file0["ts"].max() - pd.Timedelta(seconds=delay_s)
    assert s_part["ts"].min() > wm1

    d = tmp_path_factory.mktemp("ooo_events")
    for i, part in enumerate((file0, s_part, tail)):
        part.to_parquet(str(d / f"events{i}.parquet"), index=False)
    now = os.path.getmtime(str(d / "events2.parquet"))
    for i, age in ((0, 200), (1, 100)):
        os.utime(str(d / f"events{i}.parquet"), (now - age, now - age))

    got = sorted(
        (r.user_id, int(r.started_ts_s * 1000), int(r.completed_ts_s * 1000))
        for r in stateful.stream_pattern_cep_eventtime(
            spark, str(d), watermark_delay=f"{delay_s} seconds"
        ).collect()
    )
    # replay: the machine over the event-time-ordered prefix the final
    # watermark closed (floor-ms semantics, matching Spark's wm math)
    ev = sorted(
        load_table(spark, sf_small, "events").collect(),
        key=lambda r: (r.ts, r.event_id),
    )
    max_ms = max(int(r.ts.timestamp() * 1000) for r in ev)
    wm_ms = max_ms - delay_s * 1000
    win_ms = int(stateful.CEP_WINDOW_S * 1000)
    want = []
    by_user: dict = {}
    for r in ev:
        if int(r.ts.timestamp() * 1000) <= wm_ms:
            by_user.setdefault(r.user_id, []).append(r)
    for uid, rows_u in by_user.items():
        stage, started = 0, 0
        for r in rows_u:
            t = int(r.ts.timestamp() * 1000)
            if stage > 0 and t - started > win_ms:
                stage = 0
            if r.event_type == stateful.CEP_STEPS[stage]:
                if stage == 0:
                    started = t
                stage += 1
                if stage == len(stateful.CEP_STEPS):
                    want.append((uid, started, t))
                    stage = 0
    assert got == sorted(want)
    assert got  # disorder inside the delay: matches still found
    # and the planted subset mattered: dropping S from the replay
    # changes the match set (so reordered consumption was exercised)
    s_ids = set(s_part["event_id"])
    want_wo_s = []
    for uid, rows_u in by_user.items():
        stage, started = 0, 0
        for r in rows_u:
            if r.event_id in s_ids:
                continue
            t = int(r.ts.timestamp() * 1000)
            if stage > 0 and t - started > win_ms:
                stage = 0
            if r.event_type == stateful.CEP_STEPS[stage]:
                if stage == 0:
                    started = t
                stage += 1
                if stage == len(stateful.CEP_STEPS):
                    want_wo_s.append((uid, started, t))
                    stage = 0
    assert sorted(want_wo_s) != sorted(want)


def test_cdc_diff_invariants(spark, sf_small):
    from real_time_big_data_architect_spark.operators import mutations as mu

    rows = mu.cdc_diff(spark, sf_small).collect()
    assert rows
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.change_type, []).append(r)
    assert set(by_type) == {
        "insert", "delete", "update_preimage", "update_postimage"
    }
    # pre/post images pair exactly on keys
    pre = {r.o_orderkey for r in by_type["update_preimage"]}
    post = {r.o_orderkey for r in by_type["update_postimage"]}
    assert pre == post
    # applying the feed to v1 reproduces v2 key membership
    v1 = {
        r.o_orderkey
        for r in load_table(spark, sf_small, "orders").collect()
    }
    inserted = {r.o_orderkey for r in by_type["insert"]}
    deleted = {r.o_orderkey for r in by_type["delete"]}
    assert inserted.isdisjoint(v1)
    assert deleted <= v1 and pre <= v1
    # every update really changed something
    pre_map = {r.o_orderkey: r for r in by_type["update_preimage"]}
    for r in by_type["update_postimage"]:
        p = pre_map[r.o_orderkey]
        assert (p.o_orderstatus, p.o_totalprice) != (
            r.o_orderstatus,
            r.o_totalprice,
        )


def test_grouped_map_ols_matches_numpy(spark, sf_small):
    import numpy as np

    from real_time_big_data_architect_spark.operators import udfs

    got = {r.event_type: r for r in udfs.grouped_map_ols(spark, sf_small).collect()}
    ev = [
        r
        for r in load_table(spark, sf_small, "events").collect()
        if r.value is not None
    ]
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r)
    assert set(got) == set(by_type)
    for t, rows_t in by_type.items():
        x = np.array(
            [r.ts.timestamp() * 1e6 - udfs._OLS_X0_US for r in rows_t]
        )
        y = np.array([round(r.value * 10000) for r in rows_t], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        assert got[t].n_rows == len(rows_t)
        # numpy float path vs the exact-integer path: tolerance check
        assert abs(got[t].slope - slope) < 1e-6 * max(1.0, abs(slope))
        assert abs(got[t].intercept - intercept) < 1e-3 * max(
            1.0, abs(intercept)
        )


def test_decile_cutpoints_consistency(spark, sf_small):
    from real_time_big_data_architect_spark.operators import curation

    rows = curation.decile_cutpoints(spark, sf_small).collect()
    assert rows
    import statistics

    scores = sorted(r.score for r in rows)
    cuts = statistics.quantiles(scores, n=10, method="inclusive")
    for r in rows:
        want = 1 + sum(1 for c in cuts if r.score > c)
        assert r.decile == want, (r.doc_id, r.decile, want)
    # deciles roughly balanced (cut-point assignment; ties may skew)
    from collections import Counter

    sizes = Counter(r.decile for r in rows)
    assert set(sizes) == set(range(1, 11))
    assert max(sizes.values()) <= 2 * (len(rows) // 10 + 1)


def test_ols_kernel_degenerate_group_yields_null():
    import pandas as pd

    from real_time_big_data_architect_spark.operators import udfs

    one = pd.DataFrame(
        {
            "event_type": ["view"],
            "ts": [pd.Timestamp("2024-01-01 00:00:00")],
            "value": [42.0],
        }
    )
    out = udfs._ols_kernel(one)
    assert out["n_rows"].iloc[0] == 1
    assert out["slope"].iloc[0] is None and out["intercept"].iloc[0] is None
    # identical timestamps across rows: same degenerate denominator
    same_ts = pd.concat([one, one], ignore_index=True)
    out2 = udfs._ols_kernel(same_ts)
    assert out2["slope"].iloc[0] is None


def test_interval_merge_islands_disjoint_and_complete(spark, sf_small):
    """Merged islands are per-user disjoint, gap-separated, and
    partition every event; a Python sweep replays one user exactly."""
    got = windows.interval_merge(spark, sf_small).collect()
    ev = load_table(spark, sf_small, "events")
    per_user_events = {
        r.user_id: r.n for r in ev.groupBy("user_id").agg(
            F.count("*").alias("n")).collect()
    }
    by_user: dict[int, list] = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == set(per_user_events)
    for uid, islands in by_user.items():
        islands.sort(key=lambda r: r.island_start)
        assert sum(r.n_events for r in islands) == per_user_events[uid]
        for r in islands:
            assert r.island_end > r.island_start
        for a, b in zip(islands, islands[1:]):
            # strictly separated: next island starts after this one ends
            assert b.island_start > a.island_end
    # replay the busiest user with a plain sweep
    uid = max(per_user_events, key=per_user_events.get)
    ts = sorted(
        r.ts for r in ev.filter(F.col("user_id") == uid).collect()
    )
    from datetime import timedelta

    gap = timedelta(minutes=windows.MERGE_GAP_MINUTES)
    expect = []
    cur_start, cur_end, n = ts[0], ts[0] + gap, 1
    for t in ts[1:]:
        if t > cur_end:
            expect.append((cur_start, cur_end, n))
            cur_start, cur_end, n = t, t + gap, 1
        else:
            cur_end, n = max(cur_end, t + gap), n + 1
    expect.append((cur_start, cur_end, n))
    got_u = sorted(
        (r.island_start, r.island_end, r.n_events) for r in by_user[uid]
    )
    assert got_u == sorted(expect)


def test_gapfill_interp_matches_linear_formula(spark, sf_small):
    """Observed hours keep their value; filled hours sit exactly on the
    line between bracketing observations (replayed in Python)."""
    out = windows.gapfill_interp(spark, sf_small).collect()
    ev = load_table(spark, sf_small, "events")
    hourly = {
        (r.event_type, r.hour): r.s
        for r in ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(F.sum("value").alias("s"))
        .collect()
    }
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rows in by_type.items():
        rows.sort(key=lambda r: r.hour)
        obs = [
            (i, r.hour, hourly[(et, r.hour)])
            for i, r in enumerate(rows)
            if (et, r.hour) in hourly and hourly[(et, r.hour)] is not None
        ]
        obs_idx = {i for i, _, _ in obs}
        for i, r in enumerate(rows):
            if i in obs_idx:
                if hourly[(et, r.hour)] is not None:
                    assert abs(r.interp_value - hourly[(et, r.hour)]) < 1e-6
                continue
            prev = max((o for o in obs if o[0] < i), default=None)
            nxt = min((o for o in obs if o[0] > i), default=None)
            if prev is None:
                assert abs(r.interp_value - nxt[2]) < 1e-6
            elif nxt is None:
                assert abs(r.interp_value - prev[2]) < 1e-6
            else:
                frac = (i - prev[0]) / (nxt[0] - prev[0])
                want = prev[2] + (nxt[2] - prev[2]) * frac
                assert abs(r.interp_value - want) < 1e-6


def test_collocations_lift_brute_force(spark, sf_small):
    """Counts and lift match a brute-force Python bigram count."""
    from collections import Counter

    docs = [
        r.text
        for r in load_table(spark, sf_small, "documents").collect()
    ]
    uni: Counter = Counter()
    big: Counter = Counter()
    for t in docs:
        ws = t.split(" ")
        uni.update(w for w in ws if w != "")
        big.update(
            (a, b) for a, b in zip(ws, ws[1:]) if a != "" and b != ""
        )
    ut, bt = sum(uni.values()), sum(big.values())
    got = text.collocations_lift(spark, sf_small).collect()
    expect = {k: c for k, c in big.items() if c >= text.COLLOC_MIN_COUNT}
    assert {(r.w1, r.w2) for r in got} == set(expect)
    for r in got:
        assert r.c_ab == expect[(r.w1, r.w2)]
        assert r.c_a == uni[r.w1] and r.c_b == uni[r.w2]
        want = (r.c_ab / bt) / ((r.c_a / ut) * (r.c_b / ut))
        assert abs(r.lift - want) < 1e-9
    # the top pair sits above independence (the synthetic corpus is
    # near-uniform, so lift stays modest — the invariant is > 1)
    assert max(r.lift for r in got) > 1


def test_audience_overlap_brute_force(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    aud: dict[str, set] = {}
    for r in ev.select("event_type", "user_id").distinct().collect():
        aud.setdefault(r.event_type, set()).add(r.user_id)
    from real_time_big_data_architect_spark.operators import behavioral

    got = behavioral.audience_overlap(spark, sf_small).collect()
    types = sorted(aud)
    expect_pairs = {
        (a, b)
        for i, a in enumerate(types)
        for b in types[i + 1 :]
        if aud[a] & aud[b]
    }
    assert {(r.type_a, r.type_b) for r in got} == expect_pairs
    for r in got:
        inter = len(aud[r.type_a] & aud[r.type_b])
        union = len(aud[r.type_a] | aud[r.type_b])
        assert r.n_shared == inter
        assert r.n_a == len(aud[r.type_a]) and r.n_b == len(aud[r.type_b])
        assert abs(r.jaccard - inter / union) < 1e-12


def test_sample_weighted_membership_and_determinism(spark, sf_small):
    """Inclusion follows the integer coin; long docs always kept;
    two runs agree row-for-row."""
    import hashlib

    from real_time_big_data_architect_spark.operators import curation

    docs = load_table(spark, sf_small, "documents").collect()
    expect = set()
    for r in docs:
        u = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
        if u * curation.SAMPLE_FULL_CHARS < r.n_chars * (1 << 32):
            expect.add(r.doc_id)
    got1 = {r.doc_id for r in curation.sample_weighted(spark, sf_small).collect()}
    got2 = {r.doc_id for r in curation.sample_weighted(spark, sf_small).collect()}
    assert got1 == expect and got2 == expect
    # every doc at/above the full-keep length is present
    for r in docs:
        if r.n_chars >= curation.SAMPLE_FULL_CHARS:
            assert r.doc_id in got1


def test_grid_radius_join_equals_brute_force(spark, sf_small):
    """Grid bin-and-verify finds exactly the brute-force pair set."""
    from real_time_big_data_architect_spark.operators import joins as J

    pts = {r.user_id: (r.x, r.y) for r in J._geo_points(spark, sf_small).collect()}
    ids = sorted(pts)
    brute = set()
    for i, a in enumerate(ids):
        xa, ya = pts[a]
        for b in ids[i + 1 :]:
            xb, yb = pts[b]
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= J.GEO_RADIUS**2:
                brute.add((a, b))
    got = J.grid_radius_join(spark, sf_small).collect()
    assert {(r.user_a, r.user_b) for r in got} == brute
    for r in got:
        xa, ya = pts[r.user_a]
        xb, yb = pts[r.user_b]
        assert abs(r.dist - ((xa - xb) ** 2 + (ya - yb) ** 2) ** 0.5) < 1e-9


def test_pareto_frontier_brute_force(spark, sf_small):
    from real_time_big_data_architect_spark.operators import relational

    parts = [
        (r.p_partkey, float(r.p_retailprice), r.p_size)
        for r in load_table(spark, sf_small, "part").collect()
    ]
    brute = {
        k
        for k, pr, sz in parts
        if not any(
            pr2 <= pr and sz2 >= sz and (pr2 < pr or sz2 > sz)
            for _, pr2, sz2 in parts
        )
    }
    got = {r.p_partkey for r in relational.pareto_frontier(spark, sf_small).collect()}
    assert got == brute and got


def test_period_over_period_hand_check(spark, sf_small):
    from collections import defaultdict

    from real_time_big_data_architect_spark.operators import aggregates

    o = load_table(spark, sf_small, "orders").collect()
    seg = {
        r.c_custkey: r.c_mktsegment
        for r in load_table(spark, sf_small, "customer").collect()
    }
    monthly = defaultdict(float)
    counts = defaultdict(int)
    for r in o:
        key = (seg[r.o_custkey], (r.o_orderdate.year, r.o_orderdate.month))
        monthly[key] += float(r.o_totalprice)
        counts[key] += 1
    got = aggregates.period_over_period(spark, sf_small).collect()
    assert len(got) == len(monthly)
    by_seg = {}
    for r in got:
        k = (r.c_mktsegment, (r.month.year, r.month.month))
        assert abs(r.revenue - monthly[k]) < 1e-6
        assert r.n_orders == counts[k]
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    for rows in by_seg.values():
        rows.sort(key=lambda r: r.month)
        assert rows[0].prev_revenue is None and rows[0].mom_pct is None
        for a, b in zip(rows, rows[1:]):
            assert abs(b.prev_revenue - a.revenue) < 1e-9
            assert abs(b.mom_pct - (b.revenue - a.revenue) / a.revenue) < 1e-12


def test_record_linkage_resolves_every_record_to_itself(spark, sf_small):
    """The planted one-char corruption must link back to its own master
    row (lev exactly 1), for every customer."""
    got = joins.record_linkage(spark, sf_small).collect()
    n = load_table(spark, sf_small, "customer").count()
    assert len(got) == n
    for r in got:
        assert r.c_custkey == r.d_key
        assert r.lev == 1
        assert "x" in r.d_name and r.d_name != r.c_name


def test_batch_cep_pattern_python_replay(spark, sf_small):
    """Regex conversion counting matches a Python scan of each user's
    time-ordered history."""
    import re as _re

    from real_time_big_data_architect_spark.operators import behavioral

    ev = sorted(
        load_table(spark, sf_small, "events").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    seqs: dict[int, str] = {}
    for r in ev:
        seqs[r.user_id] = seqs.get(r.user_id, "") + r.event_type[0]
    got = {r.user_id: r for r in behavioral.batch_cep_pattern(spark, sf_small).collect()}
    assert set(got) == set(seqs)
    for uid, seq in seqs.items():
        assert got[uid].n_events == len(seq)
        assert got[uid].n_conversions == len(_re.findall("vcp", seq))
    assert sum(r.n_conversions for r in got.values()) > 0


def test_dedup_url_canonical_collapses_variants(spark, sf_small):
    """All planted variants of one logical page collapse to a single
    https, lowercase, param- and fragment-free canonical URL."""
    from real_time_big_data_architect_spark.operators import dedup

    docs = load_table(spark, sf_small, "documents").collect()
    expect: dict[str, list] = {}
    for r in docs:
        page = r.doc_id // 4
        canon = f"https://site{page % 50}.example.com/p/{page}"
        expect.setdefault(canon, []).append(r.doc_id)
    got = dedup.dedup_url_canonical(spark, sf_small).collect()
    assert {r.canonical_url for r in got} == set(expect)
    for r in got:
        assert r.n_variants == len(expect[r.canonical_url])
        assert r.survivor_doc_id == min(expect[r.canonical_url])
        assert "utm" not in r.canonical_url and "#" not in r.canonical_url
        assert r.canonical_url == r.canonical_url.lower()
        assert r.canonical_url.startswith("https://")
    # the plant really produced mergeable mess: some page has >1 variant
    assert max(r.n_variants for r in got) > 1


def test_phrase_merges_python_replay(spark, sf_small):
    """Two merge rounds match a Python replay: same argmax pairs, same
    rewritten texts, same token counts."""
    import re as _re
    from collections import Counter

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_small, "documents").collect()
    }
    word_ok = _re.compile(r"^[a-z0-9]+$")

    def one_round(ts):
        cnt = Counter()
        for t in ts.values():
            ws = t.split(" ")
            for a, b in zip(ws, ws[1:]):
                if word_ok.match(a) and word_ok.match(b):
                    cnt[(a, b)] += 1
        (w1, w2), _ = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        pat, rep = f" {w1} {w2} ", f" {w1}_{w2} "
        out = {}
        for k, t in ts.items():
            p = f" {t} "
            p = p.replace(pat, rep).replace(pat, rep)
            out[k] = p.strip()
        return out, f"{w1} {w2}"

    r1, p1 = one_round(texts)
    r2, p2 = one_round(r1)
    got = {r.doc_id: r for r in text.phrase_merges(spark, sf_small).collect()}
    assert set(got) == set(texts)
    for k, r in got.items():
        assert r.phrase_1 == p1 and r.phrase_2 == p2
        assert r.n_tokens_before == len(texts[k].split(" "))
        assert r.n_tokens_after == len(r2[k].split(" "))
    # merging really shrank the corpus
    assert sum(r.n_tokens_after for r in got.values()) < sum(
        r.n_tokens_before for r in got.values()
    )


def test_join_null_safe_null_bucket(spark, sf_small):
    """NULL keys land in bucket_null; non-null keys match their bucket;
    every event appears exactly once."""
    ev = load_table(spark, sf_small, "events").collect()
    got = {r.event_id: r for r in joins.join_null_safe(spark, sf_small).collect()}
    assert set(got) == {r.event_id for r in ev}
    import json as _json

    for r in ev:
        g = got[r.event_id]
        if r.event_id % 7 == 0:
            k = _json.loads(r.props)["k"] % 5
            assert g.k == k and g.label == f"bucket_{k}"
        else:
            assert g.k is None and g.label == "bucket_null"


def test_asof_nearest_python_replay(spark, sf_small):
    """The two-frame nearest pick equals a per-user brute-force nearest
    view (backward tiebreak on equal gaps)."""
    ev = load_table(spark, sf_small, "events").collect()
    views: dict = {}
    for r in ev:
        if r.event_type == "view":
            key = (r.user_id, r.ts)
            views.setdefault(r.user_id, {})
            cur = views[r.user_id].get(r.ts)
            views[r.user_id][r.ts] = max(cur or 0, r.event_id)
    got = {r.event_id: r for r in joins.asof_nearest(spark, sf_small).collect()}
    purchases = [r for r in ev if r.event_type == "purchase"]
    assert set(got) == {p.event_id for p in purchases}
    for p in purchases:
        vs = views.get(p.user_id)
        g = got[p.event_id]
        if not vs:
            assert g.view_event_id is None
            continue
        best = min(
            vs.items(),
            key=lambda kv: (
                abs((kv[0] - p.ts).total_seconds()),
                kv[0] > p.ts,  # backward wins ties
            ),
        )
        assert g.view_event_id == vs[best[0]]
        want_gap = (p.ts - best[0]).total_seconds() * 1e6
        assert abs(g.signed_gap_us - round(want_gap)) <= 1


def test_date_dim_build_calendar_invariants(spark, sf_small):
    """Continuous day spine; attributes agree with Python's calendar."""
    import datetime as dt

    from real_time_big_data_architect_spark.operators import scalars as SC

    rows = sorted(
        SC.date_dim_build(spark, sf_small).collect(),
        key=lambda r: r.date_day,
    )
    days = [r.date_day for r in rows]
    for a, b in zip(days, days[1:]):
        assert b - a == dt.timedelta(days=1)
    for r in rows:
        d = r.date_day
        iso = d.isocalendar()
        assert r.year == d.year and r.month == d.month
        assert r.quarter == (d.month - 1) // 3 + 1
        assert r.iso_week == iso[1] and r.iso_dow == iso[2]
        assert r.is_weekend == (iso[2] >= 6)
        assert r.is_month_start == (d.day == 1)
        nxt = d + dt.timedelta(days=1)
        assert r.is_month_end == (nxt.month != d.month)


def test_tz_normalize_offsets(spark, sf_small):
    """NY offset is -4/-5 h (DST-dependent), Tokyo +9 always."""
    import datetime as dt

    from real_time_big_data_architect_spark.operators import scalars as SC

    rows = SC.tz_normalize(spark, sf_small).collect()
    assert rows
    for r in rows:
        ny_off = (r.ny_ts - r.ts).total_seconds() / 3600
        tk_off = (r.tokyo_ts - r.ts).total_seconds() / 3600
        assert ny_off in (-4.0, -5.0)
        assert tk_off == 9.0
        assert r.ny_hour == r.ny_ts.hour


def test_weighted_median_python_replay(spark, sf_small):
    from real_time_big_data_architect_spark.operators import aggregates as AG

    ev = [
        r
        for r in load_table(spark, sf_small, "events").collect()
        if r.value is not None
    ]
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append((r.value, r.event_id))
    got = {r.event_type: r for r in AG.weighted_median(spark, sf_small).collect()}
    assert set(got) == set(by_type)
    for et, vals in by_type.items():
        vals.sort()
        tot = sum(abs(v) for v, _ in vals)
        cum = 0.0
        med = None
        for v, _ in vals:
            cum += abs(v)
            if cum * 2 >= tot:
                med = v
                break
        assert abs(got[et].weighted_median - med) < 1e-9
        assert abs(got[et].total_weight - tot) < 1e-6


def test_auc_rank_matches_sklearn_free_auc(spark, sf_small):
    """Exact rank-sum AUC equals a Python Mann-Whitney computation and
    sits in [0, 1]; flipping labels complements it."""
    from real_time_big_data_architect_spark.operators import aggregates as AG
    from real_time_big_data_architect_spark.operators.similarity import (
        _PROJ_COEFS,
    )

    rows = load_table(spark, sf_small, "embeddings").collect()
    scored = sorted(
        (
            (
                sum(float(x) * c for x, c in zip(r.embedding, _PROJ_COEFS)),
                r.vec_id,
                r.label % 2 == 0,
            )
            for r in rows
        )
    )
    rank_sum = sum(i + 1 for i, (_, _, pos) in enumerate(scored) if pos)
    n_pos = sum(1 for _, _, p in scored if p)
    n_neg = len(scored) - n_pos
    want = (rank_sum - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    got = AG.auc_rank(spark, sf_small).collect()[0]
    assert got.n_pos == n_pos and got.n_neg == n_neg
    assert abs(got.auc - want) < 1e-12
    assert 0.0 <= got.auc <= 1.0


def test_mask_native_structure(spark, sf_small):
    from real_time_big_data_architect_spark.operators import scalars as SC

    rows = SC.mask_native(spark, sf_small).collect()
    assert rows
    for r in rows:
        # masked text has identical length and only X/x/n + punctuation
        assert len(r.name_masked) > 0
        assert all(c in "Xxn" or not c.isalnum() for c in r.name_masked)
        assert all(c in "Xxn" or not c.isalnum() for c in r.segment_masked)
    # at least one row masks a digit (customer names carry key digits)
    assert any("n" in r.name_masked for r in rows)


def test_try_arith_null_semantics(spark, sf_small):
    from real_time_big_data_architect_spark.operators import scalars as SC

    rows = SC.try_arith(spark, sf_small).collect()
    assert rows
    saw_overflow = saw_exact = False
    for r in rows:
        # r7: overflow hits every 5th key (rare-bad-row shape); other
        # rows carry the exact x1000 product
        if r.o_orderkey % 5 != 0:
            assert r.overflow_product == (r.o_orderkey + 1) * 1000
            saw_exact = True
        elif r.o_orderkey == 0:
            assert r.overflow_product == SC._I64_MAX
        else:
            assert r.overflow_product is None  # overflow -> NULL, no error
            saw_overflow = True
        if r.denom_was_zero:
            assert r.risky_ratio is None  # /0 -> NULL, no error
        else:
            assert r.risky_ratio is not None
        assert r.safe_next == r.o_orderkey + 1
    assert saw_overflow and saw_exact  # both row classes exercised
