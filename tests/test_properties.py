"""Property-style invariants over the fixture tables (SURVEY §5.2 item 5).

Cheap cross-operator consistency checks: rollup subtotals reconcile to
the grand total, UNION ALL counts add, top-k is a prefix of the full
sort, pivot cells sum to group counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_architect_spark.operators import (
    aggregates,
    relational,
    setops,
    windows,
)
from real_time_big_data_architect_spark.tables import load_table


def test_rollup_subtotals_reconcile(spark, sf_small):
    out = aggregates.rollup_agg(spark, sf_small).collect()
    grand = [r for r in out if r.l_returnflag is None and r.l_linestatus is None]
    leaves = [r for r in out if r.l_returnflag is not None and r.l_linestatus is not None]
    subtotals = [r for r in out if r.l_returnflag is not None and r.l_linestatus is None]
    assert len(grand) == 1
    assert grand[0].n_rows == sum(r.n_rows for r in leaves)
    assert abs(grand[0].sum_qty - sum(r.sum_qty for r in leaves)) < 1e-6
    # each flag's subtotal equals the sum of its leaves
    for s in subtotals:
        mine = [r for r in leaves if r.l_returnflag == s.l_returnflag]
        assert s.n_rows == sum(r.n_rows for r in mine)


def test_cube_contains_all_grouping_sets(spark, sf_small):
    out = aggregates.cube_agg(spark, sf_small).collect()
    o = load_table(spark, sf_small, "orders")
    total = o.count()
    grand = [r for r in out if r.o_orderstatus is None and r.o_orderpriority is None]
    assert len(grand) == 1 and grand[0].n_orders == total
    # status-only marginals sum to total
    status_only = [r for r in out if r.o_orderstatus is not None and r.o_orderpriority is None]
    assert sum(r.n_orders for r in status_only) == total


def test_union_all_count_is_sum(spark, sf_small):
    n_union_all = setops.set_union_all(spark, sf_small).count()
    n_union = setops.set_union(spark, sf_small).count()
    assert n_union <= n_union_all  # dedup can only shrink


def test_pivot_cells_sum_to_group_count(spark, sf_small):
    piv = aggregates.pivot_agg(spark, sf_small).collect()
    li = load_table(spark, sf_small, "lineitem")
    per_flag = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    for r in piv:
        assert r.n_open + r.n_finished == per_flag[r.l_returnflag]


def test_topk_is_prefix_of_full_sort(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    full = [
        r.event_id
        for r in ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .select("event_id")
        .collect()
    ]
    tail30 = [r.event_id for r in relational.lastk_tail(spark, sf_small).collect()]
    assert tail30 == full[:30]


def test_window_rank_one_per_group_at_rank1(spark, sf_small):
    ranked = windows.topk_per_group(spark, sf_small)
    rank_col = next(c for c in ("rn", "rnk", "rank") if c in ranked.columns)
    grp = next(c for c in ("o_custkey", "c_custkey") if c in ranked.columns)
    top1 = ranked.filter(F.col(rank_col) == 1).groupBy(grp).count().collect()
    assert all(r["count"] == 1 for r in top1)


def test_distinct_le_total(spark, sf_small):
    out = aggregates.distinct_count(spark, sf_small).collect()
    assert all(r.n_users <= r.n_events for r in out)


def test_percentiles_ordered_and_approx_close(spark, sf_small):
    exact = {r.event_type: (r.p25, r.p50, r.p90) for r in aggregates.percentile_agg(spark, sf_small).collect()}
    for p25, p50, p90 in exact.values():
        assert p25 <= p50 <= p90
    approx = {r.event_type: (r.p50_rank_ok, r.p95_rank_ok) for r in aggregates.approx_quantiles(spark, sf_small).collect()}
    assert approx.keys() == exact.keys()
    for et, (ok50, ok95) in approx.items():
        assert ok50 and ok95, f"{et}: GK sketch rank guarantee violated"


def test_range_frame_matches_python_recompute(spark, sf_small):
    out = windows.window_range_frame(spark, sf_small)
    uid = out.first().user_id
    rows = sorted(
        load_table(spark, sf_small, "events").filter(F.col("user_id") == uid).collect(),
        key=lambda r: r.ts,
    )
    got = {r.event_id: r.trailing_1h_value
           for r in out.filter(F.col("user_id") == uid).collect()}
    import datetime
    for r in rows:
        window = [x.value for x in rows
                  if x.value is not None
                  and r.ts - datetime.timedelta(hours=1) <= x.ts <= r.ts]
        want = round(sum(window), 4) if window else None
        have = got[r.event_id]
        assert (have is None and want is None) or abs(have - want) < 1e-6


def test_lang_id_outputs_valid_profiles(spark, sf_small):
    from real_time_big_data_architect_spark.operators import text as text_ops

    out = text_ops.lang_id(spark, sf_small).collect()
    valid = set(text_ops._LANG_PROFILES)
    assert all(r.detected_lang in valid for r in out)


def test_sql_surface_over_registered_views(spark, sf_small):
    """The SQL API works over the registered catalog: spark.sql answers
    must match the DataFrame API on the same session."""
    from real_time_big_data_architect_spark.tables import register_views

    register_views(spark, sf_small)
    via_sql = spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).collect()
    via_df = (
        load_table(spark, sf_small, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .orderBy("l_returnflag")
        .collect()
    )
    assert [tuple(r) for r in via_sql] == [tuple(r) for r in via_df]
    # joins work across registered views too
    n = spark.sql(
        "SELECT COUNT(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
    ).collect()[0][0]
    assert n == load_table(spark, sf_small, "orders").count()


def test_time_rollup_levels_reconcile(spark, sf_small):
    """Hour rows sum to their day row; day rows sum to the grand total."""
    from real_time_big_data_architect_spark.operators.aggregates import (
        rollup_time_hierarchy,
    )

    rows = rollup_time_hierarchy(spark, sf_small).collect()
    hours = [(r.day, r.hour, r.n_events) for r in rows if r.hour is not None]
    days = {r.day: r.n_events for r in rows if r.hour is None and r.day is not None}
    total = [r.n_events for r in rows if r.day is None and r.hour is None]
    assert len(total) == 1
    by_day = {}
    for d, _, n in hours:
        by_day[d] = by_day.get(d, 0) + n
    assert by_day == days
    assert sum(days.values()) == total[0]


def test_range_join_banded_equals_naive(spark, sf_small):
    """The bucket-banded plan must reproduce the naive range join."""
    from real_time_big_data_architect_spark.operators.joins import (
        PRICE_BAND,
        range_join_banded,
    )

    got = {
        (r.a_key, r.b_key) for r in range_join_banded(spark, sf_small).collect()
    }
    parts = [
        (r.p_partkey, r.p_retailprice)
        for r in load_table(spark, sf_small, "part").collect()
    ]
    want = {
        (ka, kb)
        for ka, pa in parts
        for kb, pb in parts
        if ka < kb and abs(pa - pb) <= PRICE_BAND
    }
    assert got == want and len(got) > 0


def test_window_distribution_invariants(spark, sf_small):
    rows = windows.window_distribution(spark, sf_small).collect()
    by_type = {}
    for r in rows:
        assert 1 <= r.quartile <= 4
        assert 0.0 <= r.pct_rank <= 1.0
        assert 0.0 < r.cume <= 1.0
        by_type.setdefault(r.event_type, []).append(r)
    for grp in by_type.values():
        # one shared first_event_id per partition; quartiles near-equal size
        assert len({r.first_event_id for r in grp}) == 1
        sizes = [sum(1 for r in grp if r.quartile == q) for q in (1, 2, 3, 4)]
        assert max(sizes) - min(sizes) <= 1


def test_gapfill_locf_dense_spine_and_carry(spark, sf_small):
    rows = sorted(
        windows.gapfill_locf(spark, sf_small).collect(),
        key=lambda r: (r.event_type, r.hour),
    )
    import datetime

    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    saw_gap = False
    for grp in by_type.values():
        # spine is dense: consecutive hours, no holes
        for a, b in zip(grp, grp[1:]):
            assert b.hour - a.hour == datetime.timedelta(hours=1)
        # LOCF: empty hours inherit the previous non-empty hour's value
        prev = None
        for r in grp:
            if r.n_events == 0:
                saw_gap = True
                assert r.locf_value == prev
            prev = r.locf_value
    assert saw_gap  # the fixture must actually exercise the fill


def test_bm25_monotone_in_tf_and_zero_without_terms(spark, sf_small):
    """BM25 invariants: score 0 iff no query term occurs; among docs of
    equal length, more occurrences of a term never lower the score."""
    from real_time_big_data_architect_spark.operators import text as text_ops

    rows = text_ops.bm25_score(spark, sf_small).collect()
    assert rows
    for r in rows:
        tf_total = sum(getattr(r, f"tf_{t}") for t in text_ops.BM25_TERMS)
        assert (r.bm25 == 0.0) == (tf_total == 0)
        assert r.bm25 >= 0.0
    # single-term monotonicity at fixed dl
    by_dl = {}
    for r in rows:
        if all(getattr(r, f"tf_{t}") == 0 for t in text_ops.BM25_TERMS[1:]):
            by_dl.setdefault(r.dl, []).append(
                (getattr(r, f"tf_{text_ops.BM25_TERMS[0]}"), r.bm25)
            )
    for pairs in by_dl.values():
        pairs.sort()
        for (tf1, s1), (tf2, s2) in zip(pairs, pairs[1:]):
            if tf1 < tf2:
                assert s1 <= s2


def test_minhash_kernel_matches_pure_python_reference():
    """The Arrow MinHash kernel equals a from-scratch reimplementation
    (md5-low-32 word hash → sliding coefficient dot mod 2^32 → 64
    affine minima) on randomized word lists — independent of both
    Spark and DuckDB, so kernel and oracle cannot drift together."""
    import hashlib

    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from real_time_big_data_architect_spark.operators import dedup as D

    word = st.text(
        alphabet=st.characters(blacklist_characters=" ", blacklist_categories=("Cs",)),
        min_size=1, max_size=8,
    )
    texts = st.lists(word, min_size=1, max_size=40).map(" ".join)

    @settings(max_examples=60, deadline=None)
    @given(texts)
    def check(t):
        got = D._minhash_text.func(pd.Series([t]))[0]
        # blank guard uses the kernel's ASCII-6 definition (_ASCII_WS,
        # mirroring the DuckDB oracle's trim set) — full-Unicode
        # str.strip() would wrongly expect None for texts made of
        # exotic whitespace like '\x1f', which the kernel (and oracle)
        # deliberately treat as words
        if not t.strip(D._ASCII_WS):
            assert got is None
            return
        words = t.split(" ")
        wh = [int(hashlib.md5(w.encode()).hexdigest()[:8], 16) for w in words]
        coefs = [int(c) for c in D._SHINGLE_COEF]
        if len(wh) >= D.SHINGLE_K:
            sh = [
                sum(wh[i + j] * coefs[j] for j in range(D.SHINGLE_K)) % (1 << 32)
                for i in range(len(wh) - D.SHINGLE_K + 1)
            ]
        else:
            sh = [sum(h * c for h, c in zip(wh, coefs)) % (1 << 32)]
        want = [
            min((a * s + b) % D.P_MINHASH for s in sh)
            for a, b in zip(D.MINHASH_A, D.MINHASH_B)
        ]
        assert list(got) == want

    check()


def test_simhash_kernel_matches_pure_python_reference():
    """Same discipline for SimHash: md5-low-64 word hashes, per-bit
    occurrence votes, sign → bit, two's-complement signed pack."""
    import hashlib

    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from real_time_big_data_architect_spark.operators import dedup as D

    word = st.text(
        alphabet=st.characters(blacklist_characters=" ", blacklist_categories=("Cs",)),
        min_size=1, max_size=8,
    )
    texts = st.lists(word, min_size=1, max_size=40).map(" ".join)

    @settings(max_examples=60, deadline=None)
    @given(texts)
    def check(t):
        got = D._simhash_text.func(pd.Series([t]))[0]
        if not t.strip(D._ASCII_WS):  # ASCII-6 guard — see minhash twin
            assert got is None
            return
        words = t.split(" ")
        us = [int(hashlib.md5(w.encode()).hexdigest()[:16], 16) for w in words]
        sig = 0
        for b in range(64):
            vote = sum(1 if (u >> b) & 1 else -1 for u in us)
            if vote > 0:
                sig |= 1 << b
        bands = [(sig >> (16 * k)) & 0xFFFF for k in range(D.SIMHASH_BANDS)]
        signed = sig - (1 << 64) if sig >= 1 << 63 else sig
        assert list(got) == [signed] + bands

    check()


def test_phash_kernel_matches_pure_python_reference():
    """Same discipline for the media phash (r7 byte-4-gram SimHash):
    md5-low-64 of each window's UPPERCASE-hex rendering, ±1 votes per
    bit, sign → bit — replayed arithmetic-only (no numpy), so kernel
    and DuckDB oracle cannot drift together. Random BINARY payloads,
    including <4-byte ones (sig 0)."""
    import hashlib

    from hypothesis import given, settings, strategies as st

    from real_time_big_data_architect_spark.operators import multimodal as M

    @settings(max_examples=80, deadline=None)
    @given(st.binary(min_size=0, max_size=64))
    def check(raw):
        got = M.phash64(raw)
        if len(raw) < 4:
            assert got == 0
            return
        feats = [
            int(
                hashlib.md5(
                    raw[i : i + 4].hex().upper().encode()
                ).hexdigest()[:16],
                16,
            )
            for i in range(len(raw) - 3)
        ]
        want = 0
        for b in range(64):
            vote = sum(1 if (f >> b) & 1 else -1 for f in feats)
            if vote > 0:
                want |= 1 << b
        assert got == want

    check()


def test_gram_fixed_point_matches_oracle_decimal_path():
    """ADVICE r7 (similarity.py fixed-point Gram): the kernel's
    floor(|p|·1e10 + 0.5) float64 formula must equal the ORACLE's
    actual path — DuckDB round(p, 10) cast to DECIMAL(30,10) — on
    adversarial doubles, including planted values that land exactly on
    k + 0.5 at the 1e10 scale (the boundary where a float-scaled
    product and a decimal expansion could in principle round apart).
    This pins the equivalence the pca_certify hash gate relies on; the
    claim is engine-pipeline equality, not exact-decimal ROUND_HALF_UP
    of the product's full binary expansion (see the kernel docstring).

    The claim is DOMAIN-BOUNDED: it holds for |p| < 2^51/1e10
    (≈ 225179.98). From that octave up, the scaled product's float64
    spacing reaches 0.5 and the kernel's single rounding can differ
    from the oracle's DOUBLE round → DECIMAL re-round by one ulp
    (measured: 0 mismatches in ~1M uniform samples through 2^51;
    ~3% of the 2^51..2^52 octave diverges, first found by hypothesis
    at 450360.85198042274). The onset example is pinned below as the
    boundary witness. Embedding-component products (the kernel's
    actual input) are unit-scale, orders of magnitude inside the
    bound.
    """
    from decimal import Decimal

    import duckdb
    import numpy as np
    import pandas as pd

    from hypothesis import given, settings, strategies as st

    rng = np.random.default_rng(20260815)
    x = rng.standard_normal(100_000) * rng.choice(
        [1e-6, 1e-3, 1.0, 10.0], 100_000
    )
    p = x * rng.standard_normal(100_000)
    ties = (
        rng.integers(-(10**12), 10**12, 25_000).astype(np.float64) + 0.5
    ) / 1e10
    p = np.concatenate([p, ties])
    fp = np.floor(np.abs(p) * 1e10 + 0.5).astype(np.int64)
    fp = np.where(p < 0, -fp, fp)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"p": p}))
    dec = con.execute(
        "SELECT CAST(round(p, 10) AS DECIMAL(30,10)) AS d FROM t"
    ).fetchall()
    got = np.array(
        [int(Decimal(str(d[0])) * (10**10)) for d in dec], dtype=np.int64
    )
    mism = int((got != fp).sum())
    assert mism == 0, f"{mism} disagreements with the oracle decimal path"

    DOMAIN = float(2**51) / 1e10  # 225179.9813685248

    def _kern(v: float) -> int:
        k = int(np.floor(abs(v) * 1e10 + 0.5))
        return -k if v < 0 else k

    def _oracle(v: float) -> int:
        d = con.execute(
            "SELECT CAST(round(CAST(? AS DOUBLE), 10)"
            " AS DECIMAL(30,10))",
            [v],
        ).fetchone()[0]
        return int(Decimal(str(d)) * (10**10))

    @settings(max_examples=300, deadline=None)
    @given(
        st.floats(
            min_value=-DOMAIN,
            max_value=DOMAIN,
            allow_nan=False,
            allow_infinity=False,
        )
    )
    def prop(v: float) -> None:
        assert _oracle(v) == _kern(v)

    prop()

    # boundary witnesses: OUTSIDE the documented domain the engines'
    # last-ulp rounding diverges — keep the bound honest, not hidden
    for outside in (431608.25367514987, 450360.85198042274):
        assert _oracle(outside) != _kern(outside)
