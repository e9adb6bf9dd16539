"""Sketch / integrity operators: CMS bounds, checksum sensitivity,
skew invariants, incremental-refresh equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_architect_spark.operators import sketches
from real_time_big_data_architect_spark.tables import load_table


def test_cms_overestimates_and_is_usually_exact(spark, sf_small):
    """CMS point estimates never undercount, and at fixture cardinality
    (few thousand distinct words vs 4x1024 cells) collisions are rare
    enough that most top-20 estimates are exact."""
    rows = sketches.cms_heavy_hitters(spark, sf_small).collect()
    assert len(rows) == sketches.CMS_TOPK
    assert all(r.n_est >= r.n_exact for r in rows)
    exact = sum(1 for r in rows if r.n_est == r.n_exact)
    assert exact >= sketches.CMS_TOPK // 2, f"only {exact}/20 collision-free"


def test_cms_sketch_is_mergeable(spark, sf_small):
    """The sketch of a union equals cell-wise sum of partial sketches —
    the property that lets every partition sketch independently."""
    d = load_table(spark, sf_small, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    half_a = words.limit(200)
    cells = lambda w: (  # noqa: E731
        w.select(
            F.posexplode(
                F.array(
                    *[
                        sketches._cms_bucket(F.col("word"), s)
                        for s in range(sketches.CMS_DEPTH)
                    ]
                )
            ).alias("row", "bucket")
        )
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("counter"))
    )
    whole = {(r.row, r.bucket): r.counter for r in cells(half_a).collect()}
    # split the same 200 words deterministically by md5 parity
    parity = F.pmod(
        F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("bigint"), F.lit(2)
    )
    tagged = half_a.withColumn("p", parity)
    merged: dict = {}
    for p in (0, 1):
        for r in cells(tagged.filter(F.col("p") == p).drop("p")).collect():
            merged[(r.row, r.bucket)] = merged.get((r.row, r.bucket), 0) + r.counter
    assert merged == whole


def test_table_checksum_detects_single_row_change(spark, sf_small):
    base = sketches.table_checksum(spark, sf_small).first()
    o = load_table(spark, sf_small, "orders")
    assert base.n_rows == o.count()

    # recompute with one order's status flipped: checksum must move
    mutated = o.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == 1, F.lit("Z")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    parts = [
        F.date_format(F.col(c), "yyyy-MM-dd HH:mm:ss")
        if c == "o_orderdate"
        else F.col(c).cast("string")
        for c in sketches._CHECKSUM_COLS
    ]
    digest = F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 8), 16, 10).cast(
        "bigint"
    )
    changed = mutated.agg(F.sum(digest).alias("s")).first().s
    assert changed != base.content_checksum


def test_skew_stats_invariants(spark, sf_small):
    r = sketches.skew_stats(spark, sf_small).first()
    li_count = load_table(spark, sf_small, "lineitem").count()
    assert r.total_rows == li_count
    assert r.max_per_key >= r.avg_per_key
    assert abs(r.skew_ratio - r.max_per_key / r.avg_per_key) < 1e-9


def test_mv_incremental_equals_full_recompute(spark, sf_small):
    """The defining MV property: base+delta merge == direct recompute."""
    inc = {
        r.event_type: (r.sum_value, r.n_events)
        for r in sketches.mv_incremental_refresh(spark, sf_small).collect()
    }
    ev = load_table(spark, sf_small, "events")
    full = {
        r.event_type: (r.sum_value, r.n_events)
        for r in ev.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(30,4)"))
            .cast("double")
            .alias("sum_value"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    assert inc == full


def test_mv_incremental_one_sided_types(spark, tmp_path):
    """The full-outer merge's one-sided branches, exercised for real
    (r10 review: the old cutoff put every fixture row in base, so the
    delta leg — and both absent-side branches — were certified
    vacuously): one event_type exists only BEFORE the cutoff (delta
    side NULL), one only AFTER (base side NULL, the branch that would
    silently drop a brand-new type), one spans it."""
    import datetime as dt
    import glob
    import shutil

    before = dt.datetime(2024, 1, 5)
    after = dt.datetime(2024, 1, 25)  # cutoff is 2024-01-20
    rows = [
        (1, before, 1, "legacy", 1.5, "{}"),
        (2, before, 2, "legacy", 2.5, "{}"),
        (3, after, 3, "brand_new", 10.0, "{}"),
        (4, before, 4, "spanning", 1.0, "{}"),
        (5, after, 5, "spanning", 2.0, "{}"),
        (6, after, 6, "null_val", None, "{}"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/stage")
    shutil.move(
        glob.glob(f"{d}/stage/part-*.parquet")[0], f"{d}/events.parquet"
    )
    shutil.rmtree(f"{d}/stage")
    got = {
        r.event_type: (r.sum_value, r.n_events)
        for r in sketches.mv_incremental_refresh(spark, d).collect()
    }
    assert got == {
        "legacy": (4.0, 2),
        "brand_new": (10.0, 1),
        "spanning": (3.0, 2),
        "null_val": (None, 1),  # all-NULL group stays NULL, not 0.0
    }


def test_hll_distinct_replay_and_mergeability(spark, sf_small):
    """Spark's HLL registers/estimate match a bit-exact Python replay;
    registers built on disjoint halves max-merge to the global ones."""
    import hashlib

    from real_time_big_data_architect_spark.operators import sketches as sk
    from real_time_big_data_architect_spark.tables import load_table

    ev = load_table(spark, sf_small, "events").collect()

    def regs_of(rows):
        regs: dict[str, list[int]] = {}
        for r in rows:
            h = int(
                hashlib.md5(str(r.user_id).encode()).hexdigest()[:15], 16
            )
            b, w = h % sk.HLL_M, h // sk.HLL_M
            rho = (
                sk.HLL_WBITS + 1
                if w == 0
                else sk.HLL_WBITS + 1 - len(bin(w)) - (-2)
            )
            # len(bin(w)) includes '0b' prefix; recompute cleanly:
            rho = (
                sk.HLL_WBITS + 1
                if w == 0
                else sk.HLL_WBITS + 1 - (w.bit_length())
            )
            regs.setdefault(r.event_type, [0] * sk.HLL_M)
            regs[r.event_type][b] = max(regs[r.event_type][b], rho)
        return regs

    regs = regs_of(ev)
    expect = {}
    for et, m in regs.items():
        s = sum(1 << (sk.HLL_WBITS + 1 - mj) for mj in m)
        raw = (
            sk.HLL_ALPHA
            * float(sk.HLL_M * sk.HLL_M)
            * float(1 << (sk.HLL_WBITS + 1))
            / float(s)
        )
        n_zero = sum(1 for mj in m if mj == 0)
        if raw <= sk.HLL_RAW_CUTOFF and n_zero > 0:
            corrected = sk.HLL_LINEAR[n_zero - 1]
        else:
            corrected = raw
        expect[et] = (raw, n_zero, corrected)
    exact = {}
    for r in ev:
        exact.setdefault(r.event_type, set()).add(r.user_id)
    got = {r.event_type: r for r in sk.hll_distinct(spark, sf_small).collect()}
    assert set(got) == set(regs)
    for et, r in got.items():
        raw, n_zero, corrected = expect[et]
        assert r.n_exact == len(exact[et])
        assert r.n_zero_regs == n_zero
        assert abs(r.hll_raw - raw) < 1e-9  # replay-exact
        assert abs(r.hll_estimate - corrected) < 1e-9
        # with linear counting the estimate lands in a tight band
        assert 0.7 * r.n_exact < r.hll_estimate < 1.3 * r.n_exact
    # mergeability: element-wise max of per-half registers == global
    half_a = regs_of([r for r in ev if r.event_id % 2 == 0])
    half_b = regs_of([r for r in ev if r.event_id % 2 == 1])
    for et, m in regs.items():
        merged = [
            max(half_a.get(et, [0] * sk.HLL_M)[i],
                half_b.get(et, [0] * sk.HLL_M)[i])
            for i in range(sk.HLL_M)
        ]
        assert merged == m


def test_bitmap_and_datasketch_distinct(spark, sf_small):
    """Bitmap popcount sum equals the exact distinct per type; the
    DataSketches HLL estimate lands within its configured error."""
    from real_time_big_data_architect_spark.operators import sketches as sk
    from real_time_big_data_architect_spark.tables import load_table

    ev = load_table(spark, sf_small, "events").collect()
    exact: dict = {}
    for r in ev:
        exact.setdefault(r.event_type, set()).add(r.user_id)
    got = {r.event_type: r.n_users for r in sk.bitmap_distinct(spark, sf_small).collect()}
    assert got == {k: len(v) for k, v in exact.items()}
    ds = {
        r.event_type: (r.exact_users, r.hll_in_bounds)
        for r in sk.datasketch_hll(spark, sf_small).collect()
    }
    all_users = set().union(*exact.values())
    for et, s in exact.items():
        assert ds[et] == (len(s), True)
    assert ds["__all__"] == (len(all_users), True)
