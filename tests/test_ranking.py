"""functions/ranking.py: the scale-safe global rank must be
bit-identical to the single-partition window functions it replaces.

The contract is exactness, not approximation: ``range_partitioned_rank``
claims ranks identical to ``row_number() OVER (ORDER BY ...)`` and
``ntile_from_rank`` claims buckets identical to ``NTILE(k)`` — every
oracle written against the window functions must keep hashing. These
tests diff the two implementations on adversarial layouts: ties in the
sort key (resolved by the unique tiebreaker), heavy skew (most rows in
one key range), descending order, more partitions than rows (empty
range partitions), and every N-vs-k remainder shape for NTILE.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.functions.ranking import (
    ntile_from_rank,
    range_partitioned_rank,
)


def _mismatches(df, rank_col, ref_col):
    return df.filter(F.col(rank_col) != F.col(ref_col)).count()


def test_rank_matches_window_row_number(spark):
    # ties in `v` (v = i % 7) force the tiebreaker to carry the order
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    ranked = range_partitioned_rank(
        df, F.col("v"), F.col("id"), rank_col="rnk"
    )
    ref = F.row_number().over(Window.orderBy("v", "id"))
    got = ranked.withColumn("ref", ref)
    assert _mismatches(got, "rnk", "ref") == 0
    # ranks are a permutation of 1..N
    agg = ranked.agg(
        F.min("rnk").alias("lo"),
        F.max("rnk").alias("hi"),
        F.count_distinct("rnk").alias("n"),
    ).first()
    assert (agg.lo, agg.hi, agg.n) == (1, 1000, 1000)


def test_rank_descending_order(spark):
    df = spark.range(500).select(
        F.col("id"), (F.col("id") * 37 % 101).alias("v")
    )
    ranked = range_partitioned_rank(
        df, F.col("v").desc(), F.col("id").asc(), rank_col="rnk"
    )
    ref = F.row_number().over(Window.orderBy(F.col("v").desc(), "id"))
    assert _mismatches(ranked.withColumn("ref", ref), "rnk", "ref") == 0


def test_rank_skewed_keys(spark):
    # 95% of rows share one key range end: range partitioner must still
    # produce correct (if unbalanced) global ranks
    df = spark.range(2000).select(
        F.col("id"),
        F.when(F.col("id") % 20 == 0, F.col("id")).otherwise(F.lit(0)).alias(
            "v"
        ),
    )
    ranked = range_partitioned_rank(df, F.col("v"), F.col("id"), rank_col="r")
    ref = F.row_number().over(Window.orderBy("v", "id"))
    assert _mismatches(ranked.withColumn("ref", ref), "r", "ref") == 0


def test_rank_more_partitions_than_rows(spark):
    # empty range partitions must not shift offsets
    df = spark.range(3).select(F.col("id"))
    ranked = range_partitioned_rank(
        df, F.col("id"), rank_col="r", num_partitions=16
    )
    rows = sorted((r.id, r.r) for r in ranked.collect())
    assert rows == [(0, 1), (1, 2), (2, 3)]


@pytest.mark.parametrize("n,k", [(10, 10), (17, 10), (9, 10), (1, 10),
                                 (100, 7), (23, 4), (4, 4), (3, 4)])
def test_ntile_from_rank_matches_window_ntile(spark, n, k):
    df = spark.range(n).select(F.col("id"))
    ranked = range_partitioned_rank(df, F.col("id"), rank_col="rnk")
    got = ranked.crossJoin(
        F.broadcast(df.agg(F.count("*").alias("__n")))
    ).select(
        "id", ntile_from_rank(F.col("rnk"), F.col("__n"), k).alias("b")
    )
    ref = df.select(
        "id", F.ntile(k).over(Window.orderBy("id")).alias("ref")
    )
    joined = got.join(ref, "id")
    assert joined.filter(F.col("b") != F.col("ref")).count() == 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1,
        max_size=200,
    ),
    npart=st.integers(min_value=1, max_value=40),
)
def test_rank_property_equals_sorted_position(spark, vals, npart):
    """For ANY value multiset and ANY partition count, the two-pass
    rank of (v, id) equals the row's position in the lexicographic
    sort — the full row_number contract, not just the fixtures."""
    rows = list(enumerate(vals))  # (id, v) — id is the tiebreaker
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.rnk
        for r in range_partitioned_rank(
            df, F.col("v"), F.col("id"), rank_col="rnk",
            num_partitions=npart,
        ).collect()
    }
    want = {
        rid: i + 1
        for i, (rid, _) in enumerate(
            sorted(rows, key=lambda t: (t[1], t[0]))
        )
    }
    assert got == want


from real_time_big_data_architect_spark.functions.ranking import (  # noqa: E402
    range_partitioned_key_lead,
    range_partitioned_prefix_max,
)


def test_prefix_max_matches_unpartitioned_window(spark):
    # unique order keys, values that rise and fall so the running max
    # plateaus across partition boundaries
    # multiplier coprime with 97 so v cycles through all residues
    df = spark.range(1000).select(
        F.col("id"), ((F.col("id") * 37) % 97).alias("v")
    )
    got = range_partitioned_prefix_max(df, "id", "v", "pm")
    ref = F.max("v").over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    )
    joined = got.withColumn("ref", ref)
    # NULL-safe compare: global first row is NULL on both sides
    assert joined.filter(~F.col("pm").eqNullSafe(F.col("ref"))).count() == 0


def test_prefix_max_more_partitions_than_rows(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 9), (4, 1)], "k long, v long"
    )
    rows = {
        r.k: r.pm
        for r in range_partitioned_prefix_max(
            df, "k", "v", "pm", num_partitions=16
        ).collect()
    }
    assert rows == {1: None, 2: 5, 3: 5, 4: 9}


def test_key_lead_matches_unpartitioned_window(spark):
    # sparse, shuffled ids: successor must come from global order
    df = spark.range(500).select((F.col("id") * 13 % 1009).alias("k"))
    got = range_partitioned_key_lead(df, "k", "nxt")
    ref = F.lead("k").over(Window.orderBy("k"))
    joined = got.withColumn("ref", ref)
    assert joined.filter(~F.col("nxt").eqNullSafe(F.col("ref"))).count() == 0


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.sets(
        st.integers(min_value=-10_000, max_value=10_000),
        min_size=1,
        max_size=200,
    ),
    npart=st.integers(min_value=1, max_value=40),
)
def test_key_lead_property_equals_sorted_successor(spark, keys, npart):
    """For ANY unique key set and ANY partition count, the two-pass
    lead equals each key's successor in the sorted order (NULL for the
    maximum) — boundary stitching across empty/skewed partitions
    included."""
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r.k: r.nxt
        for r in range_partitioned_key_lead(
            df, "k", "nxt", num_partitions=npart
        ).collect()
    }
    s = sorted(keys)
    want = {k: (s[i + 1] if i + 1 < len(s) else None) for i, k in enumerate(s)}
    assert got == want


from real_time_big_data_architect_spark.functions.ranking import (  # noqa: E402
    quantile_partitioned_rank,
)


def test_quantile_rank_matches_window_asc_and_desc(spark):
    # heavy ties (v = id % 5) force tie resolution through the tiebreak
    df = spark.range(2000).select(F.col("id"), (F.col("id") % 5).alias("v"))
    for desc in (False, True):
        got = quantile_partitioned_rank(
            df, "v", "id", descending=desc, rank_col="rnk"
        )
        order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("id")]
        ref = F.row_number().over(Window.orderBy(*order))
        assert (
            got.withColumn("ref", ref)
            .filter(F.col("rnk") != F.col("ref"))
            .count()
            == 0
        ), f"descending={desc}"


def test_quantile_rank_null_keys_first_asc_last_desc(spark):
    rows = [(0, None), (1, 5.0), (2, 1.0), (3, None), (4, 3.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    asc = {
        r.id: r.rnk
        for r in quantile_partitioned_rank(df, "v", "id", rank_col="rnk")
        .collect()
    }
    # NULLS FIRST (by id), then 1.0, 3.0, 5.0
    assert asc == {0: 1, 3: 2, 2: 3, 4: 4, 1: 5}
    desc = {
        r.id: r.rnk
        for r in quantile_partitioned_rank(
            df, "v", "id", descending=True, rank_col="rnk"
        ).collect()
    }
    # 5.0, 3.0, 1.0, then NULLS LAST (by id)
    assert desc == {1: 1, 4: 2, 2: 3, 0: 4, 3: 5}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=200,
    ),
    npart=st.integers(min_value=1, max_value=40),
)
def test_quantile_rank_property_equals_sorted_position(spark, vals, npart):
    """For ANY value multiset (NULLs included) and ANY partition
    count, the sketch-bounded rank equals the row's position in the
    (v NULLS FIRST, id) sort — bound values only balance partitions,
    never affect ranks."""
    rows = list(enumerate(vals))
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r.id: r.rnk
        for r in quantile_partitioned_rank(
            df, "v", "id", rank_col="rnk", num_partitions=npart
        ).collect()
    }
    key = lambda t: (0, 0.0, t[0]) if t[1] is None else (1, t[1], t[0])
    want = {
        rid: i + 1 for i, (rid, _) in enumerate(sorted(rows, key=key))
    }
    assert got == want


from real_time_big_data_architect_spark.functions.ranking import (  # noqa: E402
    quantile_partitioned_rank_sum,
)


def test_rank_sum_matches_window_sum(spark):
    rows = [(i, float((i * 7) % 5), i % 3 == 0) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, v double, flag boolean")
    got = quantile_partitioned_rank_sum(
        df, "v", "id", "flag", num_partitions=7
    ).collect()[0]
    w = Window.orderBy(F.col("v").asc_nulls_first(), F.col("id").asc())
    want = (
        df.select("flag", F.row_number().over(w).alias("rnk"))
        .agg(
            F.sum(F.when(F.col("flag"), F.col("rnk")).otherwise(0)),
            F.sum(F.col("flag").cast("long")),
            F.sum((~F.col("flag")).cast("long")),
        )
        .collect()[0]
    )
    assert (got.rank_sum, got.n_true, got.n_false) == tuple(want)


def test_rank_sum_null_flags_count_as_unflagged(spark):
    """NULL flags are unflagged (the window-twin's otherwise(0)
    semantics) — including a partition whose flags are ALL NULL, which
    must not poison rank_sum or shrink n_false."""
    rows = [(i, float(i), None if i < 10 else i % 2 == 0) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, v double, flag boolean")
    got = quantile_partitioned_rank_sum(
        # npart high enough that the all-NULL-flag low-value rows get
        # their own pid(s)
        df, "v", "id", "flag", num_partitions=10
    ).collect()[0]
    want_sum = sum(i + 1 for i in range(20) if rows[i][2])
    want_true = sum(1 for r in rows if r[2])
    assert (got.rank_sum, got.n_true, got.n_false) == (
        want_sum, want_true, 20 - want_true,
    )


def test_rank_sum_descending(spark):
    rows = [(i, float(i % 4), i % 2 == 0) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, v double, flag boolean")
    got = quantile_partitioned_rank_sum(
        df, "v", "id", "flag", descending=True, num_partitions=5
    ).collect()[0]
    w = Window.orderBy(F.col("v").desc_nulls_last(), F.col("id").asc())
    want = (
        df.select("flag", F.row_number().over(w).alias("rnk"))
        .agg(F.sum(F.when(F.col("flag"), F.col("rnk")).otherwise(0)))
        .collect()[0][0]
    )
    assert got.rank_sum == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=120,
    ),
    npart=st.integers(min_value=1, max_value=40),
)
def test_rank_sum_property_equals_window_sum(spark, vals, npart):
    """For ANY value multiset (NULLs included) and ANY partition count,
    the fused rank-sum equals Σ row_number() over flagged rows — the
    offsets fold never depends on the bound values."""
    rows = [(i, v, i % 3 == 1) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double, flag boolean")
    got = quantile_partitioned_rank_sum(
        df, "v", "id", "flag", num_partitions=npart
    ).collect()[0]
    key = lambda t: (0, 0.0, t[0]) if t[1] is None else (1, t[1], t[0])
    ranked = sorted(rows, key=key)
    want_sum = sum(i + 1 for i, r in enumerate(ranked) if r[2])
    want_true = sum(1 for r in rows if r[2])
    assert (got.rank_sum, got.n_true, got.n_false) == (
        want_sum, want_true, len(rows) - want_true,
    )
