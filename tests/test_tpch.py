"""TPC-H batch-2 invariants (operators/tpch.py) — value properties the
oracle hash can't see, plus the plan shapes that must hold at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_big_data_architect_spark.operators import tpch
from real_time_big_data_architect_spark.plans import explain
from real_time_big_data_architect_spark.tables import load_table


def test_q13_histogram_accounts_for_every_customer(spark, sf_small):
    hist = tpch.tpch_q13(spark, sf_small).agg(F.sum("custdist")).first()[0]
    n_cust = load_table(spark, sf_small, "customer").count()
    assert hist == n_cust


def test_q14_promo_share_bounded_and_consistent(spark, sf_small):
    row = tpch.tpch_q14(spark, sf_small).first()
    assert 0.0 <= row.promo_pct <= 100.0
    assert row.promo_revenue <= row.total_revenue
    assert row.promo_pct == (100.0 * row.promo_revenue) / row.total_revenue


def test_q15_returns_the_actual_max_supplier(spark, sf_small):
    rows = tpch.tpch_q15(spark, sf_small).collect()
    assert len(rows) >= 1
    li = load_table(spark, sf_small, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    net = price * (F.lit(1).cast("decimal(18,2)") - disc)
    best = (
        li.groupBy("l_suppkey")
        .agg(F.sum(net).cast("double").alias("r"))
        .agg(F.max("r"))
        .first()[0]
    )
    assert rows[0].total_revenue == best


def test_q8_share_is_volume_ratio(spark, sf_small):
    for row in tpch.tpch_q8(spark, sf_small).collect():
        assert 0.0 <= row.mkt_share <= 1.0
        assert row.mkt_share == row.nation_volume / row.total_volume


def test_q19_disjunction_stays_equi_join(spark, sf_small):
    """The OR-of-ANDs is a residual on a partkey equi-join — a nested
    loop here would be O(n·m) at scale."""
    df = tpch.tpch_q19(spark, sf_small)
    hits = explain.plan_has(
        df, "BroadcastHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct"
    )
    assert hits["BroadcastHashJoin"]
    assert not hits["BroadcastNestedLoopJoin"]
    assert not hits["CartesianProduct"]


def test_q7_q9_broadcast_the_dims(spark, sf_small):
    explain.assert_broadcast_join(tpch.tpch_q7(spark, sf_small))
    explain.assert_broadcast_join(tpch.tpch_q9(spark, sf_small))


def test_q22_threshold_matches_plain_average(spark, sf_small):
    """The decimal bal·n > sum form must select exactly the customers a
    plain above-average filter would."""
    cu = load_table(spark, sf_small, "customer")
    avg_pos = (
        cu.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).first()[0]
    )
    expected = cu.filter(F.col("c_acctbal") > avg_pos).count()
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    pos = cu.filter(F.col("c_acctbal") > 0).agg(
        F.count("*").alias("n_pos"), F.sum(bal).alias("sum_pos")
    )
    got = (
        cu.crossJoin(F.broadcast(pos))
        .filter(bal * F.col("n_pos") > F.col("sum_pos"))
        .count()
    )
    assert got == expected


def test_q2_best_supplier_has_max_acctbal_among_part_suppliers(spark, sf_small):
    rows = tpch.tpch_q2(spark, sf_small).collect()
    assert rows
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, []).append(r.s_acctbal)
    # each selected supplier must carry its part's (unique) max balance
    for bals in by_part.values():
        assert len(set(bals)) == 1


def test_q4_counts_only_orders_with_a_late_line(spark, sf_small):
    total = sum(r.order_count for r in tpch.tpch_q4(spark, sf_small).collect())
    o = load_table(spark, sf_small, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    assert 0 < total <= o.count()


def test_q11_keeps_only_above_average_parts(spark, sf_small):
    vals = [r.value for r in tpch.tpch_q11(spark, sf_small).collect()]
    assert vals
    # every survivor clears the mean of the *full* population, so the
    # min survivor exceeds the survivors-only mean scaled down — weak
    # but engine-independent: each value > total/n of the full set is
    # not recomputable here, so assert ordering sanity instead
    assert min(vals) > 0


def test_q12_buckets_partition_the_year(spark, sf_small):
    rows = {r.ship_bucket: r for r in tpch.tpch_q12(spark, sf_small).collect()}
    assert set(rows) == {"FAST", "SLOW"}
    li = load_table(spark, sf_small, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    n = sum(r.high_line_count + r.low_line_count for r in rows.values())
    assert n == li.count()


def test_q17_small_quantity_threshold(spark, sf_small):
    row = tpch.tpch_q17(spark, sf_small).first()
    # the filter keeps a strict subset of Brand#3 lines
    brand3 = (
        load_table(spark, sf_small, "lineitem")
        .join(
            load_table(spark, sf_small, "part").filter(
                F.col("p_brand") == "Brand#3"
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .count()
    )
    assert 0 <= row.n_small < brand3


def test_q21_waiting_supplier_was_sole_late_one(spark, sf_small):
    rows = tpch.tpch_q21(spark, sf_small).collect()
    assert rows
    assert all(r.numwait >= 1 for r in rows)


def test_q2_q11_q20_dims_broadcast(spark, sf_small):
    for q in (tpch.tpch_q2, tpch.tpch_q11, tpch.tpch_q20):
        hits = explain.plan_has(
            q(spark, sf_small), "BroadcastHashJoin", "CartesianProduct"
        )
        assert hits["BroadcastHashJoin"], q.__name__


def test_q1_charge_identities_and_row_accounting(spark, sf_small):
    rows = tpch.tpch_q1(spark, sf_small).collect()
    assert rows
    li = load_table(spark, sf_small, "lineitem")
    n_filtered = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ).count()
    assert sum(r.count_order for r in rows) == n_filtered
    for r in rows:
        # tax >= 0 and discount in [0,1): charge >= disc_price,
        # disc_price <= base_price
        assert r.sum_charge >= r.sum_disc_price
        assert r.sum_disc_price <= r.sum_base_price
        # averages are the exact decimal sum over the group count
        assert r.avg_qty == r.sum_qty / r.count_order
        assert r.avg_price == r.sum_base_price / r.count_order


def test_q1_is_one_scan_no_join(spark, sf_small):
    hits = explain.plan_has(
        tpch.tpch_q1(spark, sf_small),
        "HashAggregate", "Join", "Exchange",
    )
    assert hits["HashAggregate"] and not hits["Join"]
