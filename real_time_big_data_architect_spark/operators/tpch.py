"""TPC-H batch 2 — deeper relational coverage (SURVEY §2.5 NS1/NS2).

The reference (app.py:192-247) answers single-table questions only; these
queries exercise the multi-join / correlated-subquery / histogram shapes a
warehouse engine must plan well. Q3/Q5/Q6/Q10/Q18 live in joins.py and
aggregates.py; this module adds Q7, Q8, Q9, Q13, Q14, Q15, Q19, Q22,
adapted to the fixture schema where columns are missing (no partsupp, no
ship modes, no phone numbers — each docstring states the substitution).

Scale posture shared by all eight: fact⋈fact edges shuffle once on their
keys, dimension edges broadcast, money accumulates in exact decimal
(order-independent, hash-stable), and single-row scalar subqueries
broadcast into the scan filter rather than re-executing per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.tables import load_table

#: exact-decimal net revenue l_extendedprice * (1 - l_discount)
def _net():
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return price * (F.lit(1).cast("decimal(18,2)") - disc)


_NET_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue flowing between two nations,
    by supplier nation, customer nation, and ship year.

    The two nation dims broadcast; the OR'd nation-pair predicate is a
    post-broadcast filter, so the big fact edges (lineitem⋈orders⋈
    customer, lineitem⋈supplier) each shuffle exactly once on their key.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n1), su.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cu.c_nationkey == F.col("c_nkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_net()).cast("double").alias("revenue"))
    )


def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of PROMO-part
    revenue sold to AMERICA customers, by order year.

    Share = promo-nation decimal sum / total decimal sum, both cast to
    double before one IEEE division — exact-rounded and identical across
    engines because the operands are bit-identical (see
    [[spark-duckdb-determinism]]: division is portable, libm is not).
    """
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = _net()
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n2), su.s_nationkey == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero))
            .cast("double")
            .alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .select(
            "o_year",
            "nation_volume",
            "total_volume",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
        )
    )


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: the fixtures have no
    partsupp/supplycost, so profit = net revenue for parts whose name
    contains 'red', by supplier nation and order year.

    The LIKE-filtered part side (~13% of parts) broadcasts; nation
    broadcasts; lineitem⋈orders shuffles on the order key — one big
    shuffle total, same as the canonical Q9 plan minus partsupp.
    """
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(_net()).cast("double").alias("sum_profit"))
    )


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of orders-per-customer
    (adapted: no o_comment column, so no comment exclusion).

    Two hash aggregations back to back: count per customer (shuffle on
    custkey — already the join's partitioning, so AQE coalesces), then
    the tiny histogram agg. The left join keeps zero-order customers in
    the c_count=0 bucket.
    """
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        cu.join(o, cu.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): % of March-1996 revenue from PROMO
    parts — one row, numerator/denominator kept as audit columns.

    part broadcasts into the month-filtered lineitem scan (the shipdate
    range is pushed to parquet); promo share computed as
    (100·promo)/total in double, deterministic because both operands are
    exact decimal sums.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    pa = load_table(spark, sf_dir, "part")
    vol = _net()
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(vol).cast("double").alias("total_revenue"),
        )
        .select(
            "promo_revenue",
            "total_revenue",
            (
                (F.lit(100.0) * F.col("promo_revenue")) / F.col("total_revenue")
            ).alias("promo_pct"),
        )
    )


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) whose 1996-Q1 revenue equals
    the maximum — the classic view + scalar-max shape.

    Revenue stays in exact decimal through the max-equality comparison
    (a double equality would be fragile at the boundary); the 1-row max
    broadcasts. Supplier dim broadcasts into the tiny qualifying set.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    su = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_net()).alias("rev_dec"))
    mx = rev.agg(F.max("rev_dec").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), rev.rev_dec == F.col("max_rev"))
        .join(F.broadcast(su), rev.l_suppkey == su.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue), adapted: no p_container, so the
    three disjunctive arms combine brand, size band, and quantity band.

    The join is a clean equi-join on partkey with the OR-of-ANDs as a
    residual filter — Catalyst must NOT fall back to a nested loop for
    the disjunction (the equi conjunct is common to all arms). part
    broadcasts; one row out.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    arm1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#5")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .filter(arm1 | arm2 | arm3)
        .agg(
            F.sum(_net()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: no phone column, so
    the group key is the customer's nation, and — since every fixture
    customer has orders — "dormant" means no order on/after 2000-01-01.

    The above-average-balance threshold uses the multiplication form
    ``bal·n > sum`` in exact decimal (no division boundary); the 1-row
    aggregate broadcasts into the scan filter. The dormancy check is a
    left-anti join against the date-filtered orders (the filter pushes
    to parquet, so the anti build side is small).
    """
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    pos = cu.filter(F.col("c_acctbal") > 0).agg(
        F.count("*").alias("n_pos"),
        F.sum(bal).alias("sum_pos"),
    )
    return (
        cu.crossJoin(F.broadcast(pos))
        .filter(bal * F.col("n_pos") > F.col("sum_pos"))
        .join(recent, cu.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (min-cost supplier), adapted: no partsupp, so the
    part↔supplier relation is the distinct (l_partkey, l_suppkey) pairs
    observed in lineitem, and "best" supplier = max s_acctbal (no
    ps_supplycost column) among a part's EUROPE suppliers, for STANDARD
    parts of size < 10.

    The correlated-max shape: per-part max broadcasts back into the
    candidate set as an equality join (acctbals are doubles copied
    unchanged from the dim, so cross-engine equality is exact). All
    dims broadcast; the only shuffle is the supplies distinct.
    """
    pa = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 10)
    )
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supplies = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    cand = (
        supplies.join(F.broadcast(pa), F.col("l_partkey") == pa.p_partkey)
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal")
    )
    best = cand.groupBy(F.col("p_partkey").alias("b_partkey")).agg(
        F.max("s_acctbal").alias("max_bal")
    )
    return cand.join(
        F.broadcast(best),
        (cand.p_partkey == F.col("b_partkey"))
        & (cand.s_acctbal == F.col("max_bal")),
    ).select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted: no l_commitdate /
    l_receiptdate, so "late" = a lineitem shipped more than 30 days
    after the order date; window = 1996-Q3 orders.

    EXISTS compiles to a left-semi join on the order key with the
    lateness predicate as the join residual — one shuffle, no
    per-order re-execution; the quarter filter pushes to the orders
    parquet scan.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock), adapted: no partsupp availqty/cost,
    so a part's "value" = net revenue shipped by EUROPE suppliers, and
    the threshold is above-average value (value·n_parts > total in
    exact decimal — the multiplication form avoids a division
    boundary; canonical Q11's fixed fraction would not survive a
    change of scale factor).

    The group-then-global-scalar shape: per-part decimal sums shuffle
    once on partkey; the 1-row total/count aggregate broadcasts into
    the HAVING filter.
    """
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    li = load_table(spark, sf_dir, "lineitem")
    vals = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("l_partkey")
        # stay at the product's natural scale 4: rounding down to 2
        # decimals ties at .xx50, where Spark (HALF_UP) and DuckDB
        # disagree — see [[spark-duckdb-determinism]]
        .agg(F.sum(_net()).cast("decimal(24,4)").alias("val_dec"))
    )
    tot = vals.agg(
        F.sum(F.col("val_dec")).cast("decimal(30,4)").alias("total"),
        F.count("*").cast("decimal(10,0)").alias("n_parts"),
    )
    return (
        vals.crossJoin(F.broadcast(tot))
        .filter(F.col("val_dec") * F.col("n_parts") > F.col("total"))
        .select("l_partkey", F.col("val_dec").cast("double").alias("value"))
    )


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / priority), adapted: no l_shipmode or
    receipt/commit dates, so lines ship-dated in 1996 bucket into
    FAST (≤30 days after order) vs SLOW, counting urgent/high vs
    other priorities per bucket.

    orders⋈lineitem shuffles on the order key; the CASE sums are
    map-side partial aggregates into a 2-row result.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30,
                "FAST",
            )
            .otherwise("SLOW")
            .alias("ship_bucket"),
            high.alias("is_high"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias(
                "high_line_count"
            ),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1)).alias(
                "low_line_count"
            ),
        )
    )


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (part/supplier relationship), adapted: the supplies
    relation comes from lineitem (no partsupp), and the "complaints"
    exclusion becomes suppliers with negative account balance.

    distinct-supplier counts per (brand, type, size) over the
    size-IN-list filtered parts; the excluded-supplier set is a
    broadcast anti join before the count-distinct shuffle.
    """
    pa = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    supplies = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        supplies.join(F.broadcast(pa), F.col("l_partkey") == pa.p_partkey)
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == bad.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted: no
    p_container, so the scope is all Brand#3 parts; revenue lost to
    small orders = Σ price of lines with quantity < 20% of the part's
    average quantity, divided by 7.

    The correlated-avg threshold uses the multiplication form
    qty·5·cnt < Σqty in exact decimal (quantities are integral) —
    no division, no float-average divergence. Per-part sums shuffle
    once; the per-part thresholds broadcast back onto the lines.
    """
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = load_table(spark, sf_dir, "lineitem")
    qty_dec = F.col("l_quantity").cast("decimal(18,2)")
    lines = li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresh = lines.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(qty_dec).alias("sum_qty"),
        F.count("*").cast("decimal(10,0)").alias("cnt"),
    )
    return (
        lines.join(F.broadcast(thresh), F.col("l_partkey") == F.col("t_partkey"))
        .filter(qty_dec * F.lit(5).cast("decimal(2,0)") * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (part promotion), adapted: no partsupp availqty, so
    "excess" suppliers = those whose 1996 shipped quantity of
    blue-named parts exceeds the per-supplier average (decimal
    multiplication form, as in Q11/Q17).

    part broadcasts into the year-filtered scan; per-supplier sums
    shuffle once; the 1-row average broadcasts; supplier dim
    broadcasts onto the survivors.
    """
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("blue"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    su = load_table(spark, sf_dir, "supplier")
    qty = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"))
    )
    tot = qty.agg(
        F.sum("qty_dec").cast("decimal(24,2)").alias("total"),
        F.count("*").cast("decimal(10,0)").alias("n_supp"),
    )
    return (
        qty.crossJoin(F.broadcast(tot))
        .filter(F.col("qty_dec") * F.col("n_supp") > F.col("total"))
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("qty_dec").cast("double").alias("total_qty")
        )
    )


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" =
    shipped > 60 days after the order date (no receipt/commit dates),
    on finished ('F') orders. A supplier waits an order when it was
    late, at least one other supplier fed the same order (EXISTS), and
    no other supplier was late on it (NOT EXISTS).

    EXISTS → left-semi, NOT EXISTS → left-anti, both on the order key
    against the distinct (order, supplier) pair sets — three shuffles
    on the same key, which AQE plans as one exchange reused.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = pairs.select(
        F.col("l_orderkey").alias("o_okey"), F.col("l_suppkey").alias("o_skey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("ol_okey"), F.col("l_suppkey").alias("ol_skey")
    )
    waiting = (
        late.join(
            other,
            (F.col("l_orderkey") == F.col("o_okey"))
            & (F.col("l_suppkey") != F.col("o_skey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("ol_okey"))
            & (F.col("l_suppkey") != F.col("ol_skey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) — the FULL query, completing
    the 22-query suite (the flagship ``group_agg`` ships the Q1 shape
    without the tax term; this adds ``sum_charge``).

    One scan, one partial+final hash aggregate — the canonical
    map-side-combine showcase. Money accumulates in exact decimal:
    the triple product price·(1−disc)·(1+tax) uses DECIMAL(12,2)
    factors so the product precision lands at (36,6)/(38,6) — inside
    BOTH engines' 38-digit cap with zero precision loss (2-decimal
    inputs ⇒ the 6-decimal product is exact); averages divide the
    exact decimal sums in one double division, bit-identical to the
    oracle's expression tree.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    tax = F.col("l_tax").cast("decimal(12,2)")
    one = F.lit(1).cast("decimal(12,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("l_quantity")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("l_extendedprice")).alias(
                "avg_price"
            ),
            (F.sum(disc).cast("double") / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


QUERIES = {
    "tpch_q1": tpch_q1,
    "tpch_q2": tpch_q2,
    "tpch_q4": tpch_q4,
    "tpch_q11": tpch_q11,
    "tpch_q12": tpch_q12,
    "tpch_q16": tpch_q16,
    "tpch_q17": tpch_q17,
    "tpch_q20": tpch_q20,
    "tpch_q21": tpch_q21,
    "tpch_q7": tpch_q7,
    "tpch_q8": tpch_q8,
    "tpch_q9": tpch_q9,
    "tpch_q13": tpch_q13,
    "tpch_q14": tpch_q14,
    "tpch_q15": tpch_q15,
    "tpch_q19": tpch_q19,
    "tpch_q22": tpch_q22,
}

_Q1_SUM = "CAST(SUM(CAST({x} AS DECIMAL(12,2))) AS DOUBLE)"

ORACLE = {
    "tpch_q1": f"""
        SELECT l_returnflag, l_linestatus,
               {_Q1_SUM.format(x='l_quantity')} AS sum_qty,
               {_Q1_SUM.format(x='l_extendedprice')} AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(12,2))
                           - CAST(l_discount AS DECIMAL(12,2))))
                    AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(12,2))
                           - CAST(l_discount AS DECIMAL(12,2)))
                        * (CAST(1 AS DECIMAL(12,2))
                           + CAST(l_tax AS DECIMAL(12,2))))
                    AS DOUBLE) AS sum_charge,
               {_Q1_SUM.format(x='l_quantity')} / COUNT(l_quantity) AS avg_qty,
               {_Q1_SUM.format(x='l_extendedprice')} / COUNT(l_extendedprice)
                   AS avg_price,
               {_Q1_SUM.format(x='l_discount')} / COUNT(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q2": """
        WITH supplies AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ),
        cand AS (
            SELECT p_partkey, p_name, s_name, n_name, s_acctbal
            FROM supplies
            JOIN part     ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
              AND p_type = 'STANDARD' AND p_size < 10
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        FROM cand c
        WHERE s_acctbal = (SELECT MAX(s_acctbal) FROM cand c2
                           WHERE c2.p_partkey = c.p_partkey)
    """,
    "tpch_q4": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        GROUP BY o_orderpriority
    """,
    "tpch_q11": f"""
        WITH vals AS (
            SELECT l_partkey,
                   CAST(SUM({_NET_SQL}) AS DECIMAL(24,4)) AS val_dec
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
            GROUP BY l_partkey
        ),
        tot AS (
            SELECT CAST(SUM(val_dec) AS DECIMAL(30,4)) AS total,
                   CAST(COUNT(*) AS DECIMAL(10,0)) AS n_parts
            FROM vals
        )
        SELECT l_partkey, CAST(val_dec AS DOUBLE) AS value
        FROM vals, tot
        WHERE val_dec * n_parts > total
    """,
    "tpch_q12": """
        SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                    THEN 'FAST' ELSE 'SLOW' END AS ship_bucket,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY ship_bucket
    """,
    "tpch_q16": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          -- NOT EXISTS, not NOT IN (r11 review): the engine plans a
          -- left-anti join, whose NULL semantics match NOT EXISTS; a
          -- NULL s_suppkey in the subquery would make NOT IN reject
          -- every row while the anti join keeps them
          AND NOT EXISTS (SELECT 1 FROM supplier
                          WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    "tpch_q17": """
        WITH lines AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#3'
        ),
        thresh AS (
            SELECT l_partkey AS t_partkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                   CAST(COUNT(*) AS DECIMAL(10,0)) AS cnt
            FROM lines GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / 7.0 AS avg_yearly,
               COUNT(*) AS n_small
        FROM lines JOIN thresh ON l_partkey = t_partkey
        WHERE CAST(l_quantity AS DECIMAL(18,2))
              * CAST(5 AS DECIMAL(2,0)) * cnt < sum_qty
    """,
    "tpch_q20": """
        WITH qty AS (
            SELECT l_suppkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '%blue%'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey
        ),
        tot AS (
            SELECT CAST(SUM(qty_dec) AS DECIMAL(24,2)) AS total,
                   CAST(COUNT(*) AS DECIMAL(10,0)) AS n_supp
            FROM qty
        )
        SELECT s_suppkey, s_name, CAST(qty_dec AS DOUBLE) AS total_qty
        FROM qty, tot
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE qty_dec * n_supp > total
    """,
    "tpch_q21": """
        WITH late AS (
            SELECT DISTINCT l_orderkey, l_suppkey
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        ),
        pairs AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE EXISTS (SELECT 1 FROM pairs p
                      WHERE p.l_orderkey = l1.l_orderkey
                        AND p.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
    """,
    "tpch_q7": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
               CAST(SUM({_NET_SQL}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "tpch_q8": f"""
        SELECT o_year, nation_volume, total_volume,
               nation_volume / total_volume AS mkt_share
        FROM (
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                   CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                                 THEN {_NET_SQL}
                                 ELSE CAST(0 AS DECIMAL(18,2)) END)
                        AS DOUBLE) AS nation_volume,
                   CAST(SUM({_NET_SQL}) AS DOUBLE) AS total_volume
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE p_type = 'PROMO'
              AND r_name = 'AMERICA'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY o_year
        )
    """,
    "tpch_q9": f"""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
               CAST(SUM({_NET_SQL}) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year
    """,
    "tpch_q13": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q14": f"""
        SELECT promo_revenue, total_revenue,
               (100.0 * promo_revenue) / total_revenue AS promo_pct
        FROM (
            SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                                 THEN {_NET_SQL}
                                 ELSE CAST(0 AS DECIMAL(18,2)) END)
                        AS DOUBLE) AS promo_revenue,
                   CAST(SUM({_NET_SQL}) AS DOUBLE) AS total_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
        )
    """,
    "tpch_q15": f"""
        WITH revenue AS (
            SELECT l_suppkey, SUM({_NET_SQL}) AS rev_dec
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)
    """,
    "tpch_q19": f"""
        SELECT CAST(SUM({_NET_SQL}) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q22": """
        SELECT n_name,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS totacctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE CAST(c_acctbal AS DECIMAL(18,2))
              * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
              > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                 FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY n_name
    """,
}
