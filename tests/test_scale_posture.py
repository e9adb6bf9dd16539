"""Machine-checked 100 TB-posture claims beyond per-query plans:
partition pruning on a date-partitioned lake layout, and shuffle-free
joins on bucketed tables. These are the layouts the engine assumes at
scale; the tests prove Spark actually exploits them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.plans import explain
from real_time_big_data_architect_spark.tables import load_table


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_small, tmp_path_factory):
    """events written date-partitioned — the lake layout for the events
    table at scale (TESTDATA uses flat files only because they're tiny)."""
    path = str(tmp_path_factory.mktemp("lake") / "events_by_date")
    ev = load_table(spark, sf_small, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.partitionBy("event_date").mode("overwrite").parquet(path)
    return path


def test_partition_pruning_hits_partition_filters(spark, partitioned_events):
    df = (
        spark.read.parquet(partitioned_events)
        .filter(F.col("event_date") == "2024-01-03")
        .select("event_id", "value")
    )
    plan = explain.formatted_plan(df)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:", 1)[1].splitlines()[0]
    assert "event_date" in pf  # the date predicate prunes partitions
    # and the pruned scan returns only that day's rows
    n_day = df.count()
    n_all = spark.read.parquet(partitioned_events).count()
    assert 0 < n_day < n_all


def test_partition_pruning_reads_fewer_splits(spark, partitioned_events):
    # inputFiles() lists pre-pruning, so compare the planned scan splits
    pruned = spark.read.parquet(partitioned_events).filter(
        F.col("event_date") == "2024-01-03"
    )
    full = spark.read.parquet(partitioned_events)
    assert pruned.rdd.getNumPartitions() < full.rdd.getNumPartitions()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small):
    """orders and customer bucketed+sorted on the join key — the layout
    that makes fact⋈fact joins shuffle-free at 100 TB."""
    load_table(spark, sf_small, "orders").write.bucketBy(4, "o_custkey").sortBy(
        "o_custkey"
    ).mode("overwrite").saveAsTable("b_orders")
    load_table(spark, sf_small, "customer").write.bucketBy(4, "c_custkey").sortBy(
        "c_custkey"
    ).mode("overwrite").saveAsTable("b_customer")
    return "b_orders", "b_customer"


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    orders, customer = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(orders).join(
            spark.table(customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = explain.formatted_plan(joined)
        # co-bucketed sides: the join must not introduce any exchange
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(spark, sf_small):
    """Contrast: the same join on plain parquet must exchange both sides
    (proves the bucketed test isn't vacuously passing)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_small, "orders")
        c = load_table(spark, sf_small, "customer")
        plan = explain.formatted_plan(o.join(c, o.o_custkey == c.c_custkey))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_curated_corpus_lake_roundtrip(spark, sf_small, tmp_path_factory):
    """Write the curated corpus lang-partitioned (the lake sink a
    curation job actually ends with) and read it back intact."""
    from real_time_big_data_architect_spark.operators import text

    out_path = str(tmp_path_factory.mktemp("sink") / "curated")
    curated = text.curate_corpus(spark, sf_small)
    curated.write.partitionBy("lang").mode("overwrite").parquet(out_path)

    back = spark.read.parquet(out_path)
    assert back.count() == curated.count()
    # partition pruning works on the written layout
    one_lang = back.filter(F.col("lang") == "en")
    plan = explain.formatted_plan(one_lang)
    assert "PartitionFilters" in plan
    assert one_lang.count() == curated.filter(F.col("lang") == "en").count()
    # values survive the roundtrip (column order may differ)
    cols = sorted(curated.columns)
    assert sorted(map(tuple, back.select(*cols).collect())) == sorted(
        map(tuple, curated.select(*cols).collect())
    )


def _hottest_phash_bucket(spark, sf_dir):
    from pyspark.sql import functions as F

    from real_time_big_data_architect_spark.operators import multimodal as M

    sigs = M.media_phash(spark, sf_dir)
    buckets = sigs.select(
        F.posexplode(
            F.array(*[F.col(f"band{i}") for i in range(M.PHASH_BANDS)])
        ).alias("band", "bucket")
    )
    return (
        buckets.groupBy("band", "bucket")
        .count()
        .agg(F.max("count").alias("mx"))
        .first()
        .mx
    )


def test_phash_buckets_under_cap_where_oracle_runs(spark):
    """ADVICE r7: media_phash_dedup's oracle is exact all-pairs while
    its operator carries the hot-bucket chain guard — the two agree
    exactly IFF every band bucket stays under LSH_BUCKET_CAP. Assert
    that invariant at the SFs where hash comparison actually executes:
    sf0.01 (driver + preflight differential) and sf0.001 (this suite's
    exact-equality test)."""
    from real_time_big_data_architect_spark.operators.dedup import (
        LSH_BUCKET_CAP,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        hottest = _hottest_phash_bucket(spark, sf_dir)
        assert hottest <= LSH_BUCKET_CAP, (
            f"{sf_dir}: hottest phash bucket {hottest} exceeds the"
            f" {LSH_BUCKET_CAP} cap — the exact all-pairs oracle no"
            " longer matches the chain-guarded operator at this SF"
        )


def test_phash_guard_bound_at_bench_sf(spark):
    """At sf0.1 (bench/sweep — query runs, no oracle diff) the corpus
    DOES carry an over-cap bucket, so the chain guard is active by
    design there; what must hold is the guard's own contract: pair
    count ≤ n·k·bands and no member of an over-cap bucket orphaned.
    (The exactness claim is only made where the previous test pins
    under-cap buckets.)"""
    from real_time_big_data_architect_spark.operators import multimodal as M
    from real_time_big_data_architect_spark.operators.dedup import (
        LSH_CHAIN_NEIGHBORS,
    )

    sf_dir = "/root/testdata/sf0.1"
    sigs = M.media_phash(spark, sf_dir)
    n = sigs.count()
    n_pairs = M.media_phash_dedup(spark, sf_dir).count()
    assert n_pairs <= n * LSH_CHAIN_NEIGHBORS * M.PHASH_BANDS


def test_estimate_rows_footer_stats(spark, sf_small, tmp_path_factory):
    """estimate_rows reads parquet footers only: exact on fixture
    tables (single file and multi-file), and submits ZERO Spark jobs —
    the point of replacing the graph loops' per-invocation count()
    (r8 verdict item 6)."""
    import shutil
    import real_time_big_data_architect_spark.tables as T

    for name in ("events", "documents", "embeddings"):
        assert T.estimate_rows(sf_small, name) == load_table(
            spark, sf_small, name
        ).count()

    # multi-file directory table: still exact under the footer budget
    d = tmp_path_factory.mktemp("est_rows")
    load_table(spark, sf_small, "events").repartition(4).write.parquet(
        str(d / "events.parquet")
    )
    assert T.estimate_rows(str(d), "events") == load_table(
        spark, sf_small, "events"
    ).count()

    # sampled branch (> ROWS_SAMPLE_FOOTERS files): byte-extrapolated
    # estimate must land within a few percent on near-uniform splits —
    # loop sizing needs the order of magnitude, not exactness
    d32 = tmp_path_factory.mktemp("est_rows_sampled")
    ev = load_table(spark, sf_small, "events")
    exact = ev.count()
    ev.repartition(4 * T.ROWS_SAMPLE_FOOTERS).write.parquet(
        str(d32 / "events.parquet")
    )
    est = T.estimate_rows(str(d32), "events")
    assert abs(est - exact) <= max(1, exact // 10), (est, exact)

    # job-free: cold estimate triggers no Spark job
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None) or []
    T._ROWS_CACHE.clear()
    T.estimate_rows(sf_small, "events")
    after = tracker.getJobIdsForGroup(None) or []
    assert len(after) == len(before)
    shutil.rmtree(str(d), ignore_errors=True)
    shutil.rmtree(str(d32), ignore_errors=True)
