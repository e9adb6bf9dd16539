"""Lakehouse mutation patterns — MERGE upsert and SCD2 history.

The reference has no persistence at all (each tick recomputes and
discards, app.py:37); a lake-backed engine needs the two standard
mutation idioms, both expressed as pure joins/windows so they run
anywhere Spark runs:

* ``merge_upsert`` — MERGE INTO semantics (update-on-match,
  insert-on-no-match) as a full-outer join + coalesce. This is the
  copy-on-write kernel inside Delta/Iceberg MERGE: one shuffle on the
  merge key for each side, no driver involvement, and at 100 TB both
  sides partition on the same key so AQE plans a co-located join. The
  change-set here is derived deterministically from the base table
  (every 7th key updated, every 11th inserted under a shifted key) so
  the oracle can rebuild it exactly.

* ``scd2_history`` — a slowly-changing-dimension type-2 build: collapse
  an event log into attribute versions with [valid_from, valid_to)
  ranges via lag-change detection + lead. Two windows over the same
  (user_id) partitioning — one shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.tables import load_table

#: deterministic change-set rules (mirrored in the oracle SQL)
UPDATE_MOD = 7
INSERT_MOD = 11
INSERT_REMAINDER = 3
INSERT_KEY_SHIFT = 100_000_000


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO orders: update matched keys, insert unmatched ones."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = base.filter(F.col("o_orderkey") % UPDATE_MOD == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("R").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
    )
    inserts = base.filter(
        F.col("o_orderkey") % INSERT_MOD == INSERT_REMAINDER
    ).select(
        (F.col("o_orderkey") + INSERT_KEY_SHIFT).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    changes = updates.unionAll(inserts)
    b = base.alias("b")
    c = changes.alias("c")
    return b.join(c, "o_orderkey", "full_outer").select(
        "o_orderkey",
        F.coalesce(F.col("c.o_custkey"), F.col("b.o_custkey")).alias(
            "o_custkey"
        ),
        F.coalesce(F.col("c.o_orderstatus"), F.col("b.o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.coalesce(F.col("c.o_totalprice"), F.col("b.o_totalprice")).alias(
            "o_totalprice"
        ),
        F.when(F.col("b.o_custkey").isNull(), F.lit("insert"))
        .when(F.col("c.o_custkey").isNotNull(), F.lit("update"))
        .otherwise(F.lit("keep"))
        .alias("merge_action"),
    )


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2: per-user event_type versions with validity ranges.

    A version starts whenever the attribute differs from its lag;
    ``valid_to`` is the next version's start (NULL = current). Change
    detection and the lead both run over the ``user_id`` partitioning,
    so the whole build is one shuffle + two in-stage sorts.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    flagged = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    wv = W.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    return flagged.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wv).alias("valid_to"),
        F.row_number().over(wv).alias("version"),
    )


def _morton_sql(a: str, b: str) -> str:
    """Z-order key: interleave the low 16 bits of two dimensions.

    Plain BIGINT shifts/masks — identical tokens run in Spark SQL and
    DuckDB, so the layout is oracle-exact. (Final spread step inlined
    per dimension; b's bits land in the odd positions.)
    """
    def spread(x: str) -> str:
        s1 = f"(({x} | ({x} << 8)) & 16711935)"
        s2 = f"(({s1} | ({s1} << 4)) & 252645135)"
        s3 = f"(({s2} | ({s2} << 2)) & 858993459)"
        return f"(({s3} | ({s3} << 1)) & 1431655765)"

    return f"({spread(a)} | ({spread(b)} << 1))"


N_ZFILES = 64


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering of orders on (custkey, order day) —
    the Delta/Iceberg ZORDER write path — plus the per-file min/max
    statistics that make it pay (NS8).

    Each order's key interleaves the low 16 bits of ``o_custkey`` and
    its epoch-day, orders land in ``N_ZFILES`` files by proportional
    key range (integer arithmetic — a map-side assignment against one
    broadcast scalar, NOT a global sort), and the output is the
    data-skipping index: per-file row count and min/max of BOTH
    dimensions. Because Z-ordering keeps both dims locally compact, a
    reader filtering on either column prunes most files from this
    table alone. At 100 TB the same expression feeds
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)``.
    """
    o = load_table(spark, sf_dir, "orders")
    day = "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
    base = o.select("o_custkey", F.expr(day).alias("order_day"))
    # normalize both dims to dense 0..255 coordinates (integer
    # arithmetic against one broadcast min/max row) so the interleave
    # fills the key space whatever the raw value ranges are
    bounds = base.agg(
        F.min("o_custkey").alias("minc"),
        F.max("o_custkey").alias("maxc"),
        F.min("order_day").alias("mind"),
        F.max("order_day").alias("maxd"),
    )
    qc = "((o_custkey - minc) * 256) DIV (maxc - minc + 1)"
    qd = "((order_day - mind) * 256) DIV (maxd - mind + 1)"
    zkey = _morton_sql(f"({qc})", f"({qd})")
    return (
        base.crossJoin(F.broadcast(bounds))
        .select(
            "o_custkey",
            "order_day",
            F.expr(
                f"CAST((({zkey}) * {N_ZFILES}) DIV 65536 AS INT)"
            ).alias("file_id"),
        )
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min("order_day").alias("min_day"),
            F.max("order_day").alias("max_day"),
        )
    )


#: compaction planning: synthetic file listing granularity and the
#: target compacted-file size (bytes; fixture-scaled — the real knob is
#: 128 MB-1 GB). Next-fit-decreasing within a table partition is the
#: OPTIMIZE bin-packing every lakehouse ships.
COMPACT_FILE_SPAN = 250
COMPACT_TARGET_BYTES = 16_384
COMPACT_ROW_BYTES = 64


def compaction_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction PLAN (Delta OPTIMIZE / Iceberg rewrite
    bin-packing, NS8): group a partition's undersized files into
    target-size bins, emitting the per-bin manifest a compactor would
    execute.

    The file listing is synthesized deterministically from orders
    (one "file" per (o_orderpriority, orderkey span), size = rows ×
    COMPACT_ROW_BYTES — metadata-sized, like a real manifest). Packing
    is next-fit-decreasing: files sort by (bytes DESC, file_id) WITHIN
    their table partition and bin = exclusive-prefix-bytes DIV target —
    one window per PARTITION key (never a global sort; a lakehouse
    compacts partitions independently, which is exactly what keeps
    this scale-free: the window's population is one partition's file
    count). Deterministic throughout — the oracle replays the listing,
    the sort, and the prefix arithmetic.
    """
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    files = (
        o.groupBy(
            F.col("o_orderpriority").alias("part"),
            F.expr(f"o_orderkey DIV {COMPACT_FILE_SPAN}").alias("file_id"),
        )
        .agg(F.count("*").alias("n_rows"))
        .select(
            "part",
            "file_id",
            "n_rows",
            (F.col("n_rows") * COMPACT_ROW_BYTES).alias("bytes"),
        )
    )
    w = (
        W.partitionBy("part")
        .orderBy(F.col("bytes").desc(), F.col("file_id"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # exclusive prefix bytes DIV target = next-fit bin. Exact 64-bit
    # integer division (matching the oracle's //): a double hop would
    # round prefixes past 2^53 — reachable for a 100 TB-class
    # partition's manifest — into the adjacent bin.
    prefix = F.coalesce(F.sum("bytes").over(w), F.lit(0))
    binned = (
        files.withColumn("__prefix", prefix)
        .withColumn(
            "bin_id", F.expr(f"__prefix DIV {COMPACT_TARGET_BYTES}")
        )
        .drop("__prefix")
    )
    return binned.groupBy("part", "bin_id").agg(
        F.count("*").alias("n_files"),
        F.sum("n_rows").alias("total_rows"),
        F.sum("bytes").alias("bin_bytes"),
        F.min("file_id").alias("first_file"),
        F.max("file_id").alias("last_file"),
    )


#: cdc_diff change-set rules (mirrored in the oracle SQL)
CDC_DELETE_MOD = 11
CDC_DELETE_R = 3
CDC_UPDATE_MOD = 7
CDC_INSERT_MOD = 13
CDC_INSERT_R = 5


def cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture feed between two table snapshots — Delta
    CDF semantics (``insert`` / ``delete`` / ``update_preimage`` /
    ``update_postimage`` rows), derived purely by DIFFING the
    snapshots, not by replaying the writes: the recovery path when a
    table has no change log, and the verification path when it does.

    v2 applies a deterministic change set to orders (deletes, updates,
    shifted-key inserts — so the oracle rebuilds it exactly); the feed
    itself is one full-outer join on the key + row classification, and
    updates emit their pre- and post-image. One co-partitioned shuffle
    per side at any scale; unchanged rows never leave the join.
    Insert keys shift past max(o_orderkey), collision-free at any SF.
    """
    v1 = _cdc_v1(spark, sf_dir)
    return _cdc_feed(v1, _cdc_v2(v1))


def _cdc_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def _cdc_v2(v1: DataFrame) -> DataFrame:
    """The deterministic v2 snapshot cdc_diff diffs against."""
    key = F.col("o_orderkey")
    is_del = key % CDC_DELETE_MOD == CDC_DELETE_R
    is_upd = (key % CDC_UPDATE_MOD == 0) & ~is_del
    survivors = v1.filter(~is_del).select(
        "o_orderkey",
        F.when(is_upd, F.lit("R")).otherwise(F.col("o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.when(is_upd, F.col("o_totalprice") + F.lit(100.0))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    # insert keys shift by max(key)+1 — collision-free at every SF,
    # unlike any fixed constant (TPC-H orderkeys reach 6e6·SF); the
    # 1-row max broadcasts, the oracle mirrors it as a scalar subquery
    mx = v1.agg(F.max(key).alias("mx"))
    inserts = (
        v1.filter(key % CDC_INSERT_MOD == CDC_INSERT_R)
        .crossJoin(F.broadcast(mx))
        .select(
            (key + F.col("mx") + F.lit(1)).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice",
        )
    )
    return survivors.unionAll(inserts)


def _cdc_feed(v1: DataFrame, v2: DataFrame) -> DataFrame:
    """Classify every joined key in ONE pass over ONE full-outer join.

    The former shape unioned four filtered branches over the same
    join expression — Catalyst does not share the subtree across
    union branches, so the v1⋈v2 SortMergeJoin (both snapshot
    shuffles included) executed four times per feed build (r12
    measured: 0.91 s → 0.58 s at sf0.1, and at 100 TB it is four
    snapshot-sized shuffle pairs collapsed to one). Each row now
    classifies through one CASE — branch order preserves the original
    filters' semantics exactly (insert: no preimage; delete: no
    postimage; update: both present and any field differs) — and
    updates explode into their pre-/post-image pair; unchanged keys
    carry an empty array that explode() drops. Row multiset is
    identical (order-insensitive oracle; verified row-for-row)."""
    # explicit per-side presence markers (r12 advice): classifying on
    # o_orderstatus nullability would misread a genuinely-NULL status
    # as side-absence (unreachable with TPC-H snapshots, but the
    # null-as-absence convention was order-sensitive); a lit(true)
    # flag column is NULL after the full-outer join exactly when the
    # side had no row, independent of payload nullability
    a = v1.withColumn("__a", F.lit(True)).alias("a")
    b = v2.withColumn("__b", F.lit(True)).alias("b")
    j = a.join(b, "o_orderkey", "full_outer")

    def _img(tag: str, side: str):
        return F.struct(
            F.lit(tag).alias("change_type"),
            F.col(f"{side}.o_orderstatus").alias("o_orderstatus"),
            F.col(f"{side}.o_totalprice").alias("o_totalprice"),
        )

    rows = (
        F.when(F.col("a.__a").isNull(), F.array(_img("insert", "b")))
        .when(F.col("b.__b").isNull(), F.array(_img("delete", "a")))
        .when(
            (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
            | (F.col("a.o_totalprice") != F.col("b.o_totalprice")),
            F.array(_img("update_preimage", "a"), _img("update_postimage", "b")),
        )
        .otherwise(F.array())
    )
    return j.select("o_orderkey", F.explode(rows).alias("c")).select(
        "o_orderkey", "c.change_type", "c.o_orderstatus", "c.o_totalprice"
    )


def snapshot_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time restore by INVERSE-applying the CDC feed: from the
    v2 snapshot and the cdc_diff change feed, reconstruct v1 exactly —
    time travel for tables that keep a change feed instead of full
    snapshot copies (and the completeness proof for the feed itself:
    the oracle is simply the original table, so a single missing or
    mis-classified change row breaks the hash).

    Inverse rules: drop inserted and update_postimage keys (one LEFT
    ANTI on the key), add back delete and update_preimage rows (a
    union). Both legs are key-join/union shapes co-partitioned on the
    snapshot key — same one-shuffle discipline as cdc_diff at 100 TB.
    """
    v1 = _cdc_v1(spark, sf_dir)
    v2 = _cdc_v2(v1)
    feed = _cdc_feed(v1, v2)
    forward_keys = feed.filter(
        F.col("change_type").isin("insert", "update_postimage")
    ).select("o_orderkey")
    back_rows = feed.filter(
        F.col("change_type").isin("delete", "update_preimage")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    return (
        v2.join(forward_keys, "o_orderkey", "left_anti")
        .unionAll(back_rows)
    )


def scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-SCD2 as-of lookup: join each purchase to the dimension
    version VALID AT its timestamp (valid_from ≤ ts < valid_to, open
    current version) — the canonical 'which address/plan/price was in
    effect' join every warehouse runs against a type-2 dimension.

    The join keys on user_id (equi) with the validity range as a
    residual predicate — one shuffle on user_id and a per-user range
    scan of that user's handful of versions; zero-width versions
    (same-timestamp changes) match nothing and the half-open interval
    makes every fact row match EXACTLY one version. At 100 TB both
    sides bucket by the dimension's natural key.
    """
    ev = load_table(spark, sf_dir, "events")
    dim = scd2_history(spark, sf_dir).withColumnRenamed(
        "event_type", "version_type"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        p.join(
            dim,
            (p["user_id"] == dim["user_id"])
            & (dim["valid_from"] <= p["ts"])
            & (dim["valid_to"].isNull() | (p["ts"] < dim["valid_to"])),
        )
        .select(
            "event_id",
            p["user_id"].alias("user_id"),
            "ts",
            "version_type",
            "valid_from",
            "version",
        )
    )


def golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-level survivorship: merge duplicate records into one
    golden row per entity — the step AFTER record_linkage clusters
    duplicates (longest-name rule, max balance, source-priority
    segment).

    Three deterministic damaged variants per customer are planted (one
    nulls the balance, one truncates the name, one uppercases it and
    nulls the segment — the oracle plants byte-identical damage); the
    merge is ONE groupBy with struct-ordered aggregates: max(struct(
    len, name)) picks the longest-then-lexicographic-max name without
    a window or self-join, min(struct(priority, value)) implements
    source-priority coalesce. One shuffle on the entity key, constant
    state per key.
    """
    c = load_table(spark, sf_dir, "customer")
    variants = c.crossJoin(
        F.broadcast(spark.range(3).select(F.col("id").cast("int").alias("src")))
    ).select(
        "c_custkey",
        "src",
        F.when(F.col("src") == 1,
               F.expr("substring(c_name, 1, length(c_name) - 3)"))
        .when(F.col("src") == 2, F.upper("c_name"))
        .otherwise(F.col("c_name"))
        .alias("name_v"),
        F.when(F.col("src") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal").cast("double"))
        .alias("bal_v"),
        F.when(F.col("src") == 2, F.lit(None).cast("string"))
        .when(F.col("src") == 0, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg_v"),
    )
    name_pick = F.max(
        F.struct(F.length("name_v").alias("l"), F.col("name_v").alias("n"))
    )["n"]
    seg_pick = F.min(
        F.when(
            F.col("seg_v").isNotNull(),
            F.struct(F.col("src").alias("p"), F.col("seg_v").alias("t")),
        )
    )["t"]
    return variants.groupBy("c_custkey").agg(
        name_pick.alias("golden_name"),
        F.max("bal_v").alias("golden_acctbal"),
        seg_pick.alias("golden_segment"),
        F.count("*").alias("n_sources"),
    )


QUERIES = {
    "merge_upsert": merge_upsert,
    "scd2_history": scd2_history,
    "scd2_lookup": scd2_lookup,
    "zorder_layout": zorder_layout,
    "compaction_binpack": compaction_binpack,
    "cdc_diff": cdc_diff,
    "snapshot_restore": snapshot_restore,
    "golden_record": golden_record,
}

def _zorder_oracle() -> str:
    day = "datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"
    qc = "((o_custkey - minc) * 256) // (maxc - minc + 1)"
    qd = "((order_day - mind) * 256) // (maxd - mind + 1)"
    zkey = _morton_sql(f"({qc})", f"({qd})")
    return f"""
        WITH base AS (
            SELECT o_custkey, {day} AS order_day FROM orders
        ),
        bounds AS (
            SELECT MIN(o_custkey) AS minc, MAX(o_custkey) AS maxc,
                   MIN(order_day) AS mind, MAX(order_day) AS maxd
            FROM base
        )
        SELECT CAST((({zkey}) * {N_ZFILES}) // 65536 AS INT) AS file_id,
               COUNT(*) AS n_rows,
               MIN(o_custkey) AS min_cust,
               MAX(o_custkey) AS max_cust,
               MIN(order_day) AS min_day,
               MAX(order_day) AS max_day
        FROM base, bounds
        GROUP BY 1
    """


ORACLE = {
    # the restore must reproduce the ORIGINAL table bit-for-bit — the
    # strongest possible oracle: no reconstruction arithmetic at all
    "snapshot_restore": """
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    """,
    "scd2_lookup": """
        WITH flagged AS (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        versions AS (
            SELECT user_id, event_type, ts, event_id
            FROM flagged
            WHERE prev_type IS NULL OR prev_type <> event_type
        ),
        dim AS (
            SELECT user_id, event_type AS version_type,
                   ts AS valid_from,
                   LEAD(ts) OVER w AS valid_to,
                   CAST(ROW_NUMBER() OVER w AS INT) AS version
            FROM versions
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT p.event_id, p.user_id, p.ts,
               d.version_type, d.valid_from, d.version
        FROM events p
        JOIN dim d
          ON p.user_id = d.user_id
         AND d.valid_from <= p.ts
         AND (d.valid_to IS NULL OR p.ts < d.valid_to)
        WHERE p.event_type = 'purchase'
    """,
    "golden_record": """
        WITH variants AS (
            SELECT c_custkey, src,
                   CASE WHEN src = 1
                        THEN substr(c_name, 1, length(c_name) - 3)
                        WHEN src = 2 THEN upper(c_name)
                        ELSE c_name END AS name_v,
                   CASE WHEN src = 0 THEN NULL
                        ELSE CAST(c_acctbal AS DOUBLE) END AS bal_v,
                   CASE WHEN src = 2 THEN NULL
                        WHEN src = 0 THEN lower(c_mktsegment)
                        ELSE c_mktsegment END AS seg_v
            FROM customer,
                 (SELECT CAST(unnest(range(3)) AS INT) AS src)
        )
        SELECT c_custkey,
               (MAX(struct_pack(l := length(name_v), n := name_v))).n
                   AS golden_name,
               MAX(bal_v) AS golden_acctbal,
               (MIN(CASE WHEN seg_v IS NOT NULL
                    THEN struct_pack(p := src, t := seg_v) END)).t
                   AS golden_segment,
               CAST(COUNT(*) AS BIGINT) AS n_sources
        FROM variants GROUP BY c_custkey
    """,
    "cdc_diff": f"""
        WITH v1 AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        ),
        v2 AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % {CDC_UPDATE_MOD} = 0
                        THEN 'R' ELSE o_orderstatus END AS o_orderstatus,
                   CASE WHEN o_orderkey % {CDC_UPDATE_MOD} = 0
                        THEN o_totalprice + 100.0
                        ELSE o_totalprice END AS o_totalprice
            FROM v1
            WHERE NOT (o_orderkey % {CDC_DELETE_MOD} = {CDC_DELETE_R})
            UNION ALL
            SELECT o_orderkey + (SELECT MAX(o_orderkey) + 1 FROM v1),
                   'N', o_totalprice
            FROM v1
            WHERE o_orderkey % {CDC_INSERT_MOD} = {CDC_INSERT_R}
        ),
        j AS (
            SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
                   a.o_orderstatus AS a_status, a.o_totalprice AS a_price,
                   b.o_orderstatus AS b_status, b.o_totalprice AS b_price
            FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
        )
        SELECT o_orderkey, 'insert' AS change_type,
               b_status AS o_orderstatus, b_price AS o_totalprice
        FROM j WHERE a_status IS NULL
        UNION ALL
        SELECT o_orderkey, 'delete', a_status, a_price
        FROM j WHERE b_status IS NULL
        UNION ALL
        SELECT o_orderkey, 'update_preimage', a_status, a_price
        FROM j WHERE a_status IS NOT NULL AND b_status IS NOT NULL
          AND (a_status <> b_status OR a_price <> b_price)
        UNION ALL
        SELECT o_orderkey, 'update_postimage', b_status, b_price
        FROM j WHERE a_status IS NOT NULL AND b_status IS NOT NULL
          AND (a_status <> b_status OR a_price <> b_price)
    """,
    "zorder_layout": _zorder_oracle(),
    "compaction_binpack": f"""
        WITH files AS (
            SELECT o_orderpriority AS part,
                   o_orderkey // {COMPACT_FILE_SPAN} AS file_id,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) * {COMPACT_ROW_BYTES} AS BIGINT) AS bytes
            FROM orders GROUP BY 1, 2
        ),
        binned AS (
            SELECT *,
                   COALESCE(SUM(bytes) OVER (
                       PARTITION BY part
                       ORDER BY bytes DESC, file_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) // {COMPACT_TARGET_BYTES} AS bin_id
            FROM files
        )
        SELECT part, CAST(bin_id AS BIGINT) AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(n_rows) AS BIGINT) AS total_rows,
               CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
               MIN(file_id) AS first_file,
               MAX(file_id) AS last_file
        FROM binned GROUP BY part, bin_id
    """,
    "merge_upsert": """
        WITH base AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM orders
        ),
        changes AS (
            SELECT o_orderkey, o_custkey,
                   'R' AS o_orderstatus,
                   o_totalprice + 100.0 AS o_totalprice
            FROM base WHERE o_orderkey % 7 = 0
            UNION ALL
            SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice
            FROM base WHERE o_orderkey % 11 = 3
        )
        SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
               COALESCE(c.o_custkey, b.o_custkey) AS o_custkey,
               COALESCE(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
               COALESCE(c.o_totalprice, b.o_totalprice) AS o_totalprice,
               CASE WHEN b.o_custkey IS NULL THEN 'insert'
                    WHEN c.o_custkey IS NOT NULL THEN 'update'
                    ELSE 'keep' END AS merge_action
        FROM base b FULL OUTER JOIN changes c USING (o_orderkey)
    """,
    "scd2_history": """
        WITH flagged AS (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        versions AS (
            SELECT user_id, event_type, ts, event_id
            FROM flagged
            WHERE prev_type IS NULL OR prev_type <> event_type
        )
        SELECT user_id, event_type,
               ts AS valid_from,
               LEAD(ts) OVER w AS valid_to,
               CAST(ROW_NUMBER() OVER w AS INT) AS version
        FROM versions
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
}
