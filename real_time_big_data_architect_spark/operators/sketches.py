"""Mergeable sketches and integrity checksums (north star NS2/NS6f).

The reference computes nothing sketch-like (its whole analytics surface
is ≤50-row pandas ops, app.py:192-247); these are the constant-memory
summaries a 100 TB pipeline runs where exact state would not fit or
where two systems must agree on content without moving data:

- **count-min sketch heavy hitters** — a d×w counter matrix replaces a
  full word histogram: the sketch is CONSTANT size regardless of corpus
  scale, partial sketches from every partition merge by addition (the
  groupBy), and point estimates are the min over d counters. Hash =
  md5-derived (portable: DuckDB replays the identical construction), so
  unlike the xxhash-seeded LSH family this sketch is oracle-EXACT.
- **order-insensitive table checksum** — sum of per-row md5 digests:
  two engines (or two snapshots) agree iff contents agree, no sort, no
  data movement beyond one agg. The anti-entropy primitive for lake
  replication.
- **per-key skew diagnostics** — the count-distribution probe you run
  BEFORE a big join to decide salting/AQE posture; one shuffle on the
  join key, constant-size output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.tables import fan_out, load_table

CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 1024  # counters per row
CMS_TOPK = 20  # heavy hitters to estimate


def _md5_prefix_bigint(col, ndigits: int):
    """First ``ndigits`` hex digits of md5 as a bigint — the module's
    portable-hash convention, defined ONCE (r10 review: three hand
    copies had to stay in lockstep with the DuckDB mirror idiom
    ``('0x' || substr(md5(..), 1, n))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, ndigits), 16, 10).cast(
        "bigint"
    )



def _cms_bucket(word, seed: int):
    """Portable bucket hash: first 8 md5 hex digits mod width.

    Identical in both engines: md5 of the UTF-8 seed:word string, hex →
    int (Spark ``conv``, DuckDB ``'0x'||…`` cast), mod width. md5 costs
    more than xxhash64 but buys a cross-engine-exact sketch; swap in
    xxhash64 at production scale where the oracle isn't replaying.
    """
    h = _md5_prefix_bigint(F.concat_ws(":", F.lit(str(seed)), word), 8)
    return F.pmod(h, F.lit(CMS_WIDTH))


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch estimates for the corpus's top words (NS2).

    Build: one token explode → word histogram (the same aggregation the
    exact top-k needs anyway) → each DISTINCT word emits its
    ``CMS_DEPTH`` (row, bucket) coordinates weighted by its count →
    groupBy sums = the sketch (4×1024 cells, constant size at any
    corpus scale; partial aggregation merges per-partition sketches
    map-side). Hashing per distinct word instead of per occurrence cuts
    the md5 work by the corpus's repetition factor — measured 1.68 s →
    0.64 s at sf0.1 with identical output. Probe: the exact top-20
    words (ties broken by word) look up their d counters via a
    broadcast join against the 4096-row sketch; estimate =
    min(counter) ≥ true count, with equality when no collision — both
    columns returned so the overestimate property is visible and
    oracle-checked.
    """
    d = load_table(spark, sf_dir, "documents")
    hist = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_exact"))
    )
    coords = hist.select(
        "n_exact",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("word"), s) for s in range(CMS_DEPTH)])
        ).alias("row", "bucket"),
    )
    sketch = coords.groupBy("row", "bucket").agg(
        F.sum("n_exact").alias("counter")
    )

    top = hist.orderBy(F.col("n_exact").desc(), F.col("word")).limit(CMS_TOPK)
    probes = top.select(
        "word",
        "n_exact",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("word"), s) for s in range(CMS_DEPTH)])
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("word", "n_exact")
        .agg(F.min("counter").alias("n_est"))
    )


#: orders columns with cross-engine-stable string form (ints, strings,
#: dates — no floats, whose repr differs between engines)
_CHECKSUM_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")


def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content checksum of the orders table (NS8).

    Each row folds to an 8-hex-digit md5 digest; the table checksum is
    the SUM of digests (commutative → partition-order-independent) plus
    the row count. Verifying a 100 TB replica is one scan + one scalar
    agg on each side and an 8-byte comparison — the anti-entropy check
    used by every replicated lake. Digest inputs are the
    stable-serialization columns only (ints/strings/dates).
    """
    o = load_table(spark, sf_dir, "orders")
    # o_orderdate is a timestamp: force an explicit second-precision
    # format (both engines' default VARCHAR casts differ on fractional
    # seconds) so the digest bytes agree. NULL cells serialize to an
    # explicit sentinel — concat_ws would silently SKIP them (making
    # "a|NULL|b" collide with "a|b" and diverging from the oracle's
    # NULL-propagating || chain).
    parts = [
        F.coalesce(
            F.date_format(F.col(c), "yyyy-MM-dd HH:mm:ss")
            if c == "o_orderdate"
            else F.col(c).cast("string"),
            F.lit("\\N"),
        )
        for c in _CHECKSUM_COLS
    ]
    row_digest = _md5_prefix_bigint(F.concat_ws("|", *parts), 8)
    return o.agg(
        F.count("*").alias("n_rows"),
        F.sum(row_digest).alias("content_checksum"),
    )


def skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for lineitem.l_orderkey (NS2).

    Per-key counts (one shuffle) reduced to the distribution summary
    that decides a join strategy at 100 TB: key count, total rows,
    max/avg rows per key and their ratio (the skew factor AQE's
    skewJoin threshold keys on). All-integer arithmetic except the
    final ratios, which divide exact sums — oracle-exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("total_rows"),
        F.max("n").alias("max_per_key"),
        (F.sum("n").cast("double") / F.count("*")).alias("avg_per_key"),
        (
            F.max("n").cast("double") / (F.sum("n").cast("double") / F.count("*"))
        ).alias("skew_ratio"),
    )


def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance over events (NS8).

    The per-event_type revenue view is refreshed from (base state +
    delta batch) instead of a full recompute: base = events before the
    cutoff (the previously materialized agg), delta = the new arrivals,
    merged by full-outer coalesce-sum. At 100 TB the delta is hours,
    the base is years — refresh cost tracks the DELTA size only. The
    oracle recomputes the view directly over all events, proving
    incremental ≡ full (sums in exact decimal so the merge order can't
    drift the hash).
    """
    ev = load_table(spark, sf_dir, "events")
    # cutoff INSIDE the fixture's data range (events span 2024-01-01 →
    # 2024-01-30): the old 2024-06-01 cutoff put 100% of rows in base
    # and made the delta leg empty on every fixture — the oracle then
    # certified the merge vacuously (r10 review finding). With ~1/3 of
    # rows in the delta, the full-outer coalesce-sum actually executes
    # under the incremental ≡ full-recompute differential.
    cutoff = "2024-01-20 00:00:00"
    dec = lambda c: F.sum(F.col(c).cast("decimal(30,4)"))  # noqa: E731
    base = (
        ev.filter(F.col("ts") < F.lit(cutoff).cast("timestamp"))
        .groupBy("event_type")
        .agg(dec("value").alias("sum_value"), F.count("*").alias("n_events"))
    )
    # NULL ts routes to the delta leg explicitly (r11 adversarial
    # finding): ts only PARTITIONS rows between the legs — the view's
    # key is event_type — and a bare >= leaves NULL-ts rows in NEITHER
    # leg, silently breaking the incremental ≡ full-recompute invariant
    # the oracle certifies
    delta = (
        ev.filter(
            (F.col("ts") >= F.lit(cutoff).cast("timestamp"))
            | F.col("ts").isNull()
        )
        .groupBy("event_type")
        .agg(dec("value").alias("d_sum_value"), F.count("*").alias("d_n_events"))
    )
    zero = F.lit(0).cast("decimal(30,4)")
    # SQL SUM of an all-NULL group is NULL — a bare coalesce-sum would
    # turn it into 0.0 and diverge from the full recompute (adversarial
    # differential find); NULL survives only when BOTH sides are NULL
    merged_sum = F.when(
        F.col("sum_value").isNull() & F.col("d_sum_value").isNull(),
        F.lit(None).cast("decimal(30,4)"),
    ).otherwise(
        F.coalesce(F.col("sum_value"), zero)
        + F.coalesce(F.col("d_sum_value"), zero)
    )
    # Null-safe merge key (r11 advisor finding): a USING/equi full-outer
    # never matches NULL event_type keys, so a NULL-type group present
    # on BOTH sides of the cutoff would emit two NULL rows where the
    # full recompute's single GROUP BY emits one — breaking the
    # incremental ≡ full invariant. eqNullSafe (<=>) treats NULL as a
    # joinable key value; the output key coalesces the two sides.
    b = base.alias("b")
    d = delta.alias("d")
    return (
        b.join(d, F.col("b.event_type").eqNullSafe(F.col("d.event_type")), "full_outer")
        .select(
            F.coalesce(F.col("b.event_type"), F.col("d.event_type")).alias(
                "event_type"
            ),
            merged_sum.cast("double").alias("sum_value"),
            (
                F.coalesce(F.col("n_events"), F.lit(0))
                + F.coalesce(F.col("d_n_events"), F.lit(0))
            ).alias("n_events"),
        )
    )


#: columns profiled by profile_table (all of orders)
#: HyperLogLog geometry: 256 registers (standard error 1.04/√256 ≈
#: 6.5%), hash = first 15 md5 hex digits (60 bits: 8 bucket + 52 rank).
HLL_M = 256
HLL_WBITS = 52
#: bias constant α_m for m=256, precomputed in Python doubles and
#: emitted as a repr literal on both sides (writing the formula in SQL
#: would evaluate in DuckDB DECIMAL arithmetic and diverge)
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
#: linear-counting table: m·ln(m/V) for V = 1..m zero registers. The
#: low-range correction needs ln(); libm is not cross-engine
#: bit-stable, but V is an integer in [1, m] — so the ≤256 possible
#: values are precomputed HERE in Python doubles and both engines just
#: index the literal array. Correction applies when raw ≤ 2.5·m and
#: V > 0 (the standard HLL regime switch).
import math as _math

HLL_LINEAR = [
    float(HLL_M) * _math.log(HLL_M / v) for v in range(1, HLL_M + 1)
]
HLL_RAW_CUTOFF = 2.5 * HLL_M


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch built RELATIONALLY — the
    mergeable cardinality summary, next to the exact count so the
    estimate is auditable. The small-range linear-counting correction
    IS applied (raw ≤ 2.5·m with zero registers): its ln() values are
    precomputed in Python over the ≤256 possible integer inputs and
    emitted as literals on both sides (``HLL_LINEAR``), so libm never
    runs inside either engine and the hash gate holds.

    Everything is integer/bit arithmetic until one final division:
    register rank = 53 − length(bin(w)) (binary-string length, not
    floor(log2)), registers = max per (type, bucket) — a partial-agg
    shuffle whose state is ≤ m rows per type REGARDLESS of input size,
    which is the entire point of the sketch at 100 TB. The harmonic sum
    Σ2^−M is rescaled to the exact integer Σ2^(53−M) accumulated in
    DECIMAL(38,0) — order-independent, so the distributed sum is
    bit-stable. Registers merge across any partitioning by MAX (the
    mergeability test proves per-source ∪ == global).
    """
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    estimates = hll_estimate(spark, hll_registers(ev))
    return exact.join(estimates, "event_type").select(
        "event_type", "n_exact", "n_zero_regs", "hll_raw", "hll_estimate"
    )


def hll_registers(ev: DataFrame) -> DataFrame:
    """(event_type, bucket, m) HLL registers for an events relation —
    the mergeable state: registers from any partition/batch split
    max-merge to the global ones.

    NULL user_id never enters the sketch (r11 adversarial finding): it
    isn't a distinct user — COUNT(DISTINCT) excludes it on both sides —
    and the engines disagree on a NULL hash anyway (Spark concat is
    null-in/null-out; DuckDB concat SKIPS nulls, so the oracle's
    '0x'||md5(NULL) would crash the BIGINT cast)."""
    h = _md5_prefix_bigint(F.col("user_id").cast("string"), 15)
    parts = ev.filter(F.col("user_id").isNotNull()).select(
        "event_type", h.alias("h")
    ).select(
        "event_type",
        (F.col("h") % HLL_M).cast("int").alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.bin("w"))
    )
    return (
        parts.select("event_type", "bucket", rho.alias("r"))
        .groupBy("event_type", "bucket")
        .agg(F.max("r").cast("int").alias("m"))
    )


def hll_estimate(spark: SparkSession, regs: DataFrame) -> DataFrame:
    """(event_type, n_zero_regs, hll_raw, hll_estimate) from registers."""
    types = regs.select("event_type").distinct()
    spine = types.crossJoin(
        F.broadcast(
            spark.range(HLL_M).select(F.col("id").cast("int").alias("bucket"))
        )
    )
    full = spine.join(regs, ["event_type", "bucket"], "left").select(
        "event_type", F.coalesce("m", F.lit(0)).alias("m")
    )
    term = F.expr(
        f"CAST(shiftleft(CAST(1 AS BIGINT), {HLL_WBITS + 1} - m)"
        " AS DECIMAL(38,0))"
    )
    sums = full.groupBy("event_type").agg(
        F.sum(term).alias("s"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).alias("n_zero"),
    )
    raw = (
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(1 << (HLL_WBITS + 1)))
    ) / F.col("s").cast("double")
    # ONE parsed array literal (the r12 similarity discipline): the
    # former F.array(*[F.lit(x) ...]) built 256 Column objects through
    # ~514 py4j round trips per hll_estimate call — pure driver
    # latency. repr(float) round-trips to the identical double Spark's
    # lit() would ship, so the Catalyst literal array is bit-identical.
    lc = F.element_at(
        F.expr(
            "array(" + ", ".join(repr(x) + "D" for x in HLL_LINEAR) + ")"
        ),
        F.col("n_zero").cast("int"),
    )
    with_raw = sums.withColumn("hll_raw", raw)
    est = F.when(
        (F.col("hll_raw") <= F.lit(HLL_RAW_CUTOFF)) & (F.col("n_zero") > 0),
        lc,
    ).otherwise(F.col("hll_raw"))
    return with_raw.select(
        "event_type",
        F.col("n_zero").cast("bigint").alias("n_zero_regs"),
        "hll_raw",
        est.alias("hll_estimate"),
    )


def bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting via Spark 3.5 BITMAP aggregates — the
    Databricks bitmap-index pattern: user ids bucket into 32k-bit
    bitmaps (`bitmap_bucket_number` / `bitmap_bit_position`), each
    (type, bucket) OR-aggregates its bits map-side, and the per-type
    distinct count is the SUM of per-bucket popcounts.

    Why it matters at 100 TB: the shuffle carries one 4 KB bitmap per
    (group, 32k-id-range bucket) instead of every distinct raw id —
    and unlike HLL the answer is EXACT; bitmaps also OR-merge
    incrementally, so the same state backs an incremental MV. The
    oracle is plain COUNT(DISTINCT): any dropped or double-set bit
    breaks the hash.
    """
    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users")
    )


def datasketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache DataSketches HLL via Spark 3.5's built-in
    ``hll_sketch_agg`` / ``hll_union_agg``, oracle-certified: per-type
    sketches built in one pass, then UNION-merged to a global estimate
    — the binary-mergeable sketch surface.

    The estimates are DataSketches-implementation-specific, so the
    query certifies them instead of emitting them raw: each row carries
    the EXACT distinct count plus a boolean asserting the estimate
    landed within 3σ of the default-lgK=12 sketch (rse ≈ 1.6% → 5%,
    +2 for tiny groups; the same bound the unit test has always
    enforced). Crucially the ``__all__`` row certifies the MERGED
    sketch — union of per-type partials — against a directly-computed
    global exact count, proving merge associativity end-to-end. The
    oracle recomputes both exact counts and asserts TRUE. Production at
    100 TB ships the sketch columns alone; the relational
    ``hll_distinct`` above is the cross-engine-exact twin.
    """
    ev = load_table(spark, sf_dir, "events")
    in_bounds = (
        F.abs(F.col("est") - F.col("exact_users"))
        <= 0.05 * F.col("exact_users") + F.lit(2)
    ).alias("hll_in_bounds")
    per_type = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    per_type_rows = per_type.select(
        "event_type",
        "exact_users",
        F.expr("hll_sketch_estimate(sk)").alias("est"),
    ).select("event_type", "exact_users", in_bounds)
    merged_est = per_type.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    global_exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    global_row = (
        merged_est.crossJoin(global_exact)
        .select(
            F.lit("__all__").alias("event_type"), "exact_users", in_bounds
        )
    )
    return per_type_rows.unionByName(global_row)


_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
)


def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data profiling of the orders table: per-column row
    count, non-null count, null count, and exact distinct count — the
    stats backing NULL-ratio data-quality gates and optimizer
    cardinality estimates (NS8).

    All 13 aggregates (1 count + 6 non-null + 6 distinct) run in a
    SINGLE scan: Catalyst compiles the multi-distinct agg with one
    Expand (6× row replication, one column live per replica) and one
    shuffle — versus 6 separate scans for the naive per-column loop.
    The 1-row wide result then unpivots driver-free via ``stack`` into
    the long (column, stats) form. At 100 TB exact distinct is the
    honest version of this profile; the sketch-based cousin is
    ``approx_distinct``. Oracle: UNION ALL of per-column aggregates.
    """
    # the multi-distinct Expand replicates every row 6× map-side —
    # compute-dense, so fan_out it off the one-task fixture scan
    o = fan_out(
        load_table(spark, sf_dir, "orders").select(*_PROFILE_COLS)
    )
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(c).alias(f"nd_{c}"))
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args})"
            " AS (column_name, n_notnull, n_distinct)"
        ),
        "n_rows",
    ).select(
        "column_name",
        "n_rows",
        "n_notnull",
        (F.col("n_rows") - F.col("n_notnull")).alias("n_nulls"),
        "n_distinct",
    )


def _profile_oracle() -> str:
    parts = [
        f"""SELECT '{c}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT({c}) AS BIGINT) AS n_notnull,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM orders"""
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


QUERIES = {
    "cms_heavy_hitters": cms_heavy_hitters,
    "hll_distinct": hll_distinct,
    "bitmap_distinct": bitmap_distinct,
    "datasketch_hll": datasketch_hll,  # rows-only (sketch-impl estimates)
    "profile_table": profile_table,
    "table_checksum": table_checksum,
    "skew_stats": skew_stats,
    "mv_incremental_refresh": mv_incremental_refresh,
}

ORACLE = {
    # Certification oracle: the engine emits exact counts plus booleans
    # asserting the DataSketches estimates (per-type and union-merged
    # global) met the 3σ bound; the oracle recomputes exact and asserts
    # TRUE — a hash match certifies sketch accuracy AND mergeability.
    "datasketch_hll": """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS hll_in_bounds
        FROM events GROUP BY event_type
        UNION ALL
        SELECT '__all__' AS event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS hll_in_bounds
        FROM events
    """,
    "bitmap_distinct": """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY event_type
    """,
    "hll_distinct": f"""
        WITH hashed AS (
            SELECT event_type,
                   CAST(concat('0x',
                        substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                        AS BIGINT) AS h
            -- user_id IS NOT NULL: see hll_registers — NULL is not a
            -- distinct user, and DuckDB's null-skipping concat would
            -- otherwise fail the '0x' cast
            FROM events WHERE user_id IS NOT NULL
        ),
        parts AS (
            SELECT event_type, CAST(h % {HLL_M} AS INT) AS bucket,
                   h // {HLL_M} AS w
            FROM hashed
        ),
        regs AS (
            SELECT event_type, bucket,
                   MAX(CASE WHEN w = 0 THEN {HLL_WBITS + 1}
                            ELSE {HLL_WBITS + 1} - length(bin(w)) END) AS m
            FROM parts GROUP BY 1, 2
        ),
        spine AS (
            SELECT event_type, CAST(bucket AS INT) AS bucket
            FROM (SELECT DISTINCT event_type FROM events),
                 (SELECT unnest(range({HLL_M})) AS bucket)
        ),
        filled AS (
            SELECT s.event_type, COALESCE(r.m, 0) AS m
            FROM spine s LEFT JOIN regs r USING (event_type, bucket)
        ),
        sums AS (
            SELECT event_type,
                   SUM(CAST(CAST(1 AS BIGINT) << ({HLL_WBITS + 1} - m)
                            AS DECIMAL(38,0))) AS s,
                   SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS n_zero
            FROM filled GROUP BY 1
        ),
        exact AS (
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
            FROM events GROUP BY 1
        ),
        rawed AS (
            SELECT e.event_type, e.n_exact, n_zero,
                   CAST({HLL_ALPHA!r} AS DOUBLE)
                     * {float(HLL_M * HLL_M)!r}
                     * {float(1 << (HLL_WBITS + 1))!r}
                     / CAST(s AS DOUBLE) AS hll_raw
            FROM exact e JOIN sums USING (event_type)
        )
        SELECT event_type, n_exact,
               CAST(n_zero AS BIGINT) AS n_zero_regs, hll_raw,
               CASE WHEN hll_raw <= {HLL_RAW_CUTOFF!r} AND n_zero > 0
                    THEN ([{", ".join(repr(x) + "e0" for x in HLL_LINEAR)}])
                         [CAST(n_zero AS INT)]
                    ELSE hll_raw END AS hll_estimate
        FROM rawed
    """,
    "profile_table": _profile_oracle(),
    "cms_heavy_hitters": f"""
        WITH words AS (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ),
        coords AS (
            SELECT word,
                   s.range AS row,
                   CAST(('0x' || substr(md5(CAST(s.range AS VARCHAR) || ':' || word), 1, 8))
                        AS BIGINT) % {CMS_WIDTH} AS bucket
            FROM words CROSS JOIN range({CMS_DEPTH}) s
        ),
        sketch AS (
            SELECT row, bucket, COUNT(*) AS counter
            FROM coords GROUP BY row, bucket
        ),
        top AS (
            SELECT word, COUNT(*) AS n_exact
            FROM words GROUP BY word
            ORDER BY n_exact DESC, word LIMIT {CMS_TOPK}
        ),
        probes AS (
            SELECT t.word, t.n_exact,
                   s.range AS row,
                   CAST(('0x' || substr(md5(CAST(s.range AS VARCHAR) || ':' || t.word), 1, 8))
                        AS BIGINT) % {CMS_WIDTH} AS bucket
            FROM top t CROSS JOIN range({CMS_DEPTH}) s
        )
        SELECT p.word, p.n_exact, MIN(sk.counter) AS n_est
        FROM probes p JOIN sketch sk USING (row, bucket)
        GROUP BY p.word, p.n_exact
    """,
    "table_checksum": """
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CAST(('0x' || substr(md5(
                     COALESCE(CAST(o_orderkey AS VARCHAR), '\\N') || '|' ||
                     COALESCE(CAST(o_custkey AS VARCHAR), '\\N') || '|' ||
                     COALESCE(o_orderstatus, '\\N') || '|' ||
                     COALESCE(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '\\N')
                     ), 1, 8)) AS BIGINT))
                 AS BIGINT) AS content_checksum
        FROM orders
    """,
    "skew_stats": """
        SELECT COUNT(*) AS n_keys,
               CAST(SUM(n) AS BIGINT) AS total_rows,
               MAX(n) AS max_per_key,
               CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_per_key,
               CAST(MAX(n) AS DOUBLE)
                 / (CAST(SUM(n) AS DOUBLE) / COUNT(*)) AS skew_ratio
        FROM (SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey)
    """,
    "mv_incremental_refresh": """
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value,
               COUNT(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
}
