"""Scalar-function operators: timestamp, string, numeric, JSON (SURVEY §2.3).

Reference parity: epoch-ms → formatted timestamp (N5, app.py:127), string
concat with scalar broadcast (N9, app.py:172), string-encoded numerics
re-cast at use sites (N10/N11 + A5, app.py:204-205), numeric formatting
(A10, app.py:206,218,225), the whole JSON-normalization pipeline
(app.py:84-189) → ``get_json_object``.

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.tables import fan_out, load_table


def ts_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp → 'yyyy-MM-dd HH:mm:ss' string (N5, app.py:127)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month extraction + group count (north-star date functions)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .groupBy("o_year", "o_month")
        .agg(F.count("*").alias("n_orders"))
    )


def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic surface: day offsets, day diffs, month boundary,
    quarter/week extraction (north-star date functions). Stays on the
    integer-day / calendar-field subset where Spark and DuckDB agree
    exactly (fractional months_between is engine-specific and excluded
    on purpose).
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.select(
            d.alias("order_date"),
            F.date_add(d, 90).alias("due_date"),
            F.datediff(F.lit("1998-12-31").cast("date"), d).alias(
                "days_to_eoy98"
            ),
            F.last_day(d).alias("month_end"),
            F.quarter(d).alias("q"),
            F.weekofyear(d).alias("iso_week"),
        )
        .groupBy("q")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("order_date").alias("first_date"),
            F.max("due_date").alias("last_due"),
            F.max("month_end").alias("last_month_end"),
            F.min("days_to_eoy98").alias("min_days_to_eoy98"),
            F.max("iso_week").alias("max_iso_week"),
        )
    )


def safe_cast_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casts (NS: ingest hygiene): TRY_CAST turns
    unparseable values into nulls instead of failing the batch — the
    ingest twin of the PERMISSIVE JSON mode. Counts parseable vs not
    per event_type so the whole surface is one oracle-exact row set.
    """
    # fan_out the two needed columns: the per-row JSON parse
    # (get_json_object) otherwise runs map-side in the fixture's
    # one-task scan (~1.4 s serial at sf0.1, tools/parallelcheck.py)
    ev = fan_out(
        load_table(spark, sf_dir, "events").select("event_type", "props")
    )
    k_int = F.expr(
        "try_cast(get_json_object(props, '$.k') AS BIGINT)"
    )
    type_int = F.expr("try_cast(event_type AS BIGINT)")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.count(k_int).alias("n_k_parsed"),
        F.count(type_int).alias("n_type_parsed"),
        F.max(k_int).alias("max_k"),
    )


def string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat carrying a scalar into each row (N9: f"{base}/{k}", app.py:172)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.concat_ws(
            "/", F.col("event_type"), F.col("user_id").cast("string")
        ).alias("pair"),
    )


def string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substring/like over customer names (north-star strings).

    Input contract (probed r12, like the finite-`value` decimal
    convention): case mapping is defined over text whose codepoints
    have ONE-TO-ONE case mappings — ASCII, accented Latin (ü→Ü), Greek,
    Cyrillic, digraph codepoints (ĳ→Ĳ) all qualify. Spark applies
    Unicode FULL case mapping (upper('ß')='SS', upper('ﬁ')='FI',
    lower('İ')='i'+combining dot) where DuckDB applies SIMPLE 1:1
    mapping (ß→ẞ, ﬁ unchanged, İ→i) — the one-to-many class is a
    documented engine-dialect boundary, matching the fixture
    generator's contract, not a silently-absorbed case.
    substring/length are codepoint-based in BOTH engines (probed:
    emoji, surrogate-pair and combining sequences agree exactly).
    """
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment").like("%ING%"))  # BUILDING
        .select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.lower("c_mktsegment").alias("segment_lower"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.length("c_name").alias("name_len"),
        )
    )


def number_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-digits formatting (A10: f"${btc:,.0f}", app.py:206).

    floor() before the integer cast keeps Spark (truncating cast) and
    DuckDB (rounding cast) on the same value.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.format_number(F.floor("c_acctbal").cast("bigint"), 0).alias("acctbal_fmt"),
    )


def cast_str_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-encoded numeric → double (A5/N10/N11, app.py:204-205).

    events.props is a JSON string '{"k": <int>}'; the extracted value is a
    string, cast to double at the analytics layer exactly like the
    reference casts ISS lat/long and the Binance price.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("double").alias("k_value"),
    )


def math_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic expression per row (north-star: l_extendedprice*(1-l_discount)).

    The product is computed in exact decimal so the value-hash matches the
    oracle bit-for-bit (see functions/numeric.py).
    """
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ((price * (F.lit(1).cast("decimal(18,2)") - disc)).cast("double")).alias(
            "net_price"
        ),
    )


def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + aggregation (the app.py:84-189 analog).

    No fan_out: measured at sf0.1, the round-robin exchange of 600 k
    props strings costs more than the single-split parse pass it
    parallelizes (0.40 s fanned vs 0.34 s direct, min-of-6 warm). On
    a real lake input splits provide the parallelism and the parse stays
    map-side with zero extra shuffle.

    Parse strategy (r9 drift adjudication): the r7→r8 bench drift
    (0.26→0.36 s) re-measured isolated min-of-6 as uniform machine
    drift — but the same pass A/B'd the three Spark 4 parse paths on
    identical data: get_json_object 0.435 s, from_json(one-field
    schema) 0.381 s, parse_json→variant 0.355 s. from_json wins among
    the schema-stable options (Catalyst prunes the parse to the
    requested field via OptimizeJsonExprs; variant's edge is within
    noise and its casting semantics are the least SQL-standard), and a
    declared schema is the right contract at 100 TB anyway — malformed
    rows become NULL in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.from_json("props", "k bigint").getField("k").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


def null_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: coalesce / nullif / is-null flags (the
    reference's dropna/guard logic generalized, A6 + C4/C5)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
        F.col("value").isNull().alias("was_null"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
    )


def regex_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction and global replacement over customer names."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("name_masked"),
    )


def url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition surface (``parse_url``: HOST / PATH / QUERY
    param) — the web-corpus curation primitive behind domain quotas and
    URL dedup. The synthetic corpus has no URL column, so a
    deterministic URL is synthesized from (source, doc_id, lang) and
    then parsed back — the parser does real work and the oracle
    rebuilds every component from the base columns, so any parsing
    deviation breaks the hash. Pure map pass.
    """
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


def date_dim_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension build: one row per day spanning the orders
    date range with the standard warehouse attributes (quarter, ISO
    week/day-of-week, weekend and month-boundary flags) — the date_dim
    every star schema joins against.

    The spine is dimension-sized (a sequence explode off ONE min/max
    row, never corpus-sized) and every attribute is a map expression
    over it; Spark's weekday (0=Mon) is shifted to ISO 1=Mon so the
    oracle can use DuckDB's isodow directly — the engines' differing
    day-of-week conventions are exactly the trap a cross-engine date
    dim has to pin down.
    """
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.date_trunc("day", "o_orderdate")).alias("lo"),
        F.max(F.date_trunc("day", "o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    iso_dow = F.weekday("d") + F.lit(1)
    return spine.select(
        F.col("d").alias("date_day"),
        F.year("d").alias("year"),
        F.quarter("d").alias("quarter"),
        F.month("d").alias("month"),
        F.dayofmonth("d").alias("day_of_month"),
        F.weekofyear("d").cast("int").alias("iso_week"),
        iso_dow.cast("int").alias("iso_dow"),
        (iso_dow >= 6).alias("is_weekend"),
        (F.dayofmonth("d") == 1).alias("is_month_start"),
        (F.month(F.col("d") + F.expr("interval 1 day")) != F.month("d")).alias(
            "is_month_end"
        ),
    )


#: timezone targets for the normalization surface (IANA names — both
#: engines resolve them against the same tz database rules, DST included)
TZ_TARGETS = ("America/New_York", "Asia/Tokyo")


def tz_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone normalization: event timestamps (stored naive-UTC, the
    lake convention) rendered in per-region local time plus the local
    hour bucket — the session-locality primitive behind regional
    dashboards.  Pure map pass; DST transitions come from the shared
    IANA rules so both engines shift identically."""
    ev = load_table(spark, sf_dir, "events")
    ny = F.from_utc_timestamp("ts", TZ_TARGETS[0])
    tokyo = F.from_utc_timestamp("ts", TZ_TARGETS[1])
    return ev.select(
        "event_id",
        "ts",
        ny.alias("ny_ts"),
        tokyo.alias("tokyo_ts"),
        F.hour(ny).cast("int").alias("ny_hour"),
    )


def mask_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 3.4 native ``mask()`` — structural PII redaction that
    keeps format (upper→X, lower→x, digit→n, other kept): the
    display-layer masking rule every governed warehouse applies to
    name/account columns. Unicode-aware: the oracle mirrors with RE2's
    \\p{Lu}/\\p{Ll}/\\p{Nd} classes, which agree with Java's
    Character.isUpperCase/… on these casings (ASCII [A-Z] would
    diverge on accented names — verified against the ünïcode row in
    the adversarial corpus)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("mask(c_name)").alias("name_masked"),
        F.expr("mask(c_mktsegment)").alias("segment_masked"),
    )


#: bigint ceiling used to force a deterministic overflow row set
_I64_MAX = 9_223_372_036_854_775_807


def try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic surface (``try_add/try_multiply/
    try_divide``): under ANSI mode a single bad row — division by
    zero, bigint overflow — fails the whole 100 TB job; the try_
    family degrades those rows to NULL and keeps the batch alive
    (the arithmetic twin of safe_cast_fns' TRY_CAST).

    Per order: a product whose multiplier is i64-max on every 5th key
    (overflow → NULL for those rows, exact ×1000 elsewhere — bad rows
    are RARE, the realistic corpus shape; the r7 change from
    every-row-overflow, which forced a caught JVM ArithmeticException
    per row and made a trivial projection the slowest scalar query),
    a modular denominator that hits zero on every 7th key
    (divide-by-zero → NULL), and a safe branch that stays exact. The
    oracle replays the same row classes with CASE guards — DuckDB
    would raise on the raw expressions, so the guard IS the
    cross-engine semantic.
    """
    # every 5th key's overflow raises a caught JVM ArithmeticException —
    # compute-dense per row, so fan_out instead of the one-task scan
    o = fan_out(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
    )
    denom = F.col("o_orderkey") % 7
    return o.select(
        "o_orderkey",
        F.expr(
            "try_multiply(o_orderkey + 1, CASE WHEN o_orderkey % 5 = 0"
            f" THEN {_I64_MAX}L ELSE 1000L END)"
        ).alias("overflow_product"),
        F.expr("try_divide(o_totalprice, o_orderkey % 7)").alias(
            "risky_ratio"
        ),
        F.expr("try_add(o_orderkey, 1L)").alias("safe_next"),
        (denom == 0).alias("denom_was_zero"),
    )


QUERIES = {
    "url_parse": url_parse,
    "ts_format": ts_format,
    "date_parts": date_parts,
    "date_arith": date_arith,
    "safe_cast_fns": safe_cast_fns,
    "string_concat": string_concat,
    "string_fns": string_fns,
    "number_format": number_format,
    "cast_str_double": cast_str_double,
    "math_expr": math_expr,
    "json_extract": json_extract,
    "null_fns": null_fns,
    "regex_fns": regex_fns,
    "date_dim_build": date_dim_build,
    "tz_normalize": tz_normalize,
    "mask_native": mask_native,
    "try_arith": try_arith,
}

ORACLE = {
    "try_arith": f"""
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 <> 0
                    THEN (o_orderkey + 1) * 1000
                    WHEN o_orderkey = 0
                    THEN CAST({_I64_MAX} AS BIGINT)
                    ELSE CAST(NULL AS BIGINT) END AS overflow_product,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE o_totalprice / (o_orderkey % 7) END AS risky_ratio,
               o_orderkey + 1 AS safe_next,
               o_orderkey % 7 = 0 AS denom_was_zero
        FROM orders
    """,
    "mask_native": r'''
        SELECT c_custkey,
               regexp_replace(regexp_replace(regexp_replace(
                   c_name, '\p{Lu}', 'X', 'g'),
                   '\p{Ll}', 'x', 'g'),
                   '\p{Nd}', 'n', 'g') AS name_masked,
               regexp_replace(regexp_replace(regexp_replace(
                   c_mktsegment, '\p{Lu}', 'X', 'g'),
                   '\p{Ll}', 'x', 'g'),
                   '\p{Nd}', 'n', 'g') AS segment_masked
        FROM customer
    ''',
    "date_dim_build": """
        WITH bounds AS (
            SELECT MIN(date_trunc('day', o_orderdate)) AS lo,
                   MAX(date_trunc('day', o_orderdate)) AS hi
            FROM orders
        ),
        spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
            FROM bounds
        )
        SELECT d AS date_day,
               CAST(year(d) AS INT) AS year,
               CAST(quarter(d) AS INT) AS quarter,
               CAST(month(d) AS INT) AS month,
               CAST(dayofmonth(d) AS INT) AS day_of_month,
               CAST(weekofyear(d) AS INT) AS iso_week,
               CAST(isodow(d) AS INT) AS iso_dow,
               isodow(d) >= 6 AS is_weekend,
               dayofmonth(d) = 1 AS is_month_start,
               month(d + INTERVAL 1 DAY) <> month(d) AS is_month_end
        FROM spine
    """,
    "tz_normalize": """
        SELECT event_id, ts,
               timezone('America/New_York', ts AT TIME ZONE 'UTC') AS ny_ts,
               timezone('Asia/Tokyo', ts AT TIME ZONE 'UTC') AS tokyo_ts,
               CAST(hour(timezone('America/New_York',
                                  ts AT TIME ZONE 'UTC')) AS INT) AS ny_hour
        FROM events
    """,
    "url_parse": """
        -- component rebuild replays the engine's parse_url edge rules
        -- (r12 NULL-lang/empty-source plants): a NULL source or lang
        -- NULL-propagates through the synthesized url and every
        -- component parses to NULL; an EMPTY source yields the invalid
        -- authority 'https://.example.com' whose HOST Spark rejects
        -- (NULL) while PATH and QUERY still parse (verified against
        -- parse_url directly). r12 seventh wave extends the HOST rule:
        -- a NON-ASCII source ('源🔥') makes java.net.URI reject the
        -- authority too — HOST NULL, PATH/QUERY still parse, and a
        -- non-ASCII QUERY VALUE passes through untouched (probed);
        -- the hostname gate below is the [A-Za-z0-9.-] reg-name
        -- subset the corpus exercises
        WITH u AS (
            SELECT doc_id, source, lang,
                   'https://' || source || '.example.com/docs/'
                       || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
            FROM documents
        )
        SELECT doc_id, url,
               CASE WHEN url IS NULL OR source = ''
                         OR NOT regexp_matches(source, '^[A-Za-z0-9.-]+$')
                    THEN NULL
                    ELSE source || '.example.com' END AS host,
               CASE WHEN url IS NULL THEN NULL
                    ELSE '/docs/' || CAST(doc_id AS VARCHAR) END AS path,
               CASE WHEN url IS NULL THEN NULL ELSE lang END AS lang_param
        FROM u
    """,
    "ts_format": """
        SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
        FROM events
    """,
    "safe_cast_fns": """
        SELECT event_type,
               COUNT(*) AS n_rows,
               COUNT(TRY_CAST(props->>'$.k' AS BIGINT)) AS n_k_parsed,
               COUNT(TRY_CAST(event_type AS BIGINT)) AS n_type_parsed,
               MAX(TRY_CAST(props->>'$.k' AS BIGINT)) AS max_k
        FROM events
        GROUP BY event_type
    """,
    "date_arith": """
        WITH d AS (
            SELECT CAST(o_orderdate AS DATE) AS order_date,
                   CAST(o_orderdate AS DATE) + 90 AS due_date,
                   datediff('day', CAST(o_orderdate AS DATE),
                            DATE '1998-12-31') AS days_to_eoy98,
                   last_day(CAST(o_orderdate AS DATE)) AS month_end,
                   quarter(CAST(o_orderdate AS DATE)) AS q,
                   weekofyear(CAST(o_orderdate AS DATE)) AS iso_week
            FROM orders
        )
        SELECT CAST(q AS INT) AS q,
               COUNT(*) AS n_orders,
               MIN(order_date) AS first_date,
               MAX(due_date) AS last_due,
               MAX(month_end) AS last_month_end,
               CAST(MIN(days_to_eoy98) AS INT) AS min_days_to_eoy98,
               CAST(MAX(iso_week) AS INT) AS max_iso_week
        FROM d
        GROUP BY q
    """,
    "date_parts": """
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(month(o_orderdate) AS INT) AS o_month,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY 1, 2
    """,
    "string_concat": """
        -- concat_ws, not ||: the engine's concat_ws SKIPS null parts
        -- (a NULL event_type still yields the bare user id) while ||
        -- null-propagates — DuckDB's concat_ws matches Spark's
        -- semantics exactly (r11 adversarial finding)
        SELECT event_id,
               concat_ws('/', event_type, CAST(user_id AS VARCHAR)) AS pair
        FROM events
    """,
    "string_fns": """
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               lower(c_mktsegment) AS segment_lower,
               substring(c_name, 1, 8) AS name_prefix,
               CAST(length(c_name) AS INT) AS name_len
        FROM customer
        WHERE c_mktsegment LIKE '%ING%'
    """,
    "number_format": """
        SELECT c_custkey, format('{:,}', CAST(floor(c_acctbal) AS BIGINT)) AS acctbal_fmt
        FROM customer
    """,
    "cast_str_double": """
        SELECT event_id, CAST(props->>'$.k' AS DOUBLE) AS k_value
        FROM events
    """,
    "math_expr": """
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    AS DOUBLE) AS net_price
        FROM lineitem
    """,
    "null_fns": """
        SELECT event_id,
               coalesce(value, 0.0) AS value_filled,
               value IS NULL AS was_null,
               nullif(event_type, 'error') AS type_or_null
        FROM events
    """,
    "regex_fns": """
        SELECT c_custkey,
               regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
               regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked
        FROM customer
    """,
    # k is gated on json_type + TRY_CAST (r12 overflow plant): Spark's
    # from_json nulls a k that is not an int64 (int64-overflow numbers,
    # floats, strings), while DuckDB's JSON parser promotes an
    # overflowing integer to DOUBLE and a bare CAST of its rendering
    # ('1e20' digits) crashes outright — the gate replays the
    # typed-extraction NULL exactly (overflow reads as DOUBLE, so the
    # type test rejects it; uint64-range ints pass the type test and
    # fail the TRY_CAST, also NULL on both sides)
    "json_extract": """
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               MAX(k) AS max_k
        FROM (
            SELECT event_type,
                   CASE WHEN json_type(props -> '$.k')
                             IN ('BIGINT', 'UBIGINT')
                        THEN TRY_CAST(props ->> '$.k' AS BIGINT)
                        END AS k
            FROM events
        )
        GROUP BY event_type
    """,
}
