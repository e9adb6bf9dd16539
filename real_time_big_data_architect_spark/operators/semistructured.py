"""Semi-structured shapes: explode, map→rows pivot, unpivot (SURVEY §2.2).

Reference parity: nested-array explode with parent key carried down (N2,
app.py:90-103), map→rows pivot over dynamic keys (N4 coingecko
app.py:115-118, N9 fx_rates app.py:168-173), stack/unpivot for chart
series (S7/A11).

Scale notes: explode is a generator inside whole-stage codegen — no
shuffle; the row-count amplification is what matters at 100 TB (explode
early only when the downstream agg needs word granularity; otherwise
project first so the generator runs on pruned columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_big_data_architect_spark.tables import fan_out, load_table


def explode_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode with the parent key carried down (N2 analog).

    documents.text → words; doc_id rides along exactly like openaq's
    ``city`` is carried into each exploded measurement row.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.explode(F.split("text", " ")).alias("word"),
    )


def map_entries_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map → rows pivot: dynamic JSON keys become rows (N4/N9 analog).

    ``from_json`` to ``MapType`` then ``explode`` of the map itself
    (which yields the two-column key/value shape directly) — the
    coingecko '{asset: {usd: …}}' pattern on the events.props column.
    """
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return ev.select(
        "event_id", F.explode(m).alias("prop_key", "prop_value")
    )


def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long unpivot via stack() (N4 'Spark primitive', SURVEY §2.2)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(2, 'quantity', l_quantity, 'extendedprice', l_extendedprice)"
        " AS (measure, measure_value)",
    )


def array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over tokenized documents: size, membership,
    distinct cardinality, lexicographic min (binary collation in both
    engines)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_contains(words, "the").alias("has_the"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.array_min(words).alias("first_word_sorted"),
    )


def variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path for semi-structured JSON: parse once
    into the binary variant encoding, extract typed fields with
    ``variant_get`` — the schema-on-read replacement for repeated
    ``get_json_object`` string re-parsing (variant parses each document
    ONCE; every extraction is a binary traversal, which is why it's
    the open-lakehouse default for JSON columns at scale).
    Oracle: DuckDB's native JSON extraction over the same strings.

    ``try_parse_json`` + ``try_variant_get``, not the strict forms
    (r12 overflow + duplicate-key plants): strict ``variant_get``
    THROWS on an int64-overflow JSON number and strict ``parse_json``
    THROWS on duplicate object keys — either way one poisoned document
    kills the whole job at 100 TB; the try forms yield NULL, which the
    oracle's TRY_CAST over DuckDB's DOUBLE-promoted rendering replays
    for the overflow case. Input contracts: ``$.k`` is
    int64-or-absent — a FLOAT k is out of contract (try_variant_get
    truncates 1.7 → 1 where from_json and the oracle read NULL/2;
    probed r12) — and props objects have UNIQUE keys: duplicate keys
    are unmappable across engines by construction (Spark's from_json
    is last-wins, its own get_json_object is first-wins, DuckDB is
    first-wins; probed r12), so they are a documented precondition,
    crash-proofed but not differentially absorbed.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    return (
        ev.select(
            "event_type",
            F.try_variant_get(v, "$.k", "bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface (Spark 4 built-in ``to_xml``/``from_xml``):
    orders rows serialize to XML documents and parse back through an
    explicit schema — the declared proof that the XML reader path
    round-trips typed data exactly (strings, bigints, doubles). The
    oracle is the original projection: any serialization loss breaks
    the hash. Both directions are per-row codegen expressions — no
    Python; fan_out spreads the per-row XML serialize+parse across
    cores (the fixture's one-task scan ran it serial, ~0.8 s at sf0.1 —
    tools/parallelcheck.py).
    """
    o = fan_out(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
    )
    doc = F.to_xml(
        F.struct("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    parsed = o.select(
        F.from_xml(
            doc, "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
        ).alias("p")
    )
    return parsed.select("p.o_orderkey", "p.o_orderstatus", "p.o_totalprice")


def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV expression surface (``to_csv``/``from_csv``): the same
    round-trip proof as xml_roundtrip for the delimited path — the
    shape used when Kafka values carry CSV payloads.
    """
    o = load_table(spark, sf_dir, "orders")
    # explicit nullValue sentinel: the CSV default writes NULL as the
    # empty field AND reads the empty field as NULL, so an
    # empty-string status would silently round-trip to NULL (and the
    # pass-through oracle would diverge). With the sentinel, '' stays
    # '' (quoted) and NULL stays \N — probed faithful r12; a planted
    # empty-status order pins it.
    csv_opts = {"nullValue": "\\N"}
    line = F.to_csv(
        F.struct("o_orderkey", "o_orderstatus", "o_totalprice"), csv_opts
    )
    parsed = o.select(
        F.from_csv(
            line,
            "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE",
            csv_opts,
        ).alias("p")
    )
    return parsed.select("p.o_orderkey", "p.o_orderstatus", "p.o_totalprice")


def array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as first-class surface:
    ``filter`` / ``exists`` / ``forall`` / ``transform`` + ``aggregate``
    (lambda expressions compiled into whole-stage codegen — the
    JVM-side alternative to a Python UDF for per-row array logic; this
    entire query is one shuffle-free map pass). The L1 fold replays
    the _dot trick: acc starts at 0.0 and DuckDB's un-seeded
    list_reduce starts at the first element — 0.0 + x == x exactly, so
    the fold sequences are IEEE-identical and the doubles hash.

    The top-3 magnitudes are emitted as three SCALAR double columns
    (``F.get`` is 0-based and null-safe out of range, matching DuckDB
    list indexing) rather than an ``array<double>`` column: the
    driver's canonicalizer lexsorts the result frame with
    ``pandas.DataFrame.sort_values``, which raises ``TypeError:
    unhashable type`` on list cells (the r4 red). Element semantics
    are unchanged — same sorted-desc values, one per column."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    absd = F.transform(emb, lambda x: F.abs(x.cast("double")))
    top = F.reverse(F.array_sort(absd))
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.exists(emb, lambda x: F.abs(x) > F.lit(2.0)).alias("any_gt2"),
        F.forall(emb, lambda x: F.abs(x) < F.lit(10.0)).alias("all_lt10"),
        F.aggregate(absd, F.lit(0.0), lambda a, x: a + x).alias("l1_norm"),
        F.get(top, 0).alias("top1_abs"),
        F.get(top, 1).alias("top2_abs"),
        F.get(top, 2).alias("top3_abs"),
    )


def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (union / intersect / except) between each
    document's first-half and second-half vocabularies — per-row JVM
    set operations (the building block of shingle/feature overlap
    scoring), results sorted so the arrays are order-canonical and the
    oracle hash is well-defined. Shuffle-free map pass.

    The three set-result arrays are serialized to canonical '|'-joined
    strings (``array_join`` ↔ DuckDB ``array_to_string``): the driver's
    pandas ``sort_values`` canonicalizer cannot lexsort list cells
    (the r4 red on this query). The join is applied to the SAME sorted
    arrays as before, so element semantics and ordering are identical
    and unit tests still check them by splitting the string back.
    """
    # per-row array algebra is compute-dense: fan_out so it doesn't run
    # serial in the fixture's one-task scan (tools/parallelcheck.py)
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    h = F.floor(n / 2).cast("int")
    a = F.array_distinct(F.slice(words, 1, h))
    b = F.array_distinct(F.slice(words, h + 1, n - h))
    return docs.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_union(a, b)), "|")
        .alias("vocab_union"),
        F.array_join(F.array_sort(F.array_intersect(a, b)), "|")
        .alias("vocab_both"),
        F.array_join(F.array_sort(F.array_except(a, b)), "|")
        .alias("vocab_first_only"),
        F.size(F.array_intersect(a, b)).alias("n_shared"),
    )


def corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record quarantine: the PERMISSIVE-ingest discipline.

    A JSON feed (derived deterministically from orders: every 7th
    record truncated mid-object, every 11th carries a non-numeric
    value in a numeric field) is parsed with ``from_json`` and each
    record is classified — ``ok`` / ``parse_error`` (whole object
    unparseable: from_json yields an all-null struct) / ``type_error``
    (object valid, field fails the schema) / ``null_input``. FAILFAST
    kills the job on the first bad byte and silent drops lose data;
    production ingest quarantines with a reason, exactly this shape.
    The oracle replays the classification with ``json_valid`` +
    ``TRY_CAST`` over the identical generated feed. Pure map pass
    emitting per-record (o_orderkey, status) rows — the only shuffle
    is the fan_out repartition spreading the per-row build+parse
    across cores (serial in the one-task fixture scan otherwise).
    """
    o = fan_out(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
    )
    k = F.col("o_orderkey").cast("string")
    c = F.col("o_custkey").cast("string")
    # ONE definition of the well-formed record; both the untruncated
    # and the truncated variants derive from it, so the record shape
    # cannot silently drift between them (r10 review finding)
    good = F.concat(F.lit('{"k":'), k, F.lit(',"c":'), c, F.lit("}"))
    bad_type = F.concat(
        F.lit('{"k":'), k, F.lit(',"c":"x'), c, F.lit('"}')
    )
    truncated = F.substring(good, 1, F.length(good) - 2)
    raw = (
        F.when(F.col("o_orderkey") % 7 == 3, truncated)
        .when(F.col("o_orderkey") % 11 == 5, bad_type)
        .otherwise(good)
    )
    parsed = o.select(
        "o_orderkey", raw.alias("raw")
    ).withColumn("j", F.from_json("raw", "k long, c long"))
    status = (
        F.when(F.col("raw").isNull(), "null_input")
        .when(F.col("j.k").isNull(), "parse_error")
        .when(F.col("j.c").isNull(), "type_error")
        .otherwise("ok")
    )
    return parsed.select("o_orderkey", status.alias("status"))


QUERIES = {
    "corrupt_quarantine": corrupt_quarantine,
    "variant_json": variant_json,
    "array_hof": array_hof,
    "array_set_ops": array_set_ops,
    "xml_roundtrip": xml_roundtrip,
    "csv_roundtrip": csv_roundtrip,
    "explode_nested": explode_nested,
    "map_entries_pivot": map_entries_pivot,
    "unpivot_stack": unpivot_stack,
    "array_fns": array_fns,
}

_ROUNDTRIP_ORACLE = """
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    """

ORACLE = {
    "corrupt_quarantine": """
        WITH feed AS (
            SELECT o_orderkey,
                   CASE
                     WHEN o_orderkey % 7 = 3 THEN
                       substring(g, 1, length(g) - 2)
                     WHEN o_orderkey % 11 = 5 THEN
                       '{"k":' || CAST(o_orderkey AS VARCHAR)
                       || ',"c":"x' || CAST(o_custkey AS VARCHAR) || '"}'
                     ELSE g
                   END AS raw
            FROM (
                SELECT o_orderkey, o_custkey,
                       '{"k":' || CAST(o_orderkey AS VARCHAR)
                       || ',"c":' || CAST(o_custkey AS VARCHAR) || '}' AS g
                FROM orders
            )
        )
        SELECT o_orderkey,
               CASE
                 WHEN raw IS NULL THEN 'null_input'
                 WHEN NOT json_valid(raw) THEN 'parse_error'
                 WHEN TRY_CAST(json_extract_string(raw, '$.c') AS BIGINT)
                      IS NULL THEN 'type_error'
                 ELSE 'ok'
               END AS status
        FROM feed
    """,
    "variant_json": """
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS n_with_k,
               CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               CAST(MIN(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS min_k,
               CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS max_k
        FROM events GROUP BY event_type
    """,
    "xml_roundtrip": _ROUNDTRIP_ORACLE,
    "csv_roundtrip": _ROUNDTRIP_ORACLE,
    "array_set_ops": """
        WITH w AS (
          SELECT doc_id,
                 string_split(text, ' ') AS ws,
                 len(string_split(text, ' ')) AS n,
                 CAST(floor(len(string_split(text, ' ')) / 2) AS INT) AS h
          FROM documents
        ),
        ab AS (
          SELECT doc_id,
                 list_distinct(ws[1:h]) AS a,
                 list_distinct(ws[h + 1:n]) AS b
          FROM w
        )
        -- COALESCE: DuckDB's array_to_string folds an EMPTY list to
        -- NULL (string_agg over zero rows); Spark's array_join gives ''.
        -- The a IS NULL guard keeps NULL text → NULL output (Spark's
        -- natural propagation) instead of folding it to '' too.
        SELECT doc_id,
               CASE WHEN a IS NULL THEN NULL ELSE
                 coalesce(array_to_string(
                     list_sort(list_distinct(a || b)), '|'), '') END
                   AS vocab_union,
               CASE WHEN a IS NULL THEN NULL ELSE
                 coalesce(array_to_string(list_sort(list_distinct(
                     list_filter(a, x -> list_contains(b, x)))), '|'), '') END
                   AS vocab_both,
               CASE WHEN a IS NULL THEN NULL ELSE
                 coalesce(array_to_string(list_sort(list_distinct(
                     list_filter(a, x -> NOT list_contains(b, x)))), '|'), '')
                 END
                   AS vocab_first_only,
               CAST(len(list_distinct(
                   list_filter(a, x -> list_contains(b, x)))) AS INT)
                   AS n_shared
        FROM ab
    """,
    "array_hof": """
        WITH a AS (
            SELECT vec_id,
                   embedding,
                   list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE))) AS absd
            FROM embeddings
        )
        SELECT vec_id,
               CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
               len(list_filter(embedding, x -> abs(x) > 2.0)) > 0 AS any_gt2,
               len(list_filter(embedding, x -> abs(x) < 10.0))
                   = len(embedding) AS all_lt10,
               CASE WHEN len(absd) = 0 THEN 0.0
                    ELSE list_reduce(absd, (x, y) -> x + y) END AS l1_norm,
               list_reverse_sort(absd)[1] AS top1_abs,
               list_reverse_sort(absd)[2] AS top2_abs,
               list_reverse_sort(absd)[3] AS top3_abs
        FROM a
    """,
    "explode_nested": """
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    """,
    # all-or-nothing row semantics (r12 nested-props plant): Spark's
    # from_json to MAP<STRING,BIGINT> nulls the WHOLE map when ANY
    # top-level value is not a JSON integer or null (nested object,
    # float, string, uint64-overflow) — the row then vanishes through
    # explode. The per-key ->> cast alone instead kept the row and
    # crashed (or TRY_CAST-rounded '1.7' to 2); the bool_and type gate
    # replays the malformed-record contract exactly. JSON null values
    # stay as NULL-valued entries on both sides.
    "map_entries_pivot": """
        WITH keyed AS (
            SELECT event_id, props, unnest(json_keys(props)) AS k
            FROM events
        ),
        ok AS (
            SELECT event_id
            FROM keyed
            GROUP BY event_id
            HAVING bool_and(
                json_type(props -> k) IN ('BIGINT', 'UBIGINT', 'NULL')
                AND (json_type(props -> k) = 'NULL'
                     OR TRY_CAST(props ->> k AS BIGINT) IS NOT NULL)
            )
        )
        SELECT event_id, k AS prop_key,
               CAST(keyed.props ->> k AS BIGINT) AS prop_value
        FROM keyed JOIN ok USING (event_id)
    """,
    "array_fns": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_words,
               list_contains(string_split(text, ' '), 'the') AS has_the,
               CAST(len(list_distinct(string_split(text, ' '))) AS INT)
                   AS n_distinct_words,
               list_min(string_split(text, ' ')) AS first_word_sorted
        FROM documents
    """,
    "unpivot_stack": """
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
               l_quantity AS measure_value
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice' AS measure,
               l_extendedprice AS measure_value
        FROM lineitem
    """,
}
