"""Corpus-quality and anomaly operators for training-data pipelines (NS6).

Absent from the reference (the reference never inspects document content;
SURVEY §2.5) — these are the quality gates a pretraining pipeline runs
after dedup and before tokenization:

- **repetition ratios** (Gopher-style repetition filters): per-document
  distinct-word ratio and top-bigram fraction. Both computed entirely
  inside per-row JVM array expressions (``array_distinct``, a sorted-run
  fold with ``aggregate``) — a *shuffle-free map-only* pass, the only
  shape that survives 100 TB: each task reads its parquet split, emits
  one row per document, and nothing ever moves between executors.
- **n-gram contamination check**: fraction of each document's word
  8-grams that appear in a benchmark set (the eval-set decontamination
  step every training pipeline runs). The benchmark n-gram set is tiny
  (a curated eval suite, not the corpus), so it becomes a *broadcast*
  hash side; the corpus side streams through map-side, then one shuffle
  on ``doc_id`` re-aggregates hit counts. At 100 TB the plan is
  unchanged: benchmark grams still fit in memory (~1e6 rows).
- **z-score outlier detection** on the events stream: per-type moment
  sums in exact decimal (lossless: values carry ≤4 decimals), the
  mean/std/z expression tree evaluated in double and mirrored
  token-for-token in the oracle so every fp op is IEEE-correctly-rounded
  from identical inputs — bit-stable where built-in ``stddev`` (double
  accumulation in partition order) is not. Five stat rows broadcast back
  onto the 10k-row event scan: one tiny shuffle + one broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.tables import fan_out, load_table

#: contamination n-gram width (word-level); 8 is the common eval-decontam
#: choice (BIG-bench / GPT-3 used 13-gram chars, Llama 8-gram words)
NGRAM_N = 8

#: every 97th document stands in for the benchmark/eval set
BENCH_MOD = 97

#: |z| threshold flagging an event value as an outlier
Z_THRESHOLD = 2.0


def repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics — shuffle-free map-only pass.

    ``distinct_ratio`` = |distinct words| / |words|; ``top_bigram_frac``
    = occurrences of the most frequent bigram / bigram count. The top
    bigram is found without any groupBy: sort the bigram array, then a
    single ``aggregate`` fold counts the longest equal run — O(B log B)
    per row, zero exchanges in the plan. Ratios are a single IEEE
    division of exact integers, so they hash-match cross-engine.
    """
    d = load_table(spark, sf_dir, "documents")
    # single-word docs carry no bigram signal and would index past the
    # array (sequence(0, -1) descends under ANSI) — they are dropped,
    # matching the oracle's inner join against the bigram counts
    d = d.withColumn("w", F.split("text", " ")).filter(F.size("w") >= 2)
    bigrams = F.expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))"
    )
    d = d.withColumn("bs", F.array_sort(bigrams))
    # fold state (prev, run, best): longest run of equal adjacent values
    top_cnt = F.expr(
        """
        aggregate(
          bs,
          struct(cast('' as string) as prev, 0L as run, 0L as best),
          (s, x) -> struct(
            x as prev,
            if(x = s.prev, s.run + 1, 1L) as run,
            greatest(s.best, if(x = s.prev, s.run + 1, 1L)) as best),
          s -> s.best)
        """
    )
    return d.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_words"),
        F.size(F.array_distinct("w")).cast("bigint").alias("n_distinct"),
        (
            F.size(F.array_distinct("w")).cast("double")
            / F.size("w").cast("double")
        ).alias("distinct_ratio"),
        top_cnt.alias("top_bigram_cnt"),
        (top_cnt.cast("double") / (F.size("w") - 1).cast("double")).alias(
            "top_bigram_frac"
        ),
    )


def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-overlap decontamination: word 8-gram hit fraction.

    The benchmark side (docs with ``doc_id % 97 == 0``) distills to a
    distinct-gram set and broadcasts; corpus docs explode to (doc_id,
    gram), probe the broadcast hash map-side, and re-aggregate per doc.
    One shuffle (doc_id re-agg), no corpus-vs-corpus join.
    """
    # gram construction (split + windowed concat_ws + explode) is the
    # compute-dense step: fan_out it off the one-task fixture scan
    d = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ).withColumn("w", F.split("text", " "))
    # docs shorter than the window yield NO grams (an empty array, not
    # a descending sequence indexing before the array start) and drop
    # out of the exploded relation — mirroring the oracle's empty range
    grams = F.expr(
        f"if(size(w) < {NGRAM_N}, array(),"
        f" transform(sequence(0, size(w) - {NGRAM_N}),"
        f" i -> concat_ws(' ', slice(w, i + 1, {NGRAM_N}))))"
    )
    with_grams = d.select(
        "doc_id", F.explode(grams).alias("gram")
    )
    bench = (
        with_grams.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    probed = with_grams.join(F.broadcast(bench), "gram", "left")
    agg = probed.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_hit"),
    )
    return agg.select(
        "doc_id",
        "n_grams",
        "n_hit",
        (F.col("n_hit").cast("double") / F.col("n_grams").cast("double")).alias(
            "contamination_frac"
        ),
        (F.col("doc_id") % BENCH_MOD == 0).alias("is_benchmark"),
    )


def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value deviates >2 sample standard deviations from
    their event-type mean — the anomaly gate of a metrics pipeline.

    Moments accumulate in exact decimal(18,4) (lossless for these
    values), then mean/std/z evaluate in double with the identical token
    sequence as the oracle — bit-stable filter boundary included.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    dec = F.col("value").cast("decimal(18,4)")
    stats = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec).cast("double").alias("sx"),
        F.sum(dec * dec).cast("double").alias("sxx"),
    )
    # singleton groups have no sample variance (n-1 = 0) and cannot be
    # outliers — drop them before the z expression divides
    joined = ev.join(F.broadcast(stats.filter(F.col("n") > 1)), "event_type")
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    mean = sx / n
    std = F.sqrt((n * sxx - sx * sx) / (n * (n - 1)))
    z = (F.col("value") - mean) / std
    return (
        joined.select(
            "event_id",
            "event_type",
            "value",
            z.alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > Z_THRESHOLD)
    )


#: MAD outlier multiplier. For normal data MAD ≈ 0.6745σ, so 3·MAD
#: flags at ≈ 2.02σ (~4.3% of a normal tail) — a deliberately
#: AGGRESSIVE filter; the conventional Iglewicz-Hoaglin 3σ-equivalent
#: would be MAD_K ≈ 4.45 (the old comment had the equivalence
#: inverted — r10 review finding)
MAD_K = 3.0


def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier stats per event_type via Median Absolute
    Deviation — the anomaly gate that survives the very outliers it
    hunts (zscore_outliers' mean/std are dragged by heavy tails; the
    median/MAD breakdown point is 50%).

    Two grouped exact-percentile passes (median of value, then median
    of |value − median|) + one broadcast of the 5-row stats back onto
    the scan to count exceedances. Exact medians need a per-group
    sort; at 100 TB swap ``percentile`` for ``approx_percentile``
    (mergeable GK sketch) — same plan shape, no sort. Spark
    ``percentile`` and DuckDB ``quantile_cont`` both interpolate at
    (n−1)·p, and |v−med| / 3·mad arithmetic is token-mirrored, so the
    boundary is bit-stable cross-engine.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"),
        F.percentile("dev", F.lit(0.5)).alias("mad"),
        F.count("*").alias("n"),
    )
    out = dev.drop("med").join(F.broadcast(mad), "event_type")
    return (
        out.groupBy("event_type")
        .agg(
            F.first("med").alias("median_value"),
            F.first("mad").alias("mad"),
            F.first("n").alias("n"),
            F.sum(
                (F.col("dev") > F.lit(MAD_K) * F.col("mad")).cast("bigint")
            ).alias("n_outliers"),
        )
    )


def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style statistical LM quality score: each document's mean
    bigram transition probability under a model trained on the corpus
    itself — gibberish and boilerplate score low, fluent text high.
    The perplexity-bucket filter of pretraining pipelines, with
    probability averages instead of log-space (logs are libm-divergent
    cross-engine; the ranking is monotone-equivalent for filtering).

    Bigrams materialize per document as one JVM array expression
    (zip_with over two slices — no Python, no per-word shuffle rows
    until the explode). The model is two grouped counts over the
    corpus; P(w₂|w₁) = c(w₁w₂)/c(w₁·) joins back per instance, rounds
    into decimal(16,12) (order-free summation), and the final mean
    divides as double. Caveat on the rounding step: Spark HALF_UPs the
    shortest decimal repr while DuckDB rounds the binary double — the
    two can disagree when a quotient's 13th digit sits exactly on a
    half boundary; no fixture quotient does (measured green across
    both splitcheck geometries), but it is the same latent libm-class
    fragility documented on source_entropy. At 100 TB the model tables shard on the
    bigram hash; everything is joins and counts.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, n - 1),
        F.slice(words, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    # persisted: three consumers (both model counts + the probe join)
    # would otherwise each re-run the corpus-wide bigram explode
    inst = docs.select(
        "doc_id", F.explode(bigrams).alias("bigram")
    ).withColumn("w1", F.split(F.col("bigram"), " ").getItem(0)).persist()
    model_b = inst.groupBy("bigram").agg(F.count("*").alias("c_b"))
    model_u = inst.groupBy("w1").agg(F.count("*").alias("c_u"))
    scored = (
        inst.join(model_b, "bigram")
        .join(model_u, "w1")
        .withColumn(
            "p",
            F.round(
                F.col("c_b").cast("double") / F.col("c_u").cast("double"), 12
            ).cast("decimal(16,12)"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (
            F.sum("p").cast("double")
            / F.count("*").cast("double")
        ).alias("lm_score"),
    )


def rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-rate anomaly detection: hourly event counts whose
    z-score against their type's hourly profile exceeds the threshold —
    the ops-monitoring twin of zscore_outliers (which scores VALUES;
    this scores ARRIVAL RATES, the signal that catches outages and bot
    floods).

    Two cheap aggregations (hourly counts, then exact integer moments
    per type) + a broadcast of the 5-row stats onto the hourly series.
    The mean/std/z tree is mirrored token-for-token in the oracle;
    moments are exact BIGINT sums so the boundary is bit-stable.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.count("*").cast("double").alias("k"),
        F.sum("n").cast("double").alias("sx"),
        F.sum(F.col("n") * F.col("n")).cast("double").alias("sxx"),
    )
    # a type with a single hourly bucket has no variance to score
    # against (k-1 = 0 divides by zero under ANSI) — it cannot be
    # anomalous by definition, so it is filtered BEFORE the z math
    joined = hourly.join(
        F.broadcast(stats.filter(F.col("k") > 1)), "event_type"
    )
    k, sx, sxx = F.col("k"), F.col("sx"), F.col("sxx")
    mean = sx / k
    std = F.sqrt((k * sxx - sx * sx) / (k * (k - 1)))
    z = (F.col("n").cast("double") - mean) / std
    return joined.select(
        "event_type", "hour", "n", z.alias("zscore")
    ).filter(F.abs(z) > Z_THRESHOLD)


#: declarative expectation thresholds (Deequ/Great-Expectations shape):
#: metric must be ≥ threshold for the check to pass. Rates are exact
#: rationals (bigint / bigint) evaluated in one fixed double division.
DQ_MIN_ROWS = 1000
DQ_NULL_FREE_RATE = 0.999
DQ_PRICE_POSITIVE_RATE = 1.0
DQ_DATE_IN_RANGE_RATE = 1.0
DQ_PRIORITY_DOMAIN_RATE = 1.0


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite over ``orders`` — the
    Deequ / Great-Expectations pattern: N constraints verified in ONE
    scan, emitting (check, metric, threshold, passed) rows a pipeline
    gates on.

    All metrics — row volume, key uniqueness, null-free rate, value
    positivity, date-domain and enum-domain conformance — come from a
    single aggregate pass (count + conditional sums + one exact
    distinct), then unpivot via stack into the one-row-per-check
    verdict table. No second scan, no per-check jobs: at 100 TB the
    whole suite costs exactly one map-side-combinable aggregation.
    Uniqueness needs the only extra shuffle (exact countDistinct).
    """
    o = load_table(spark, sf_dir, "orders")
    pri = "('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')"
    agg = o.agg(
        F.count("*").alias("n"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum(
            F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0)
        ).alias("n_cust"),
        F.sum(F.when(F.col("o_totalprice") > 0, 1).otherwise(0)).alias(
            "n_pos"
        ),
        F.sum(
            F.when(
                (F.col("o_orderdate") >= F.lit("1992-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2005-01-01").cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("n_dates"),
        F.sum(
            F.expr(f"CASE WHEN o_orderpriority IN {pri} THEN 1 ELSE 0 END")
        ).alias("n_pri"),
    )
    checks = agg.select(
        F.expr(
            "stack(6, "
            f" 'row_volume', CAST(n AS DOUBLE), CAST({DQ_MIN_ROWS} AS DOUBLE),"
            " 'key_unique', CAST(n_keys AS DOUBLE) / CAST(n AS DOUBLE), 1.0D,"
            f" 'custkey_null_free', CAST(n_cust AS DOUBLE) / CAST(n AS DOUBLE), {DQ_NULL_FREE_RATE}D,"
            f" 'price_positive', CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), {DQ_PRICE_POSITIVE_RATE}D,"
            f" 'date_in_range', CAST(n_dates AS DOUBLE) / CAST(n AS DOUBLE), {DQ_DATE_IN_RANGE_RATE}D,"
            f" 'priority_in_domain', CAST(n_pri AS DOUBLE) / CAST(n AS DOUBLE), {DQ_PRIORITY_DOMAIN_RATE}D"
            ") AS (check_name, metric, threshold)"
        )
    )
    return checks.select(
        "check_name",
        "metric",
        "threshold",
        (F.col("metric") >= F.col("threshold")).alias("passed"),
    )


def lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells for the (lang × source)
    contingency table — the corpus-mix drift check a pretraining
    pipeline runs when a new crawl lands: which language is over- or
    under-represented in which source.

    Emits one row per cell of the FULL lang × source cross product —
    including structural zeros (observed = 0, expected > 0), which
    contribute ``expected`` to the statistic; summing the emitted
    cells therefore yields the complete chi-square, not a lower bound
    (r5 advisor finding — the old version emitted observed cells only
    and understated sparse tables). Emitting cells (rather than one
    pre-summed statistic) keeps every fp operation a per-row expression
    mirrored token-for-token in the oracle — no cross-row double
    accumulation, so the hash is bit-exact. Margins cast to double
    BEFORE the product (overflow-safe at any corpus size).

    Scale: cells/margins aggregations and the zero-completion spine all
    have |langs|×|sources| cardinality — independent of corpus size —
    and the margin tables broadcast back onto the cell table.
    """
    d = load_table(spark, sf_dir, "documents").select(
        F.coalesce("lang", F.lit("")).alias("lang"),
        F.coalesce("source", F.lit("")).alias("source"),
    )
    observed_cells = d.groupBy("lang", "source").agg(
        F.count("*").alias("observed")
    )
    row_t = observed_cells.groupBy("lang").agg(
        F.sum("observed").alias("lang_total")
    )
    col_t = observed_cells.groupBy("source").agg(
        F.sum("observed").alias("source_total")
    )
    n_t = observed_cells.agg(F.sum("observed").alias("n_total"))
    # dimension-sized spine completes the structural zeros: every
    # (lang, source) pair whose margins are both nonzero exists here
    spine = row_t.select("lang").crossJoin(col_t.select("source"))
    cells = spine.join(
        observed_cells, ["lang", "source"], "left"
    ).select(
        "lang",
        "source",
        F.coalesce("observed", F.lit(0)).alias("observed"),
    )
    joined = (
        cells.join(F.broadcast(row_t), "lang")
        .join(F.broadcast(col_t), "source")
        .crossJoin(F.broadcast(n_t))
    )
    expected = (
        F.col("lang_total").cast("double") * F.col("source_total").cast("double")
    ) / F.col("n_total").cast("double")
    obs_d = F.col("observed").cast("double")
    return joined.select(
        "lang",
        "source",
        "observed",
        expected.alias("expected"),
        ((obs_d - expected) * (obs_d - expected) / expected).alias("chi2_cell"),
    )


def source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the language mix per source — the diversity
    gauge for corpus curation (a source whose entropy collapses is
    feeding one language; one whose entropy spikes may be mislabeled).

    Determinism discipline: entropy is a SUM of p·ln p terms, and
    double summation order matters — so the per-language counts
    collect into a lang-SORTED array and fold in that order
    (``aggregate`` left fold), which the oracle replays with
    ``list(... ORDER BY lang)`` + ``list_reduce``. Counts are exact
    ints and divisions are IEEE-identical; ``ln`` itself is the one
    residual libm dependency (IEEE 754 does not require correctly-
    rounded log, so JVM Math.log and DuckDB ln agreeing to the last
    ULP is an empirical property of this platform pair — measured
    green across every fixture and both splitcheck geometries, but a
    glibc/JVM change could perturb it; the HLL path precomputes its
    ln table for exactly this reason, which is impossible here because
    the ratio domain is unbounded).

    Scale: (source, lang) cardinality aggregation (tiny), then one
    row per source. The collect_list is bounded by the number of
    distinct languages per source, not by corpus size.
    """
    d = load_table(spark, sf_dir, "documents").select(
        F.coalesce("lang", F.lit("")).alias("lang"),
        F.coalesce("source", F.lit("")).alias("source"),
    )
    per = d.groupBy("source", "lang").agg(F.count("*").alias("cnt"))
    agg = per.groupBy("source").agg(
        F.sum("cnt").alias("total_docs"),
        F.count("*").alias("n_langs"),
        F.array_sort(F.collect_list(F.struct("lang", "cnt"))).alias("cells"),
    )
    total = F.col("total_docs")
    ent = F.aggregate(
        F.col("cells"),
        F.lit(0.0),
        lambda acc, s: acc - (s.cnt / total) * F.log(s.cnt / total),
    )
    return agg.select(
        "source", "total_docs", "n_langs", ent.alias("lang_entropy")
    )


#: skew_report: top keys per profiled column
SKEW_TOP_N = 5


def skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profiler over the event stream's hot columns — the
    pre-join diagnostic that decides broadcast vs salt vs AQE: for each
    profiled column, the top-N keys by row count and their share of
    the table.

    One partial-agg shuffle per column (map-side combine makes each a
    distinct-cardinality exchange, not a row exchange), top-N via
    TakeOrderedAndProject heaps (orderBy + limit — never a global
    row_number window), shares as exact-long / exact-long double
    division. Output is 2·N rows — constant whatever the corpus.
    """
    ev = load_table(spark, sf_dir, "events")
    # relational scalar total (1-row broadcast cross join, the oracle's
    # own CTE shape) — the old eager ev.count() ran a full table scan
    # as a side effect of merely BUILDING the plan, so plan-only
    # consumers (planaudit, explain) paid a scan per compile, and the
    # table was scanned again by each branch (r10 review finding)
    total_rel = F.broadcast(ev.agg(F.count("*").alias("__total")))

    def top_for(col: str) -> DataFrame:
        # NULL keys fold to a sentinel BEFORE the sort: Spark ascending
        # sorts NULLS FIRST where DuckDB sorts them LAST, so a NULL key
        # tied at the top-N boundary would otherwise select different
        # row sets cross-engine (the dedup_exact sentinel convention)
        return (
            ev.groupBy(
                F.coalesce(F.col(col).cast("string"), F.lit("<NULL>"))
                .alias("key_value")
            )
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), "key_value")
            .limit(SKEW_TOP_N)
            .crossJoin(total_rel)
            .select(
                F.lit(col).alias("column_name"),
                "key_value",
                "cnt",
                (
                    F.col("cnt").cast("double")
                    / F.col("__total").cast("double")
                ).alias("share"),
            )
        )

    return top_for("event_type").unionByName(top_for("user_id"))


QUERIES = {
    "skew_report": skew_report,
    "repetition_ratios": repetition_ratios,
    "lang_source_chi2": lang_source_chi2,
    "source_entropy": source_entropy,
    "dq_expectations": dq_expectations,
    "rate_anomaly": rate_anomaly,
    "contamination_ngram": contamination_ngram,
    "zscore_outliers": zscore_outliers,
    "anomaly_mad": anomaly_mad,
    "bigram_lm_score": bigram_lm_score,
}

#: shared double-cast expected-count expression (engine mirror:
#: margins cast to double BEFORE the product, then one division)
_CHI2_EXPECTED = (
    "(CAST(lang_total AS DOUBLE) * CAST(source_total AS DOUBLE))"
    " / CAST(n_total AS DOUBLE)"
)

ORACLE = {
    "skew_report": f"""
        WITH t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM events),
        et AS (
            SELECT 'event_type' AS column_name,
                   COALESCE(CAST(event_type AS VARCHAR), '<NULL>')
                       AS key_value,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 2
            ORDER BY cnt DESC, key_value LIMIT {SKEW_TOP_N}
        ),
        uid AS (
            SELECT 'user_id' AS column_name,
                   COALESCE(CAST(user_id AS VARCHAR), '<NULL>')
                       AS key_value,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 2
            ORDER BY cnt DESC, key_value LIMIT {SKEW_TOP_N}
        )
        SELECT column_name, key_value, cnt,
               CAST(cnt AS DOUBLE) / t.total AS share
        FROM (SELECT * FROM et UNION ALL SELECT * FROM uid), t
    """,
    "lang_source_chi2": f"""
        WITH d AS (
            SELECT COALESCE(lang, '') AS lang,
                   COALESCE(source, '') AS source
            FROM documents
        ),
        obs AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS observed
            FROM d GROUP BY lang, source
        ),
        rt AS (
            SELECT lang, CAST(SUM(observed) AS BIGINT) AS lang_total
            FROM obs GROUP BY lang
        ),
        ct AS (
            SELECT source, CAST(SUM(observed) AS BIGINT) AS source_total
            FROM obs GROUP BY source
        ),
        nt AS (SELECT CAST(SUM(observed) AS BIGINT) AS n_total FROM obs),
        -- full cross product: structural zeros contribute `expected`
        cells AS (
            SELECT s.lang, s.source,
                   COALESCE(o.observed, 0) AS observed
            FROM (SELECT lang, source
                  FROM (SELECT lang FROM rt), (SELECT source FROM ct)) s
            LEFT JOIN obs o USING (lang, source)
        )
        SELECT c.lang, c.source, c.observed,
               {_CHI2_EXPECTED} AS expected,
               (CAST(c.observed AS DOUBLE) - {_CHI2_EXPECTED})
                 * (CAST(c.observed AS DOUBLE) - {_CHI2_EXPECTED})
                 / ({_CHI2_EXPECTED}) AS chi2_cell
        FROM cells c
        JOIN rt USING (lang)
        JOIN ct USING (source)
        CROSS JOIN nt
    """,
    "source_entropy": """
        WITH d AS (
            SELECT COALESCE(lang, '') AS lang,
                   COALESCE(source, '') AS source
            FROM documents
        ),
        per AS (
            SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM d GROUP BY source, lang
        )
        SELECT source,
               CAST(SUM(cnt) AS BIGINT) AS total_docs,
               CAST(COUNT(*) AS BIGINT) AS n_langs,
               list_reduce(list_transform(
                   list(cnt ORDER BY lang, cnt),
                   c -> -(CAST(c AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE))
                        * ln(CAST(c AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE))),
                   (x, y) -> x + y) + 0.0 AS lang_entropy
        FROM per GROUP BY source
    """,
    "rate_anomaly": f"""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        stats AS (
            SELECT event_type,
                   CAST(COUNT(*) AS DOUBLE) AS k,
                   CAST(SUM(n) AS DOUBLE) AS sx,
                   CAST(SUM(n * n) AS DOUBLE) AS sxx
            FROM hourly GROUP BY 1
        )
        SELECT h.event_type, h.hour, h.n,
               (CAST(h.n AS DOUBLE) - sx / k) /
               sqrt((k * sxx - sx * sx) / (k * (k - 1))) AS zscore
        FROM hourly h JOIN stats USING (event_type)
        WHERE k > 1
          AND abs((CAST(h.n AS DOUBLE) - sx / k) /
                  sqrt((k * sxx - sx * sx) / (k * (k - 1))))
              > {Z_THRESHOLD!r}
    """,
    "dq_expectations": f"""
        WITH m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
                   CAST(SUM(CASE WHEN o_custkey IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_cust,
                   CAST(SUM(CASE WHEN o_totalprice > 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                   CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1992-01-01'
                                  AND o_orderdate < TIMESTAMP '2005-01-01'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_dates,
                   CAST(SUM(CASE WHEN o_orderpriority IN
                            ('1-URGENT', '2-HIGH', '3-MEDIUM',
                             '4-NOT SPECIFIED', '5-LOW')
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_pri
            FROM orders
        ),
        checks AS (
            SELECT 'row_volume' AS check_name,
                   CAST(n AS DOUBLE) AS metric,
                   CAST({DQ_MIN_ROWS} AS DOUBLE) AS threshold FROM m
            UNION ALL SELECT 'key_unique',
                   CAST(n_keys AS DOUBLE) / CAST(n AS DOUBLE), 1.0 FROM m
            UNION ALL SELECT 'custkey_null_free',
                   CAST(n_cust AS DOUBLE) / CAST(n AS DOUBLE),
                   {DQ_NULL_FREE_RATE!r} FROM m
            UNION ALL SELECT 'price_positive',
                   CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE),
                   {DQ_PRICE_POSITIVE_RATE!r} FROM m
            UNION ALL SELECT 'date_in_range',
                   CAST(n_dates AS DOUBLE) / CAST(n AS DOUBLE),
                   {DQ_DATE_IN_RANGE_RATE!r} FROM m
            UNION ALL SELECT 'priority_in_domain',
                   CAST(n_pri AS DOUBLE) / CAST(n AS DOUBLE),
                   {DQ_PRIORITY_DOMAIN_RATE!r} FROM m
        )
        SELECT check_name, metric, threshold,
               metric >= threshold AS passed
        FROM checks
    """,
    "anomaly_mad": """
        WITH ev AS (
          SELECT event_type, value FROM events WHERE value IS NOT NULL
        ),
        med AS (
          SELECT event_type, quantile_cont(value, 0.5) AS med
          FROM ev GROUP BY event_type
        ),
        dev AS (
          SELECT e.event_type, ABS(e.value - m.med) AS dev, m.med
          FROM ev e JOIN med m USING (event_type)
        ),
        mad AS (
          SELECT event_type, quantile_cont(dev, 0.5) AS mad,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM dev GROUP BY event_type
        )
        SELECT d.event_type, m2.med AS median_value, m.mad, m.n,
               CAST(SUM(CASE WHEN d.dev > 3.0 * m.mad THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM dev d
        JOIN mad m USING (event_type)
        JOIN med m2 USING (event_type)
        GROUP BY d.event_type, m2.med, m.mad, m.n
    """,
    "bigram_lm_score": """
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        pos AS (
          SELECT doc_id, ws, unnest(range(1, len(ws))) AS g FROM w
        ),
        inst AS (
          SELECT doc_id, ws[g] || ' ' || ws[g + 1] AS bigram, ws[g] AS w1
          FROM pos
        ),
        model_b AS (
          SELECT bigram, COUNT(*) AS c_b FROM inst GROUP BY bigram
        ),
        model_u AS (
          SELECT w1, COUNT(*) AS c_u FROM inst GROUP BY w1
        ),
        scored AS (
          SELECT i.doc_id,
                 CAST(round(CAST(b.c_b AS DOUBLE) / CAST(u.c_u AS DOUBLE),
                            12) AS DECIMAL(16,12)) AS p
          FROM inst i
          JOIN model_b b USING (bigram)
          JOIN model_u u USING (w1)
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(p) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS lm_score
        FROM scored GROUP BY doc_id
    """,
    "repetition_ratios": """
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        pos AS (
          SELECT doc_id, ws, unnest(range(1, len(ws))) AS g FROM w
        ),
        bg AS (
          SELECT doc_id, ws[g] || ' ' || ws[g + 1] AS b FROM pos
        ),
        cnt AS (
          SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b
        ),
        top AS (
          SELECT doc_id, MAX(c) AS top_cnt, CAST(SUM(c) AS BIGINT) AS n_bigrams
          FROM cnt GROUP BY doc_id
        )
        SELECT w.doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
               CAST(len(list_distinct(ws)) AS DOUBLE)
                 / CAST(len(ws) AS DOUBLE) AS distinct_ratio,
               top.top_cnt AS top_bigram_cnt,
               CAST(top.top_cnt AS DOUBLE)
                 / CAST(len(ws) - 1 AS DOUBLE) AS top_bigram_frac
        FROM w JOIN top ON w.doc_id = top.doc_id
    """,
    "contamination_ngram": f"""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        pos AS (
          SELECT doc_id, ws,
                 unnest(range(1, len(ws) - {NGRAM_N} + 2)) AS i
          FROM w
        ),
        g AS (
          SELECT doc_id,
                 array_to_string(ws[i : i + {NGRAM_N} - 1], ' ') AS gram
          FROM pos
        ),
        bench AS (
          SELECT DISTINCT gram FROM g WHERE doc_id % {BENCH_MOD} = 0
        )
        SELECT g.doc_id,
               COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit,
               CAST(SUM(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 AS contamination_frac,
               (g.doc_id % {BENCH_MOD} = 0) AS is_benchmark
        FROM g LEFT JOIN bench ON g.gram = bench.gram
        GROUP BY g.doc_id
    """,
    "zscore_outliers": f"""
        WITH stats AS (
          SELECT event_type,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(value AS DECIMAL(18,4))
                          * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sxx
          FROM events WHERE value IS NOT NULL GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, e.value,
               (e.value - sx / n)
                 / sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS zscore
        FROM events e JOIN stats s ON e.event_type = s.event_type
        WHERE e.value IS NOT NULL AND n > 1
          AND abs((e.value - sx / n)
                 / sqrt((n * sxx - sx * sx) / (n * (n - 1)))) > {Z_THRESHOLD}
    """,
}
