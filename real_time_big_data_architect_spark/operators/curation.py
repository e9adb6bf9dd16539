"""Corpus-curation operators for training-data pipelines (north star NS6).

Absent from the reference (SURVEY §2.5); these are the shapes a 100 TB
pretraining-data pipeline runs between raw crawl and tokenizer:

- **stratified sampling** — deterministic per-language rates via a
  modulo residue on the document key: a pure filter, no shuffle, same
  rows on every run and every partitioning. Production swaps the
  residue for ``xxhash64(key) % 100`` — identical plan shape.
- **sequence packing** — greedy token-budget packing into fixed-size
  training sequences via an exclusive prefix sum: ``seq_id =
  prefix_tokens div BUDGET``, partitioned by language so the window
  (and the packing) parallelizes per stratum instead of serializing
  on a single global ordering.
- **per-source quota capping** — row_number over (source, length desc)
  keeps the N best documents per domain: one shuffle on ``source``,
  skew absorbed by AQE.
- **PII scrubbing** — regex redaction of emails/phones. The synthetic
  corpus contains no PII, so the query plants deterministic PII derived
  from ``doc_id`` and then scrubs it — the redaction regexes do real
  work and the oracle replicates plant + scrub exactly. Regexes stay in
  the Java-regex ∩ RE2 common subset (no lookarounds, no shorthand
  classes), so both engines match identically.
- **shard shuffling** — a deterministic affine permutation
  ``(key·A) mod 2^20`` (A odd → bijective) orders documents
  pseudo-randomly into K shards: the "shuffle the corpus before
  training" step without a nondeterministic ``rand()``, reproducible
  across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.functions.ranking import (
    ntile_from_rank,
    quantile_partitioned_rank,
)
from real_time_big_data_architect_spark.tables import load_table

#: per-language sampling rates, percent of documents kept
SAMPLE_RATES = {"en": 50, "de": 30}
SAMPLE_RATE_DEFAULT = 20

TOKENS_PER_SEQ = 2048

CAP_PER_SOURCE = 10

#: Java-regex ∩ RE2 subset: explicit classes only
EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
PHONE_RE = "\\+1-555-[0-9]{4}"

SHARD_MOD = 1 << 20  # permutation domain (production: 2^44)
SHARD_MULT = 2654435761 % SHARD_MOD  # Knuth multiplier, odd → bijective
N_SHARDS = 8


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: keep doc_id%100 < rate(lang)."""
    d = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", SAMPLE_RATES["en"])
        .when(F.col("lang") == "de", SAMPLE_RATES["de"])
        .otherwise(SAMPLE_RATE_DEFAULT)
    )
    return d.filter(F.pmod("doc_id", F.lit(100)) < rate).select(
        "doc_id", "lang", "source", "n_chars"
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into TOKENS_PER_SEQ-token training sequences.

    Token estimate = ceil(n_chars/4); ``seq_id`` = exclusive prefix sum
    of tokens div budget, per language — a document straddling a budget
    boundary starts inside the sequence its prefix lands in (contiguous
    packing, the streaming-friendly variant of greedy bin packing).
    """
    d = load_table(spark, sf_dir, "documents")
    tok = F.expr("(n_chars + 3) div 4")
    by_lang = Window.partitionBy("lang").orderBy("doc_id")
    prefix = F.coalesce(
        F.sum("tok_est").over(by_lang.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    packed = d.select("doc_id", "lang", tok.alias("tok_est")).withColumn(
        "prefix_tok", prefix
    )
    packed = packed.select(
        "doc_id",
        "lang",
        "tok_est",
        F.expr(f"prefix_tok div {TOKENS_PER_SEQ}").alias("seq_id"),
    )
    in_seq = Window.partitionBy("lang", "seq_id").orderBy("doc_id")
    return packed.withColumn("seq_pos", F.row_number().over(in_seq))


def cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota: keep the CAP_PER_SOURCE longest docs per source."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.select("doc_id", "source", "n_chars")
        .withColumn("quota_rank", F.row_number().over(w))
        .filter(F.col("quota_rank") <= CAP_PER_SOURCE)
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant deterministic PII, then scrub it with redaction regexes."""
    d = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(planted, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(planted, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(planted, F.lit(PHONE_RE), 0)).alias("n_phones"),
        F.md5(scrubbed).alias("scrub_md5"),
    )


#: md5-first-byte split thresholds over 256 buckets: train gets
#: buckets 00..e5 (230/256 ≈ 89.8%), val e6..f2 (13/256 ≈ 5.1%),
#: test f3..ff (13/256 ≈ 5.1%).
TRAIN_HEX = "e6"
VAL_HEX = "f3"


def _split_of(key):
    """'train'/'val'/'test' from the first md5 byte of ``key``.

    Hex strings compare bytewise identically in both engines, so the
    assignment is cross-engine exact; being hash-based (not id-modulo)
    it stays uniform under any key distribution and is stable when the
    corpus grows — a document never changes split as rows are added.
    """
    h = F.substring(F.md5(key.cast("string")), 1, 2)
    return (
        F.when(h < TRAIN_HEX, "train")
        .when(h < VAL_HEX, "val")
        .otherwise("test")
    )


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment, per-doc and leakage-safe.

    ``doc_split`` buckets each document independently; ``source_split``
    keys the hash on the source domain so every document from one
    source lands in the same split (no near-duplicate leakage across
    train/test). Pure map-side expressions — no shuffle, no stored
    state, same answer on any cluster layout.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "source",
        _split_of(F.col("doc_id")).alias("doc_split"),
        _split_of(F.col("source")).alias("source_split"),
    )


def shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Affine-permutation shuffle into N_SHARDS with within-shard order."""
    d = load_table(spark, sf_dir, "documents")
    perm = F.pmod(F.pmod("doc_id", F.lit(SHARD_MOD)) * SHARD_MULT, F.lit(SHARD_MOD))
    sharded = d.select("doc_id", perm.alias("shuffle_key")).withColumn(
        "shard", F.pmod("shuffle_key", F.lit(N_SHARDS)).cast("int")
    )
    # doc_id tiebreak: shuffle_key collides whenever two doc_ids agree
    # mod SHARD_MOD (2^20) — unreachable on the fixture but guaranteed
    # on scaled corpora with offset ids; without the tiebreak shard_pos
    # was arrival-order nondeterministic there (r10 review finding)
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return sharded.select(
        "doc_id", "shard", "shuffle_key", F.row_number().over(w).alias("shard_pos")
    )


#: char-window chunking geometry: 120-char windows every 90 chars
CHUNK_SIZE = 120
CHUNK_STRIDE = 90

#: language-mix temperature (alpha=0.5 → sqrt scaling, the multilingual
#: rebalancing exponent from the XLM-R / mT5 recipes)
MIX_MOD = 1 << 20

#: incremental-dedup batch residue: every 10th doc arrives as "new"
BATCH_MOD = 10


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width chunks — the context-window splitter.

    ``posexplode(sequence(1, len, stride))`` generates chunk starts
    row-locally (no shuffle, no driver loop); ``substring`` slices each
    window. Row count grows ~len/stride per doc, which is exactly how a
    100 TB chunker behaves: output scales with corpus size, every task
    emits its own chunks, and nothing synchronizes.
    """
    d = load_table(spark, sf_dir, "documents")
    # empty/NULL text -> zero chunks: Spark's sequence(1, 0) raises
    # (illegal ascending bounds) where DuckDB's range(1, 1) is empty,
    # so gate the generator; NULL length falls through the WHEN to the
    # empty array too (three-valued ELSE), matching unnest(NULL) = 0 rows
    starts = F.expr(
        f"CASE WHEN length(text) >= 1 THEN"
        f" sequence(1, length(text), {CHUNK_STRIDE})"
        f" ELSE array() END"
    )
    return d.select(
        "doc_id",
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
        "text",
    ).select(
        "doc_id",
        "chunk_id",
        "chunk_start",
        F.expr(f"substring(text, chunk_start, {CHUNK_SIZE})").alias("chunk_text"),
        F.length(
            F.expr(f"substring(text, chunk_start, {CHUNK_SIZE})")
        ).cast("bigint").alias("chunk_len"),
    )


def mix_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language-mix rebalancing (downsample-only).

    Target weights ∝ count^0.5 flatten the language skew; the keep rate
    per language is ``sqrt(min_count / count_l)`` (rarest language keeps
    everything). The sampler is the deterministic affine permutation
    ``(doc_id·A) mod 2^20`` scaled to [0,1) — exact integer arithmetic
    plus one IEEE division, reproducible on any engine and cluster
    layout. Counts are one tiny agg broadcast back onto the scan.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").count()
    min_cnt = counts.agg(F.min("count").alias("min_cnt"))
    rates = counts.crossJoin(F.broadcast(min_cnt)).select(
        "lang",
        (
            F.sqrt(F.col("min_cnt").cast("double"))
            / F.sqrt(F.col("count").cast("double"))
        ).alias("keep_rate"),
    )
    u = (
        F.pmod(F.pmod("doc_id", F.lit(MIX_MOD)) * SHARD_MULT, F.lit(MIX_MOD))
        .cast("double")
        / F.lit(float(MIX_MOD))
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .withColumn("u", u)
        .filter(F.col("u") < F.col("keep_rate"))
        .select("doc_id", "lang", "source", "keep_rate")
    )


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental dedup: new batch vs existing corpus.

    Docs with ``doc_id % 10 == 0`` arrive as the new batch; the rest are
    the standing corpus. The synthetic corpus has no natural exact
    duplicates, so half the batch (``doc_id % 20 == 0``) deterministically
    *plants* one by borrowing its successor's text — then the real kernel
    runs: fingerprint the batch, LEFT ANTI join against the corpus
    fingerprint set (a digest-only shuffle — at 100 TB the corpus side is
    a bucketed fingerprint table, not a re-scan), and keep the first
    batch doc per surviving fingerprint.
    """
    d = load_table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % BATCH_MOD == 0).alias("b")
    corpus = d.filter(F.col("doc_id") % BATCH_MOD != 0).alias("c")
    planted = (
        batch.join(
            corpus.select(
                F.col("doc_id").alias("n_id"), F.col("text").alias("n_text")
            ),
            F.col("n_id") == F.col("b.doc_id") + 1,
            "left",
        )
        .select(
            F.col("b.doc_id").alias("doc_id"),
            F.when(
                (F.col("b.doc_id") % (2 * BATCH_MOD) == 0)
                & F.col("n_text").isNotNull(),
                F.col("n_text"),
            )
            .otherwise(F.col("b.text"))
            .alias("text"),
        )
        .withColumn("fingerprint", F.md5("text"))
    )
    corpus_fp = corpus.select(F.md5("text").alias("fingerprint")).distinct()
    fresh = planted.join(corpus_fp, "fingerprint", "left_anti")
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        fresh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "fingerprint")
    )


#: ensemble weights for the curation score (lexical diversity, length
#: normalization, language prior) — mirrors FineWeb/Gopher-style
#: combined quality filters
SCORE_W = (0.5, 0.3, 0.2)
LEN_NORM_CAP = 2000


def _score_projection(docs: DataFrame) -> DataFrame:
    """The shared (doc_id, lang, score) projection — shuffle-free map
    pass; both decile assignments build on it so the formula cannot
    diverge between them."""
    words = F.split(F.col("text"), " ")
    distinct_ratio = F.size(F.array_distinct(words)).cast("double") / F.size(
        words
    ).cast("double")
    len_norm = (
        F.least(F.col("n_chars"), F.lit(LEN_NORM_CAP)).cast("double")
        / F.lit(float(LEN_NORM_CAP))
    )
    en = F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0))
    score = (
        F.lit(SCORE_W[0]) * distinct_ratio
        + F.lit(SCORE_W[1]) * len_norm
        + F.lit(SCORE_W[2]) * en
    )
    return docs.select("doc_id", "lang", score.alias("score"))


def curation_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble curation score + decile bucketing — the final "keep the
    top X%" ranking a pretraining pipeline applies after the individual
    gates: 0.5·distinct-word ratio + 0.3·capped-length norm +
    0.2·[lang=en], then NTILE(10) deciles for threshold sweeps.

    The score is a shuffle-free map pass (per-row array expressions);
    the decile replays NTILE(10) OVER (ORDER BY score DESC, doc_id)
    bit-exactly WITHOUT the single-partition window the window function
    itself would plan: global rank via the sketch-bounded two-pass
    row_number (functions/ranking.py — literal quantile bounds, keyed
    window, broadcast offsets; deterministic with NO input-sized
    persist), then the exact ANSI NTILE bucket as a map expression
    from (rank, N) via ntile_from_rank. Oracle unchanged —
    it still states plain NTILE. `decile_cutpoints` remains the
    percentile-cutpoint alternative when rank-exact bucket edges are
    not required. Every fp op token-mirrored in the oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    # persisted: the rank helper consumes its input three times
    # (quantile bounds, per-pid counts, final keyed window) — without
    # the cache the expensive tokenization in _score_projection would
    # run three times; the cached relation is the NARROW (doc_id,
    # lang, score) projection, not the corpus. Repo tools clearCache()
    # between queries (the session-wide convention).
    scored = _score_projection(docs).persist()
    ranked = quantile_partitioned_rank(
        scored, "score", "doc_id", descending=True, rank_col="__rnk"
    )
    # N from a plain COUNT(*) over the table: the rank helper no
    # longer persists anything, so riding its relation for N (the old
    # max(__rnk) trick) would recompute the whole rank pipeline; a
    # count-star scan is far cheaper than a second score+rank pass
    n_tbl = docs.agg(F.count("*").alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(n_tbl))
        .select(
            "doc_id",
            "lang",
            "score",
            ntile_from_rank(F.col("__rnk"), F.col("__n"), 10).alias(
                "decile"
            ),
        )
    )


def decile_cutpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NO-GLOBAL-SORT decile assignment curation_score's docstring
    promises: compute the 9 interior score percentiles once (one
    aggregation — at 100 TB, swap ``percentile`` for the mergeable
    ``approx_percentile`` sketch with identical plan shape), broadcast
    the 1-row cut-point set back, and assign each document's decile by
    comparison — a pure map pass instead of pushing the whole corpus
    through one NTILE window partition. Decile d = 1 + count of cut
    points strictly below the score (ascending: decile 10 = best);
    exact-percentile parity with quantile_cont makes it oracle-exact.
    """
    # built on the shared score projection directly — NOT on
    # curation_score, whose plan carries a global NTILE window that
    # only optimizer pruning would remove. Persisted: both the cut
    # computation and the assignment pass consume the scored corpus.
    scored = _score_projection(
        load_table(spark, sf_dir, "documents")
    ).persist()
    cuts = scored.agg(
        *[
            F.percentile("score", F.lit(i / 10.0)).alias(f"c{i}")
            for i in range(1, 10)
        ]
    )
    d = F.lit(1)
    for i in range(1, 10):
        d = d + (F.col("score") > F.col(f"c{i}")).cast("int")
    return scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id", "lang", "score", d.alias("decile")
    )


#: weighted-sample scale: a doc with n_chars >= SAMPLE_FULL_CHARS is
#: always kept; shorter docs keep with probability n_chars / that cap.
#: The md5-derived uniform has 2^32 resolution; the comparison is pure
#: 64-bit integer arithmetic (u * cap < n_chars * 2^32), so inclusion
#: is bit-exact across engines — no pow()/ln() libm dependence like a
#: textbook A-Res key would have.
SAMPLE_FULL_CHARS = 4000
_U32 = 1 << 32


#: per-group reservoir size
RESERVOIR_K = 5


def sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-per-group sample without replacement, deterministic:
    rank documents inside each source by their md5 coin and keep the
    first RESERVOIR_K — the distributed, rerun-stable equivalent of a
    per-group reservoir (every subset of size k is equally likely under
    the hash ordering, and the same rows are chosen on every run and
    every cluster layout).

    One shuffle on the group key + an in-partition top-k sort; at
    100 TB the window degrades gracefully under AQE and the sample
    NEVER grows with the corpus — k rows per group, full stop.
    """
    d = load_table(spark, sf_dir, "documents")
    coin = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(coin, "doc_id")
    return (
        d.select("doc_id", "source", "n_chars", coin.alias("coin"))
        .withColumn("draw_rank", F.row_number().over(w))
        .filter(F.col("draw_rank") <= RESERVOIR_K)
        .select("doc_id", "source", "n_chars", "draw_rank")
    )


#: global exact-sample size
SAMPLE_EXACT_K = 100


def sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-k uniform global sample, deterministic: order the corpus
    by its md5 coin and keep the first SAMPLE_EXACT_K — the "give me
    exactly 100k docs, reproducibly" primitive a Bernoulli fraction
    cannot provide (its output size is itself random) and a driver-side
    reservoir cannot scale.

    Physical plan: TakeOrderedAndProject — every partition keeps a
    k-row heap of (coin, doc_id) and one reduce merges them, so driver
    memory is O(k) and NOTHING global sorts, at any corpus size. Under
    the hash ordering every k-subset is equally likely, and the same
    rows come back on every run and every cluster layout (the
    train_test_split / shuffle_shards determinism discipline).
    """
    d = load_table(spark, sf_dir, "documents")
    coin = F.md5(F.col("doc_id").cast("string"))
    return (
        d.select("doc_id", "source", "n_chars", coin.alias("coin"))
        .orderBy("coin", "doc_id")
        .limit(SAMPLE_EXACT_K)
    )


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted Bernoulli sample of the corpus — 'sample tokens,
    not documents': inclusion probability proportional to n_chars, so
    the expected token mass per source is preserved while short-doc
    noise is down-weighted.

    Deterministic and reproducible on any cluster layout: the coin is
    the first 8 md5 hex digits of doc_id — a pure map-side projection
    with NO shuffle, no RNG state, and the same verdict on re-runs
    (the property incremental pipelines need: re-sampling yesterday's
    shard never flips membership). Wholly integer comparisons.
    """
    d = load_table(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    keep = (u * F.lit(SAMPLE_FULL_CHARS)) < (
        F.col("n_chars").cast("bigint") * F.lit(_U32)
    )
    p = F.least(
        F.lit(1.0),
        F.col("n_chars").cast("double") / F.lit(float(SAMPLE_FULL_CHARS)),
    )
    return d.filter(keep).select(
        "doc_id", "source", "n_chars", p.alias("p_include")
    )


#: curation_funnel gates, applied CUMULATIVELY in this order — the
#: funnel report every corpus-curation pipeline publishes per crawl
_FUNNEL_STAGES = (
    "total",
    "non_null_text",
    "length_ok",
    "lang_en",
    "dedup_survivor",
)


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation FUNNEL: per-stage survivor counts through the
    cumulative gate cascade (non-null text → length ≥ 100 → lang=en →
    exact-dedup survivor) — the report a pretraining-data pipeline
    ships with every crawl drop ("we started with N docs, kept K").

    One corpus scan computes every per-doc gate flag; the only shuffle
    is the 16-byte digest window that marks exact-dedup survivors
    (lowest doc_id per md5(text), the dedup_exact convention — NULL
    texts are their own survivor group via a sentinel). Counts then
    collapse in a single aggregate and unpivot to one row per stage —
    dimension-sized output, corpus-independent. survival_rate divides
    exact longs into a double, so the hash is bit-stable.
    """
    d = load_table(spark, sf_dir, "documents")
    dg = F.coalesce(F.md5("text"), F.lit("<NULL>"))
    w = Window.partitionBy(dg).orderBy("doc_id")
    flags = d.select(
        F.col("text").isNotNull().alias("g1"),
        (F.col("n_chars") >= 100).alias("g2"),
        (F.col("lang") == "en").alias("g3"),
        (F.row_number().over(w) == 1).alias("g4"),
    )
    agg = flags.agg(
        F.count("*").alias("n0"),
        F.sum(F.col("g1").cast("long")).alias("n1"),
        F.sum((F.col("g1") & F.col("g2")).cast("long")).alias("n2"),
        F.sum((F.col("g1") & F.col("g2") & F.col("g3")).cast("long")).alias(
            "n3"
        ),
        F.sum(
            (F.col("g1") & F.col("g2") & F.col("g3") & F.col("g4")).cast(
                "long"
            )
        ).alias("n4"),
    )
    stack = ", ".join(
        f"{i}, '{s}', n{i}" for i, s in enumerate(_FUNNEL_STAGES)
    )
    return agg.selectExpr(
        f"stack({len(_FUNNEL_STAGES)}, {stack})"
        " AS (stage_idx, stage, n_docs)",
        "n0",
    ).selectExpr(
        "stage_idx",
        "stage",
        "n_docs",
        "CAST(n_docs AS DOUBLE) / CAST(n0 AS DOUBLE) AS survival_rate",
    )


QUERIES = {
    "curation_funnel": curation_funnel,
    "curation_score": curation_score,
    "decile_cutpoints": decile_cutpoints,
    "sample_stratified": sample_stratified,
    "pack_sequences": pack_sequences,
    "cap_per_source": cap_per_source,
    "pii_scrub": pii_scrub,
    "train_test_split": train_test_split,
    "shuffle_shards": shuffle_shards,
    "doc_chunks": doc_chunks,
    "mix_reweight": mix_reweight,
    "dedup_incremental": dedup_incremental,
    "sample_weighted": sample_weighted,
    "sample_exact_k": sample_exact_k,
    "sample_reservoir_group": sample_reservoir_group,
}

_SCORED_CTE = f"""
        WITH scored AS (
          SELECT doc_id, lang,
                 CAST({SCORE_W[0]!r} AS DOUBLE)
                   * (CAST(len(list_distinct(string_split(text, ' ')))
                           AS DOUBLE)
                      / CAST(len(string_split(text, ' ')) AS DOUBLE))
                 + CAST({SCORE_W[1]!r} AS DOUBLE)
                   * (CAST(LEAST(n_chars, {LEN_NORM_CAP}) AS DOUBLE)
                      / CAST({float(LEN_NORM_CAP)!r} AS DOUBLE))
                 + CAST({SCORE_W[2]!r} AS DOUBLE)
                   * (CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END) AS score
          FROM documents
        )
"""

_CUTS = ",\n               ".join(
    f"quantile_cont(score, {i / 10.0!r}) AS c{i}" for i in range(1, 10)
)
_DSUM = " + ".join(
    f"CASE WHEN s.score > c.c{i} THEN 1 ELSE 0 END" for i in range(1, 10)
)

ORACLE = {
    "curation_funnel": """
        WITH flags AS (
            SELECT text IS NOT NULL AS g1,
                   n_chars >= 100 AS g2,
                   lang = 'en' AS g3,
                   ROW_NUMBER() OVER (
                       PARTITION BY COALESCE(md5(text), '<NULL>')
                       ORDER BY doc_id) = 1 AS g4
            FROM documents
        ),
        agg AS (
            -- CAST the SUMs back down: DuckDB SUM(BIGINT) is HUGEINT,
            -- which pandas would coerce to float64 and break the hash
            SELECT COUNT(*) AS n0,
                   CAST(SUM(CAST(g1 AS BIGINT)) AS BIGINT) AS n1,
                   CAST(SUM(CAST(g1 AND g2 AS BIGINT)) AS BIGINT) AS n2,
                   CAST(SUM(CAST(g1 AND g2 AND g3 AS BIGINT))
                        AS BIGINT) AS n3,
                   CAST(SUM(CAST(g1 AND g2 AND g3 AND g4 AS BIGINT))
                        AS BIGINT) AS n4
            FROM flags
        )
        SELECT s.stage_idx, s.stage,
               CASE s.stage_idx WHEN 0 THEN n0 WHEN 1 THEN n1
                    WHEN 2 THEN n2 WHEN 3 THEN n3 ELSE n4 END AS n_docs,
               CAST(CASE s.stage_idx WHEN 0 THEN n0 WHEN 1 THEN n1
                    WHEN 2 THEN n2 WHEN 3 THEN n3 ELSE n4 END AS DOUBLE)
                   / CAST(n0 AS DOUBLE) AS survival_rate
        FROM agg,
             (VALUES (0, 'total'), (1, 'non_null_text'), (2, 'length_ok'),
                     (3, 'lang_en'), (4, 'dedup_survivor'))
                 s(stage_idx, stage)
    """,
    "sample_reservoir_group": f"""
        SELECT doc_id, source, n_chars, draw_rank
        FROM (
            SELECT doc_id, source, n_chars,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS INT) AS draw_rank
            FROM documents
        ) WHERE draw_rank <= {RESERVOIR_K}
    """,
    "sample_exact_k": f"""
        SELECT doc_id, source, n_chars,
               md5(CAST(doc_id AS VARCHAR)) AS coin
        FROM documents
        ORDER BY coin, doc_id
        LIMIT {SAMPLE_EXACT_K}
    """,
    "sample_weighted": f"""
        SELECT doc_id, source, n_chars,
               LEAST(1.0, CAST(n_chars AS DOUBLE) /
                          CAST({float(SAMPLE_FULL_CHARS)!r} AS DOUBLE))
                   AS p_include
        FROM documents
        WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) * {SAMPLE_FULL_CHARS}
              < CAST(n_chars AS BIGINT) * {_U32}
    """,
    "decile_cutpoints": _SCORED_CTE
    + f""",
        cuts AS (
            SELECT {_CUTS}
            FROM scored
        )
        SELECT s.doc_id, s.lang, s.score,
               -- NULL score (NULL text) -> NULL decile, matching the
               -- engine's (NULL > cut) three-valued propagation; the
               -- bare CASE chain would count NULL comparisons as 0
               -- and misfile the doc into decile 1
               CAST(CASE WHEN s.score IS NULL THEN NULL
                    ELSE 1 + {_DSUM} END AS INT) AS decile
        FROM scored s CROSS JOIN cuts c
    """,
    "curation_score": _SCORED_CTE
    + """
        SELECT doc_id, lang, score,
               CAST(NTILE(10) OVER (ORDER BY score DESC, doc_id) AS INT)
                 AS decile
        FROM scored
    """,
    "sample_stratified": """
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE doc_id % 100 < (CASE WHEN lang = 'en' THEN 50
                                   WHEN lang = 'de' THEN 30
                                   ELSE 20 END)
    """,
    "pack_sequences": """
        WITH toks AS (
          SELECT doc_id, lang, (n_chars + 3) // 4 AS tok_est
          FROM documents
        ),
        packed AS (
          SELECT doc_id, lang, tok_est,
                 COALESCE(SUM(tok_est) OVER (
                     PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) // 2048 AS seq_id
          FROM toks
        )
        SELECT doc_id, lang, tok_est, CAST(seq_id AS BIGINT) AS seq_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang, seq_id ORDER BY doc_id
               ) AS INT) AS seq_pos
        FROM packed
    """,
    "cap_per_source": """
        SELECT * FROM (
          SELECT doc_id, source, n_chars,
                 CAST(ROW_NUMBER() OVER (
                     PARTITION BY source ORDER BY n_chars DESC, doc_id
                 ) AS INT) AS quota_rank
          FROM documents
        ) WHERE quota_rank <= 10
    """,
    "pii_scrub": """
        WITH planted AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com or +1-555-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     AS aug
          FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(aug, '[a-z0-9]+@[a-z]+\\.[a-z]+'))
                    AS INT) AS n_emails,
               CAST(len(regexp_extract_all(aug, '\\+1-555-[0-9]{4}'))
                    AS INT) AS n_phones,
               md5(regexp_replace(
                     regexp_replace(aug, '[a-z0-9]+@[a-z]+\\.[a-z]+',
                                    '<EMAIL>', 'g'),
                     '\\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS scrub_md5
        FROM planted
    """,
    "train_test_split": f"""
        SELECT doc_id, source,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                        < '{TRAIN_HEX}' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                        < '{VAL_HEX}' THEN 'val'
                    ELSE 'test' END AS doc_split,
               CASE WHEN substr(md5(source), 1, 2)
                        < '{TRAIN_HEX}' THEN 'train'
                    WHEN substr(md5(source), 1, 2)
                        < '{VAL_HEX}' THEN 'val'
                    ELSE 'test' END AS source_split
        FROM documents
    """,
    "shuffle_shards": f"""
        SELECT doc_id, shard, shuffle_key,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY shard ORDER BY shuffle_key, doc_id
               ) AS INT) AS shard_pos
        FROM (
          SELECT doc_id,
                 (doc_id % {SHARD_MOD}) * {SHARD_MULT} % {SHARD_MOD}
                     AS shuffle_key,
                 CAST((doc_id % {SHARD_MOD}) * {SHARD_MULT} % {SHARD_MOD}
                      % {N_SHARDS} AS INT) AS shard
          FROM documents
        )
    """,
    "doc_chunks": f"""
        WITH pos AS (
          SELECT doc_id, text,
                 unnest(range(1, length(text) + 1, {CHUNK_STRIDE}))
                     AS chunk_start
          FROM documents
        )
        SELECT doc_id,
               CAST((chunk_start - 1) // {CHUNK_STRIDE} AS INT) AS chunk_id,
               CAST(chunk_start AS INT) AS chunk_start,
               substr(text, CAST(chunk_start AS INT), {CHUNK_SIZE})
                   AS chunk_text,
               CAST(length(substr(text, CAST(chunk_start AS INT),
                                  {CHUNK_SIZE})) AS BIGINT) AS chunk_len
        FROM pos
    """,
    "mix_reweight": f"""
        WITH counts AS (
          SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
        ),
        rates AS (
          SELECT lang,
                 sqrt(CAST((SELECT MIN(cnt) FROM counts) AS DOUBLE))
                   / sqrt(CAST(cnt AS DOUBLE)) AS keep_rate
          FROM counts
        )
        SELECT d.doc_id, d.lang, d.source, r.keep_rate
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE CAST((d.doc_id % {MIX_MOD}) * {SHARD_MULT} % {MIX_MOD}
                   AS DOUBLE) / {float(MIX_MOD)} < r.keep_rate
    """,
    "dedup_incremental": f"""
        WITH batch AS (
          SELECT b.doc_id,
                 CASE WHEN b.doc_id % {2 * BATCH_MOD} = 0
                           AND n.text IS NOT NULL
                      THEN n.text ELSE b.text END AS text
          FROM (SELECT * FROM documents WHERE doc_id % {BATCH_MOD} = 0) b
          LEFT JOIN (SELECT * FROM documents
                     WHERE doc_id % {BATCH_MOD} <> 0) n
            ON n.doc_id = b.doc_id + 1
        ),
        fp AS (
          SELECT doc_id, md5(text) AS fingerprint FROM batch
        ),
        corpus_fp AS (
          SELECT DISTINCT md5(text) AS fingerprint FROM documents
          WHERE doc_id % {BATCH_MOD} <> 0
        )
        SELECT doc_id, fingerprint FROM (
          SELECT f.doc_id, f.fingerprint,
                 ROW_NUMBER() OVER (PARTITION BY f.fingerprint
                                    ORDER BY f.doc_id) AS rn
          FROM fp f
          WHERE NOT EXISTS (SELECT 1 FROM corpus_fp c
                            WHERE c.fingerprint = f.fingerprint)
        ) WHERE rn = 1
    """,
}
