"""Text-analysis operators for training-data pipelines (north star NS6c).

Absent from the reference; all hot paths are built-in expressions
(split/explode/length/regexp) inside whole-stage codegen — the only
Python is the language-ID scorer, and even that is a vectorized
Pandas UDF over Arrow batches, not per-row Python.

- word count / top words (tokenize → explode → groupBy)
- per-language corpus stats
- token counting: whitespace tokens + a BPE-ish subword estimate
- quality scoring: length / punctuation ratio / stopword ratio /
  mean word length — the standard cheap quality gates
- language ID: n-gram frequency heuristic (deterministic, stubbed
  profile table — the container has no langid lib; the Spark-side
  plumbing is real and tested)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_big_data_architect_spark.tables import load_table

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize → explode → word count (NS6c). Full word histogram;
    deterministic because no limit is applied."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_occurrences"))
    )


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats: docs, chars, tokens (NS6c)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " "))
    return (
        d.select("lang", "n_chars", toks.alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.col("n_tokens").cast("bigint")).alias("total_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def _n_words() -> "F.Column":
    """Whitespace word count — shared by every text gate."""
    return F.size(F.split("text", " "))


def _mean_word_len(n_words) -> "F.Column":
    """(chars - spaces) / words as exact-int-into-double — the shared
    gate formula (single source of truth across text_quality and
    curate_corpus; the oracles mirror this exact expression)."""
    return (
        (F.length("text") - n_words + 1).cast("double")
        / n_words.cast("double")
    )


def _est_bpe_tokens() -> "F.Column":
    """ceil(chars/4) — the public BPE rule-of-thumb, exact-integer in
    both engines; shared by token_count and curate_corpus."""
    return ((F.col("n_chars") + 3) / 4).cast("bigint")



def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per doc: whitespace words + a BPE-ish estimate.

    The subword estimate is ceil(chars/4) — the public
    rule-of-thumb for byte-pair-encoded English (~4 chars/token);
    computed as an exact integer expression in both engines.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        _n_words().alias("n_words"),
        _est_bpe_tokens().alias("est_bpe_tokens"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap quality gates: length, stopword ratio, mean word length.

    Ratios are exact decimal divisions cast to double so the hash
    matches the oracle.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = _n_words()
    n_stop = F.size(F.filter(words, lambda wd: wd.isin(*STOPWORDS)))
    return d.select(
        "doc_id",
        "n_chars",
        n_words.alias("n_words"),
        (n_stop.cast("double") / n_words.cast("double")).alias("stopword_ratio"),
        _mean_word_len(n_words).alias("mean_word_len"),
        (F.col("n_chars") >= 100).alias("len_ok"),
    )


_LANG_PROFILES = {
    # deterministic stub profiles: most-frequent words per language.
    # A production system would ship real n-gram profiles; the Spark
    # plumbing (broadcast dict + Arrow-batched pandas_udf) is the same.
    "en": {"the", "and", "of", "to", "is"},
    "de": {"der", "die", "und", "das", "ist"},
    "es": {"el", "la", "de", "que", "es"},
    "fr": {"le", "la", "et", "les", "des"},
    "zh": {"的", "是", "了", "在", "我"},
}


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic as a vectorized Pandas UDF (NS6c).

    Scores each profile by hit count over the doc's words; emits the
    argmax (ties → the FIRST tied language in fixed profile order —
    'en' only when 'en' participates in the tie; the oracle's CASE
    chain encodes the same rule). NULL text → NULL, matching the SQL
    twin. Arrow-batched — the UDF sees pandas Series, not rows.
    """
    profiles = list(_LANG_PROFILES.items())

    @F.pandas_udf(T.StringType())
    def detect(texts: pd.Series) -> pd.Series:
        def best(text):
            if text is None:
                return None
            words = set(text.split(" ")[:200])
            scores = [(lang, len(words & prof)) for lang, prof in profiles]
            return max(scores, key=lambda kv: kv[1])[0]

        return texts.map(best)

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", detect("text").alias("detected_lang"))


def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval confusion matrix for the language-ID heuristic:
    per (labelled lang, detected lang) cell, count and within-label
    rate — the report that decides whether a lang-ID model is good
    enough to gate a corpus on.

    Composes the Arrow-batched lang_id UDF with a dimension-sized
    aggregation (|langs|² cells); rates divide exact longs per label
    (label totals broadcast back onto the cell table). The oracle
    wraps lang_id's generated CASE-chain twin in the same GROUP BY, so
    the UDF's argmax/tie/NULL semantics stay hash-pinned through the
    aggregation too.
    """
    detected = lang_id(spark, sf_dir)
    cells = detected.groupBy("lang", "detected_lang").agg(
        F.count("*").alias("n_docs")
    )
    totals = cells.groupBy("lang").agg(F.sum("n_docs").alias("n_label"))
    return cells.join(F.broadcast(totals), "lang").select(
        "lang",
        "detected_lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("n_label").cast("double"))
        .alias("label_rate"),
        (F.col("lang") == F.col("detected_lang")).alias("is_correct"),
    )


#: BPE-ish pre-tokenizer: letter runs, digit runs, single other marks.
#: Kept to constructs with identical semantics in Java regex (Spark)
#: and RE2 (DuckDB) — no lookarounds, no \\w ambiguity.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex pre-tokenization counts (the 'BPE-ish regex' path): letter
    runs + digit runs + individual punctuation marks, the shape of a
    GPT-style pre-tokenizer's first split. Compare with token_count's
    chars/4 heuristic."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(TOKEN_PATTERN), 0)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_regex_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


CURATE_LANGS = ("en", "de", "fr", "es")
CURATE_MIN_CHARS = 100
CURATE_MIN_WORDS = 20
CURATE_MAX_MEAN_WORD_LEN = 15.0


def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline: the composed training-data op.

    exact-dedup survivors → language whitelist → cheap quality gates
    (min chars, min words, mean word length) → token accounting. One
    digest-keyed shuffle (the dedup window); every other stage is a
    scan-local expression, so the whole pipeline is dedup-shuffle +
    map at 100 TB. This is the shape a pretraining-data curation job
    actually runs.
    """
    d = load_table(spark, sf_dir, "documents")
    n_words = _n_words()
    mean_wl = _mean_word_len(n_words)
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("lang").isin(*CURATE_LANGS))
        .filter(
            (F.col("n_chars") >= CURATE_MIN_CHARS)
            & (n_words >= CURATE_MIN_WORDS)
            & (mean_wl <= CURATE_MAX_MEAN_WORD_LEN)
        )
        .select(
            "doc_id",
            "lang",
            "source",
            n_words.alias("n_words"),
            _est_bpe_tokens().alias("est_bpe_tokens"),
        )
    )


TFIDF_TOP_K = 3


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (NS6c).

    tf = term count in the doc; idf is the RAW inverse document
    frequency N/df (not ln(N/df)): measured on this fixture, JVM
    ``Math.log`` and DuckDB's libm ``ln`` disagree by 1-2 ulp on the
    same ratios, so the log form cannot pass a bit-exact oracle gate.
    The raw form is monotone in N/df for fixed tf, integer-derived
    (exact in both engines), and keeps the query fully hash-checked;
    swap in ``F.log`` for the textbook weighting when cross-engine
    exactness isn't required. Two aggregations (per-doc-term, per-term)
    + broadcasts of the vocabulary-sized df table and the 1-row corpus
    count — nothing corpus-sized shuffles twice at scale.
    """
    # no fan_out: this is a pure built-in split/explode/groupBy
    # pipeline (no Python kernel), where the round-robin pre-shuffle
    # of full document rows costs more than the extra cores recover —
    # the measured trade fan_out's own docstring documents; input
    # splits provide the parallelism on a real lake
    d = load_table(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = d.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf") * (F.col("n_docs") / F.col("df"))).alias(
                "tfidf"
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "df", "tfidf", "rn")
    )


#: BM25 free parameters (Robertson's defaults) and the fixed query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("table", "stream", "vector")


def _bm25_term_expr(term: str) -> str:
    """One BM25 term's score — the identical token sequence runs in both
    engines (columns ``tf_<t>``, ``dfv_<t>``, ``n_docs``, ``dl``,
    ``avgdl`` must be in scope), so every fp op rounds identically."""
    return (
        f"((CAST(n_docs AS DOUBLE) - CAST(dfv_{term} AS DOUBLE) + 0.5)"
        f" / (CAST(dfv_{term} AS DOUBLE) + 0.5))"
        f" * (CAST(tf_{term} AS DOUBLE) * ({BM25_K1} + 1.0))"
        f" / (CAST(tf_{term} AS DOUBLE)"
        f" + {BM25_K1} * (1.0 - {BM25_B}"
        f" + {BM25_B} * CAST(dl AS DOUBLE) / avgdl))"
    )


def bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed query (NS6c).

    Per-term tf comes from ``size(filter(words, ...))`` — per-row JVM
    array expressions, no explode and no corpus-sized shuffle; the
    corpus statistics (N, Σdl, per-term df) reduce to ONE row in a
    single pass and broadcast back onto the scan. idf stays in the raw
    rational form (N - df + 0.5)/(df + 0.5) — same reasoning as
    ``tfidf_top_terms``: libm ``ln`` differs 1-2 ulp cross-engine and
    would break the bit-exact oracle gate; the rational form preserves
    the ranking for fixed tf. The 3 term scores add in fixed textual
    order, so the sum is order-deterministic.
    """
    d = load_table(spark, sf_dir, "documents")
    d = d.withColumn("w", F.split("text", " ")).withColumn(
        "dl", F.size("w").cast("bigint")
    )
    for t in BM25_TERMS:
        d = d.withColumn(
            f"tf_{t}", F.expr(f"size(filter(w, x -> x = '{t}'))").cast("bigint")
        )
    stats = d.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("bigint")).alias(f"dfv_{t}")
            for t in BM25_TERMS
        ],
    )
    scored = d.crossJoin(F.broadcast(stats)).withColumn(
        "avgdl",
        F.expr("CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)"),
    )
    total = " + ".join(f"({_bm25_term_expr(t)})" for t in BM25_TERMS)
    return scored.select(
        "doc_id",
        "dl",
        *[F.col(f"tf_{t}") for t in BM25_TERMS],
        F.expr(total).alias("bm25"),
    )


#: tokenizer-vocabulary size for coverage analysis
VOCAB_TOP = 1000


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document vocabulary coverage / OOV rate against the corpus
    top-``VOCAB_TOP`` word vocabulary — the tokenizer-fit diagnostic
    run before training a tokenizer or adopting one (high OOV → the
    vocab wastes capacity; per-language OOV skews reveal coverage
    gaps).

    Pass 1 builds the vocabulary: word counts, global top-V by
    (count DESC, word ASC) — a rank over ONE all-corpus-words
    partition, which is fine because the ranked relation is already
    the aggregated word-count table (vocabulary-sized, not
    corpus-sized); at 100 TB this is a few million rows on one
    reducer, the standard global-top-k shape. Pass 2 explodes
    documents to (doc_id, word) and broadcast-left-joins the V-row
    vocab; per-doc coverage is one re-aggregation on doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    # persisted: the vocabulary count and the coverage join both
    # consume the corpus-wide word explode
    inst = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.col("text"), " ")).alias("word"),
        )
        # same token definition as tfidf/inverted_index/collocations:
        # empty-string tokens (double/edge spaces) are not words — they
        # would otherwise inflate n_tokens and could rank '' into the
        # vocabulary, deflating every oov_rate
        .filter(F.col("word") != "")
        .persist()
    )
    wc = inst.groupBy("word").agg(F.count("*").alias("c"))
    # global top-VOCAB_TOP as orderBy().limit(): TakeOrderedAndProject
    # keeps per-partition heaps of VOCAB_TOP rows — the distributed
    # top-k — where the former row_number() over an unpartitioned
    # window funneled the ENTIRE vocabulary through one task (the same
    # scale-killer the r5 rank rewires removed elsewhere). Selection
    # and tiebreak (count desc, word) are identical.
    vocab = (
        wc.orderBy(F.col("c").desc(), F.col("word"))
        .limit(VOCAB_TOP)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    return (
        inst.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce(F.col("in_vocab"), F.lit(0)).cast("bigint")).alias(
                "n_in_vocab"
            ),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "n_in_vocab",
            (
                F.lit(1.0)
                - F.col("n_in_vocab").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("oov_rate"),
        )
    )


#: collocation support floor: bigrams seen fewer times are noise and
#: are cut BEFORE the vocabulary joins (shrinks the join input ~50×).
COLLOC_MIN_COUNT = 5


def collocations_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram collocation mining by pointwise lift — PMI without the
    log: lift(a,b) = p(a,b) / (p(a)·p(b)) over corpus bigrams (NS6c).

    Bigrams come from one zip-with-next explode (``arrays_zip`` of the
    token list against itself shifted by one) — no self-join, no
    positional shuffle; the corpus is touched twice (unigram + bigram
    counts), each a partial-agg count shuffle. The support filter runs
    before the two vocabulary joins, so only surviving bigrams join
    against the unigram counts. Lift stays a ratio of integer counts
    evaluated in one fixed double expression tree — bit-exact vs the
    oracle (a log-PMI would diverge in libm across engines).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("l"))
    uni = (
        toks.select(F.explode("l").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("c_w"))
    )
    big = (
        toks.select(
            F.explode(
                F.expr(
                    "arrays_zip(slice(l, 1, size(l)-1), slice(l, 2, size(l)-1))"
                )
            ).alias("p")
        )
        .select(
            F.col("p")["0"].alias("w1"), F.col("p")["1"].alias("w2")
        )
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    btot = big.agg(F.count("*").alias("bt"))
    utot = uni.agg(F.sum("c_w").alias("ut"))
    pairs = (
        big.groupBy("w1", "w2")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= COLLOC_MIN_COUNT)
    )
    joined = (
        pairs.join(uni.withColumnRenamed("word", "w1"), "w1")
        .withColumnRenamed("c_w", "c_a")
        .join(uni.withColumnRenamed("word", "w2"), "w2")
        .withColumnRenamed("c_w", "c_b")
        .crossJoin(F.broadcast(btot))
        .crossJoin(F.broadcast(utot))
    )
    lift = (
        F.col("c_ab").cast("double") / F.col("bt").cast("double")
    ) / (
        (F.col("c_a").cast("double") / F.col("ut").cast("double"))
        * (F.col("c_b").cast("double") / F.col("ut").cast("double"))
    )
    return joined.select(
        "w1", "w2", "c_ab", "c_a", "c_b", lift.alias("lift")
    )


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term → document frequency, total term
    frequency, and the ordered posting list (as min/max/md5 since a
    100 TB posting list is itself a table, not a row) — the retrieval
    structure behind BM25 serving.

    One explode + one (term, doc) pre-agg (positions collapse early, so
    the wide explode never reaches the second shuffle) + one per-term
    agg. The posting digest hashes the '_'-joined ascending doc list
    built by sort_array — deterministic, so two index builds (or two
    engines) can be diffed by digest alone.
    """
    d = load_table(spark, sf_dir, "documents")
    inst = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    per_doc = inst.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf")
    )
    return per_doc.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("total_tf"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.md5(
            F.array_join(F.sort_array(F.collect_list("doc_id")), "_")
        ).alias("postings_md5"),
    )


#: phrase-merge rounds (BPE-style vocabulary induction at word level —
#: the word2vec phrase-mining shape): each round merges the corpus's
#: most frequent adjacent pair into one token.
PHRASE_ROUNDS = 2
#: only plain alphanumeric tokens participate (keeps the literal
#: replace() pattern unambiguous; merged tokens carry '_' and sit out
#: later rounds)
_WORD_RE = "^[a-z0-9]+$"


def _merge_round(df: DataFrame, r: int) -> DataFrame:
    """One merge round: find the top adjacent pair, rewrite every text.

    The rewrite is a literal double-pass replace on space-padded text
    (' w1 w2 ' → ' w1_w2 '): a single left-to-right pass misses every
    second occurrence of an alternating run ('a b a b'), the second
    pass catches it; both engines' replace() share these semantics
    token-for-token, so the rewritten corpus is byte-identical.
    """
    toks = df.select(F.split("t", " ").alias("l"))
    big = toks.select(
        F.explode(
            F.expr(
                "arrays_zip(slice(l, 1, size(l)-1), slice(l, 2, size(l)-1))"
            )
        ).alias("p")
    ).select(F.col("p")["0"].alias("w1"), F.col("p")["1"].alias("w2"))
    top = (
        big.filter(
            F.col("w1").rlike(_WORD_RE) & F.col("w2").rlike(_WORD_RE)
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "w1", "w2")
        .limit(1)
    )
    pat = F.concat(F.lit(" "), F.col("w1"), F.lit(" "), F.col("w2"), F.lit(" "))
    rep = F.concat(F.lit(" "), F.col("w1"), F.lit("_"), F.col("w2"), F.lit(" "))
    padded = F.concat(F.lit(" "), F.col("t"), F.lit(" "))
    merged = F.trim(F.replace(F.replace(padded, pat, rep), pat, rep))
    return df.crossJoin(F.broadcast(top)).select(
        *[c for c in df.columns if c != "t"],
        merged.alias("t"),
        F.concat(F.col("w1"), F.lit(" "), F.col("w2")).alias(f"phrase_{r}"),
    )


def phrase_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style phrase merging as a relational loop: PHRASE_ROUNDS
    rounds of (count adjacent pairs → take the global argmax pair →
    merge it corpus-wide) — vocabulary induction, the step between
    curation and tokenizer training.

    Per round: one zip-explode + partial-agg count (the same shape as
    collocations_lift), a 1-row TakeOrdered argmax broadcast onto the
    corpus, and a map-side literal rewrite — no shuffle touches
    document text; at 100 TB each round costs one count-shuffle of
    (w1, w2) pairs plus a corpus map pass, exactly how distributed BPE
    trainers are built. Deterministic: the argmax tiebreak is total
    (count desc, w1, w2).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens_before"),
        F.col("text").alias("t"),
    )
    for r in range(1, PHRASE_ROUNDS + 1):
        d = _merge_round(d, r)
    return d.select(
        "doc_id",
        "phrase_1",
        "phrase_2",
        "n_tokens_before",
        F.size(F.split("t", " ")).cast("bigint").alias("n_tokens_after"),
        F.md5("t").alias("merged_md5"),
    )


QUERIES = {
    "text_wordcount": text_wordcount,
    "vocab_coverage": vocab_coverage,
    "text_stats": text_stats,
    "token_count": token_count,
    "text_quality": text_quality,
    "lang_id": lang_id,  # oracle replicates the heuristic in SQL
    "lang_confusion_matrix": lang_confusion_matrix,
    "curate_corpus": curate_corpus,
    "tfidf_top_terms": tfidf_top_terms,
    "token_count_regex": token_count_regex,
    "bm25_score": bm25_score,
    "collocations_lift": collocations_lift,
    "phrase_merges": phrase_merges,
    "inverted_index": inverted_index,
}


def _phrase_oracle() -> str:
    """Unrolled PHRASE_ROUNDS-round twin of phrase_merges."""
    prev = (
        "base AS (SELECT doc_id,"
        " CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_before,"
        " text AS t FROM documents)"
    )
    ctes = [prev]
    src = "base"
    for r in range(1, PHRASE_ROUNDS + 1):
        ctes.append(f"""
        big{r} AS (
            SELECT l[i] AS w1, l[i + 1] AS w2
            FROM (SELECT string_split(t, ' ') AS l FROM {src}),
                 UNNEST(range(1, len(l))) AS z(i)
        ),
        top{r} AS (
            SELECT w1, w2 FROM big{r}
            WHERE regexp_matches(w1, '{_WORD_RE}')
              AND regexp_matches(w2, '{_WORD_RE}')
            GROUP BY w1, w2
            ORDER BY COUNT(*) DESC, w1, w2 LIMIT 1
        ),
        d{r} AS (
            -- trim(x, ' ') NOT bare trim(): DuckDB's default trim strips
            -- Unicode whitespace (NBSP, ...) where Spark's F.trim strips
            -- only ASCII space — the explicit charset pins both to ' '
            SELECT s.* EXCLUDE (t),
                   trim(replace(replace(' ' || s.t || ' ',
                       ' ' || p.w1 || ' ' || p.w2 || ' ',
                       ' ' || p.w1 || '_' || p.w2 || ' '),
                       ' ' || p.w1 || ' ' || p.w2 || ' ',
                       ' ' || p.w1 || '_' || p.w2 || ' '), ' ') AS t,
                   p.w1 || ' ' || p.w2 AS phrase_{r}
            FROM {src} s, top{r} p
        )""")
        src = f"d{r}"
    return (
        "WITH " + ",".join(ctes) + f"""
        SELECT doc_id, phrase_1, phrase_2, n_tokens_before,
               CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens_after,
               md5(t) AS merged_md5
        FROM {src}
    """
    )


def _bm25_oracle() -> str:
    tf_cols = ",\n                 ".join(
        f"CAST(len(list_filter(string_split(text, ' '), x -> x = '{t}'))"
        f" AS BIGINT) AS tf_{t}"
        for t in BM25_TERMS
    )
    df_cols = ",\n                 ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS dfv_{t}"
        for t in BM25_TERMS
    )
    total = " + ".join(f"({_bm25_term_expr(t)})" for t in BM25_TERMS)
    tf_out = ", ".join(f"tf_{t}" for t in BM25_TERMS)
    return f"""
        WITH per_doc AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
                 {tf_cols}
          FROM documents
        ),
        stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS sum_dl,
                 {df_cols}
          FROM per_doc
        )
        SELECT doc_id, dl, {tf_out},
               {total} AS bm25
        FROM (SELECT per_doc.*, stats.*,
                     CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
              FROM per_doc CROSS JOIN stats)
    """


def _lang_id_oracle() -> str:
    """SQL twin of the lang_id pandas UDF, generated from the same
    profile table so the two can never drift: per-language score =
    distinct first-200-words ∩ profile; argmax with ties broken by
    profile order (Python max returns the first maximum)."""
    score_cols = []
    for lang, prof in _LANG_PROFILES.items():
        words = ", ".join(f"'{w}'" for w in sorted(prof))
        score_cols.append(
            f"len(list_distinct(list_intersect("
            f"list_slice(string_split(text, ' '), 1, 200), [{words}]))) AS s_{lang}"
        )
    langs = list(_LANG_PROFILES)
    m = "greatest(" + ", ".join(f"s_{la}" for la in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{la} = {m} THEN '{la}'" for la in langs
    ) + " END"
    return f"""
        SELECT doc_id, lang, {case} AS detected_lang
        FROM (SELECT doc_id, lang, {", ".join(score_cols)} FROM documents)
    """

def _lang_confusion_oracle() -> str:
    """lang_id's CASE-chain twin wrapped in the confusion GROUP BY."""
    inner = _lang_id_oracle().strip()
    return f"""
        WITH detected AS ({inner}),
        cells AS (
            SELECT lang, detected_lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM detected GROUP BY lang, detected_lang
        ),
        totals AS (
            SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_label
            FROM cells GROUP BY lang
        )
        SELECT c.lang, c.detected_lang, c.n_docs,
               CAST(c.n_docs AS DOUBLE) / CAST(t.n_label AS DOUBLE)
                   AS label_rate,
               c.lang = c.detected_lang AS is_correct
        FROM cells c JOIN totals t USING (lang)
    """


ORACLE = {
    "lang_confusion_matrix": _lang_confusion_oracle(),
    "inverted_index": """
        WITH inst AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        per_doc AS (
            SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
            FROM inst WHERE term <> '' GROUP BY term, doc_id
        )
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(tf) AS BIGINT) AS total_tf,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
               md5(array_to_string(list_sort(list(doc_id)), '_'))
                   AS postings_md5
        FROM per_doc GROUP BY term
    """,
    "phrase_merges": _phrase_oracle(),
    "collocations_lift": f"""
        WITH toks AS (
            SELECT string_split(text, ' ') AS l FROM documents
        ),
        uni AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS c_w
            FROM (SELECT unnest(l) AS word FROM toks)
            WHERE word <> '' GROUP BY word
        ),
        big AS (
            SELECT w1, w2 FROM (
                SELECT l[i] AS w1, l[i + 1] AS w2
                FROM toks, UNNEST(range(1, len(l))) AS t(i)
            ) WHERE w1 <> '' AND w2 <> ''
        ),
        btot AS (SELECT CAST(COUNT(*) AS BIGINT) AS bt FROM big),
        utot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS ut FROM uni),
        pairs AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
            FROM big GROUP BY w1, w2
            HAVING COUNT(*) >= {COLLOC_MIN_COUNT}
        )
        SELECT p.w1, p.w2, p.c_ab, a.c_w AS c_a, b.c_w AS c_b,
               (CAST(p.c_ab AS DOUBLE) / CAST(bt AS DOUBLE)) /
               ((CAST(a.c_w AS DOUBLE) / CAST(ut AS DOUBLE)) *
                (CAST(b.c_w AS DOUBLE) / CAST(ut AS DOUBLE))) AS lift
        FROM pairs p
        JOIN uni a ON a.word = p.w1
        JOIN uni b ON b.word = p.w2
        CROSS JOIN btot CROSS JOIN utot
    """,
    "vocab_coverage": f"""
        WITH inst AS (
          SELECT doc_id, lang, word FROM (
            SELECT doc_id, lang,
                   unnest(string_split(text, ' ')) AS word
            FROM documents
          ) WHERE word <> ''
        ),
        wc AS (
          SELECT word, COUNT(*) AS c FROM inst GROUP BY word
        ),
        vocab AS (
          SELECT word FROM (
            SELECT word, ROW_NUMBER() OVER (ORDER BY c DESC, word) AS vr
            FROM wc
          ) WHERE vr <= {VOCAB_TOP}
        )
        SELECT i.doc_id,
               ANY_VALUE(i.lang) AS lang,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN v.word IS NULL THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_in_vocab,
               1.0 - CAST(SUM(CASE WHEN v.word IS NULL THEN 0 ELSE 1 END)
                          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS oov_rate
        FROM inst i LEFT JOIN vocab v ON v.word = i.word
        GROUP BY i.doc_id
    """,
    "tfidf_top_terms": """
        WITH terms AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM terms WHERE term <> '' GROUP BY doc_id, term
        ),
        dfs AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, dfs.df,
                   tf.tf * (CAST(n.n_docs AS DOUBLE) / dfs.df) AS tfidf
            FROM tf JOIN dfs USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, tfidf, CAST(rn AS INT) AS rn FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
            FROM scored
        ) WHERE rn <= 3
    """,
    "lang_id": _lang_id_oracle(),
    "token_count_regex": f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}'))
                    AS INT) AS n_regex_tokens,
               CAST(len(list_distinct(regexp_extract_all(text, '{TOKEN_PATTERN}')))
                    AS INT) AS n_unique_tokens
        FROM documents
    """,
    "text_wordcount": """
        SELECT word, COUNT(*) AS n_occurrences
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word
    """,
    "text_stats": """
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               MIN(n_chars) AS min_chars,
               MAX(n_chars) AS max_chars
        FROM documents
        GROUP BY lang
    """,
    "token_count": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_words,
               CAST(floor((n_chars + 3) / 4.0) AS BIGINT) AS est_bpe_tokens
        FROM documents
    """,
    "curate_corpus": """
        SELECT doc_id, lang, source,
               CAST(len(string_split(text, ' ')) AS INT) AS n_words,
               CAST(floor((n_chars + 3) / 4.0) AS BIGINT) AS est_bpe_tokens
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM documents
        )
        WHERE rn = 1
          AND lang IN ('en', 'de', 'fr', 'es')
          AND n_chars >= 100
          AND len(string_split(text, ' ')) >= 20
          AND CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
              / len(string_split(text, ' ')) <= 15.0
    """,
    "text_quality": """
        SELECT doc_id, n_chars,
               CAST(len(string_split(text, ' ')) AS INT) AS n_words,
               CAST(len(list_filter(string_split(text, ' '),
                        w -> w IN ('the','a','of','and','to','in','is','on','for','with')))
                    AS DOUBLE)
                   / len(string_split(text, ' ')) AS stopword_ratio,
               CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
                   / len(string_split(text, ' ')) AS mean_word_len,
               n_chars >= 100 AS len_ok
        FROM documents
    """,
    "bm25_score": _bm25_oracle(),
}
