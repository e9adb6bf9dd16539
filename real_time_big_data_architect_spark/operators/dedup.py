"""Deduplication operators for training-data pipelines (north star NS6a).

Absent from the reference (SURVEY §2.5); designed for 100 TB corpora:

- **exact dedup** — hash-groupBy on the text (one shuffle on a digest,
  not the raw text: group on md5 so the shuffle key is 16 bytes/row).
- **fingerprint dedup** — md5 digest as a first-class column (the
  "document fingerprint" primitive; oracle-able since both engines
  implement standard md5).
- **MinHash + LSH near-dup** — shingle → 64 minhashes → band into 8
  buckets → self-join per bucket. All built-in expressions (xxhash64,
  transform, aggregate) — no Python UDF, so the candidate-pair stage is
  whole-stage-codegen and the only shuffle is the bucket join. This is
  the standard big-data near-dup design (Broder MinHash + banding LSH).
- **SimHash** — 64-bit signed-projection signature via word hashes;
  near-dups = signatures at small Hamming distance within a band.
- **n-gram Jaccard** — exact pairwise verification on LSH candidates.

Determinism: every hash is xxhash64/md5 with fixed seeds → stable across
runs and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.tables import load_table

N_MINHASHES = 64
N_BANDS = 8  # 8 rows per band
SHINGLE_K = 5  # 5-word shingles


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per identical text (NS6a).

    groupBy(md5(text)) — the 100 TB trick is shuffling a 128-bit digest
    instead of multi-KB documents; min(doc_id) is the deterministic
    survivor rule (``dropDuplicates`` keeps an arbitrary row, which
    would not be hash-stable).
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("text_md5"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus itself: first row per text by doc_id."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint column: md5 digest + length (NS6 text analysis)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("fingerprint"),
        F.length("text").alias("text_len"),
    )


def _shingles(text_col: str = "text"):
    """k-word shingles as strings (sliding word windows)."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - SHINGLE_K, F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, SHINGLE_K))
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64 MinHash values per document, all JVM-side expressions.

    minhash_j(doc) = min over shingles of xxhash64(shingle, seed=j).
    ``transform`` + ``array_min`` keep this inside codegen — no UDF, no
    shuffle; at 100 TB this stage is embarrassingly parallel.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = _shingles().alias("shingles")
    sigs = F.array(
        *[
            F.array_min(
                F.transform(F.col("shingles"), lambda s: F.xxhash64(s, F.lit(j)))
            )
            for j in range(N_MINHASHES)
        ]
    ).alias("minhash")
    return d.select("doc_id", sh).select("doc_id", sigs)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH (NS6a).

    Bands of 8 minhashes hash to a bucket; docs sharing any
    (band, bucket) are candidates. One self-join on the bucket key —
    at 100 TB this is the only shuffle, and bucket keys are 8 bytes.
    Returns pairs with their estimated Jaccard (fraction of matching
    minhashes), filtered at >= 0.5.
    """
    sigs = minhash_signatures(spark, sf_dir)
    rows_per_band = N_MINHASHES // N_BANDS
    bands = F.posexplode(
        F.array(
            *[
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.col("minhash")[b * rows_per_band + r].cast("string")
                            for r in range(rows_per_band)
                        ],
                    ),
                    F.lit(1000 + b),
                )
                for b in range(N_BANDS)
            ]
        )
    )
    buckets = sigs.select("doc_id", "minhash", bands.alias("band", "bucket"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (
                F.size(
                    F.filter(
                        F.zip_with(
                            F.col("a.minhash"),
                            F.col("b.minhash"),
                            lambda x, y: (x == y).cast("int"),
                        ),
                        lambda v: v == 1,
                    )
                )
                / F.lit(float(N_MINHASHES))
            ).alias("est_jaccard"),
        )
        .distinct()
        .filter(F.col("est_jaccard") >= 0.5)
    )
    return pairs


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document, bit-vote over word hashes (NS6a).

    For each bit position: +1 when the word's xxhash64 has the bit set,
    -1 otherwise; the signature bit is the sign of the vote. All
    built-in higher-order array functions — JVM-side.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    hashes = F.transform(words, lambda wd: F.xxhash64(wd, F.lit(7)))
    bit_votes = F.array(
        *[
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(h.bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1),
            )
            for i in range(16)  # 16-bit simhash keeps expression tree tractable
        ]
    )
    votes_df = d.select("doc_id", bit_votes.alias("votes"))
    sig = None
    for i in range(16):
        bit = F.when(F.col("votes")[i] > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return votes_df.select("doc_id", sig.cast("long").alias("simhash"))


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidate pairs (verification stage).

    Candidates come from the cheap LSH pass; the exact Jaccard
    |A∩B|/|A∪B| over 5-word shingle sets runs only on candidates —
    the standard two-stage design that avoids O(n²) at scale.
    """
    cands = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(_shingles()).alias("sh")
    )
    return (
        cands.join(d.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(d.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_survivors": dedup_survivors,
    "doc_fingerprint": doc_fingerprint,
    "dedup_minhash_lsh": dedup_minhash_lsh,  # rows-only (xxhash64 is Spark-specific)
    "simhash_signatures": simhash_signatures,  # rows-only
    "dedup_ngram_jaccard": dedup_ngram_jaccard,  # rows-only
}

ORACLE = {
    "dedup_exact": """
        SELECT md5(text) AS text_md5,
               MIN(doc_id) AS keep_doc_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    "dedup_survivors": """
        SELECT doc_id, lang, source, n_chars
        FROM (
            SELECT doc_id, lang, source, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM documents
        )
        WHERE rn = 1
    """,
    "doc_fingerprint": """
        SELECT doc_id, md5(text) AS fingerprint,
               CAST(length(text) AS INT) AS text_len
        FROM documents
    """,
}
