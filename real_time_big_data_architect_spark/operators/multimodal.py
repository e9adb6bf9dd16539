"""Multimodal columns (north star NS6d).

Design: media are opaque ``binary`` columns + a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The container ships no image/audio codecs, so
the decode kernel is a clearly-marked deterministic stub — the
Spark-side plumbing (schema, batch iteration, partitioning) is real and
unit-tested, and a production deployment swaps only the kernel body.

Scale notes: binary payloads never enter a shuffle in these plans —
metadata joins go through keys, and per-batch kernels run scan-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_big_data_architect_spark.tables import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a multimodal table from documents: text bytes stand in for
    media payloads (binary column + typed metadata struct)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    # fake width/height derive from md5 (high/low hex halves) rather
    # than xxhash64: DuckDB computes the identical values, which is
    # what lets media_resize carry a hash-grade oracle. NULL text →
    # NULL dims (consumers must treat dimensionless media as NULL
    # geometry — the honest contract for undecodable payloads).
    w_hash = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint")
    h_hash = F.conv(F.substring(F.md5("text"), 9, 8), 16, 10).cast("bigint")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        payload.alias("payload"),
        F.struct(
            (F.pmod(w_hash, F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(h_hash, F.lit(1080)) + 1).cast("int").alias("height"),
            F.length(F.col("text")).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """STUB decode kernel (no codecs in this container).

    Deterministic fake: "decodes" the payload to a feature vector of 8
    byte-histogram buckets. A real deployment replaces this body with
    PIL/ffmpeg/soundfile calls — signature and batch shape are the
    production ones.

    The 8 bucket shares are emitted as SCALAR double columns f0..f7
    rather than one ``array<double>`` column: the driver's pandas
    ``sort_values`` canonicalizer raises ``TypeError: unhashable
    type`` on list cells (the r4 failure mode on ``array_hof``); the
    scalar shape is also what the exact-SQL oracle can pivot to.
    """
    feats = []
    for payload in batch["payload"]:
        if payload is None:
            feats.append([0.0] * 8)
            continue
        arr = np.frombuffer(bytes(payload), dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=8, range=(0, 256))
        total = max(int(hist.sum()), 1)
        feats.append((hist / total).astype(float).tolist())
    out = batch[["doc_id", "media_type"]].copy()
    for k in range(8):
        out[f"f{k}"] = [fv[k] for fv in feats]
    return out


DECODED_SCHEMA = (
    "doc_id long, media_type string, "
    + ", ".join(f"f{k} double" for k in range(8))
)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload → feature vector via Arrow-batched mapInPandas.

    rows-only check: the kernel is a stub, not SQL-expressible.
    """
    media = build_media_table(spark, sf_dir)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_media_batch(pdf)

    return media.mapInPandas(kernel, schema=DECODED_SCHEMA)


RESIZE_TARGET = (224, 224)  # the ubiquitous vision-model input size

RESIZED_SCHEMA = (
    "doc_id long, media_type string, out_width int, out_height int,"
    " scale_x double, scale_y double, out_bytes long"
)


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize stage as an Arrow-batched mapInPandas kernel (NS6d).

    The geometry math (scale factors, output byte estimate) is real;
    the pixel resampling is the honestly-stubbed part (no codecs in
    this container — production swaps in PIL/torchvision inside the
    same kernel). Only image rows pass through: the filter prunes
    before the Python stage so audio/video bytes never cross Arrow.
    Oracle-backed: dims are md5-derived (see build_media_table) and
    the scale division is one IEEE op, so DuckDB replays every column
    bit-exactly. NULL-text media carry NULL dims → NULL scales.
    """
    media = build_media_table(spark, sf_dir).filter(
        F.col("media_type") == "image"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tw, th = RESIZE_TARGET
        for pdf in batches:
            meta = pdf["meta"]
            out = pdf[["doc_id", "media_type"]].copy()
            out["out_width"] = tw
            out["out_height"] = th
            out["scale_x"] = [
                tw / m["width"] if m["width"] is not None else None for m in meta
            ]
            out["scale_y"] = [
                th / m["height"] if m["height"] is not None else None for m in meta
            ]
            # stub: a real kernel returns the resampled payload; the
            # deterministic fake sizes it as 3 bytes/pixel RGB
            out["out_bytes"] = tw * th * 3
            yield out

    return media.mapInPandas(kernel, schema=RESIZED_SCHEMA)


FRAME_SAMPLE_EVERY = 1024  # stub: one "frame" per KiB of payload
FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, frame_offset long, frame_bytes long"
)


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: one video row → N frame rows (NS6d).

    The row-expanding mapInPandas shape of every frame-extraction
    pipeline: the kernel emits a row per sampled frame (here one per
    KiB of payload, deterministic stub; production replaces the body
    with an ffmpeg/PyAV seek loop). Frame count and offsets derive
    only from payload length, so the expansion is oracle-checkable.
    """
    media = build_media_table(spark, sf_dir).filter(
        F.col("media_type") == "video"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload) if payload is not None else 0
                n_frames = max((n + FRAME_SAMPLE_EVERY - 1) // FRAME_SAMPLE_EVERY, 1)
                for i in range(n_frames):
                    off = i * FRAME_SAMPLE_EVERY
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append(off)
                    rows["frame_bytes"].append(min(FRAME_SAMPLE_EVERY, n - off) if n else 0)
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, schema=FRAMES_SCHEMA)


def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings on doc_id=vec_id: the text+vector bundle.

    Output is flat (key, lang, label, sizes) so the oracle can check it;
    the struct-bundled variant is ``multimodal_bundle``.
    """
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id", "lang", "source", "n_chars", "label"
    )


def multimodal_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct column bundling {text, embedding, metadata}, certified
    through scalar projections (oracle-backed since r6).

    The operator under test is the struct assembly + field access: the
    bundle is BUILT (nested struct with typed metadata — the
    training-example record shape), then every output column is read
    back THROUGH it (``bundle.text``, ``bundle.embedding``,
    ``bundle.metadata.*``), flattened to driver-hashable scalars the
    DuckDB twin reproduces: md5 of the text and the in-order
    ``aggregate`` fold of the embedding (the ``_dot`` replay
    discipline — 0.0 + p1 == p1, so list_reduce matches bit-exactly).
    """
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    bundled = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        F.struct(
            F.col("text"),
            F.col("embedding"),
            F.struct("lang", "source", "n_chars", "label").alias("metadata"),
        ).alias("bundle"),
    )
    checksum = F.aggregate(
        F.transform(F.col("bundle.embedding"), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return bundled.select(
        "doc_id",
        F.md5(F.col("bundle.text")).alias("text_md5"),
        checksum.alias("embedding_sum"),
        F.col("bundle.metadata.lang").alias("lang"),
        F.col("bundle.metadata.source").alias("source"),
        F.col("bundle.metadata.n_chars").alias("n_chars"),
        F.col("bundle.metadata.label").alias("label"),
    )


def media_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over the media table: per-type sizes.

    The byte-size stats are the contract here; width/height (md5-
    derived, oracle-replayable since r5) are covered by media_resize.
    """
    media = build_media_table(spark, sf_dir)
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.min(F.col("meta.n_bytes")).alias("min_bytes"),
        F.max(F.col("meta.n_bytes")).alias("max_bytes"),
    )


#: perceptual-hash geometry: 64 histogram buckets → 64-bit signature,
#: 4 × 16-bit Hamming-LSH bands, near-dup at Hamming ≤ 3 — the SAME
#: complete-recall discipline as SimHash (dedup.py): by pigeonhole, a
#: pair differing in ≤ 3 of 64 bits MUST agree on at least one of 4
#: disjoint 16-bit bands, so banding loses NO qualifying pair. The
#: alternative (9 × ~7-bit bands to guarantee Hamming ≤ 8) leaves only
#: 128 bucket values per band — at corpus scale every bucket holds
#: N/128 docs and the candidate join goes quadratic; threshold 3 with
#: 65536-value buckets is the shape that survives 100 TB.
PHASH_BANDS = 4
PHASH_MAX_HAMMING = 3


def media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit perceptual hash per media payload + its Hamming bands.

    Kernel: byte-histogram signature — bucket the payload's bytes into
    64 ranges, set bit i when bucket i exceeds the mean bucket mass.
    Byte-identical payloads hash identically; near-identical payloads
    differ in few bits (the property Hamming banding exploits). One
    Arrow-batched numpy pass per input split, no shuffle — exactly the
    production pHash/aHash plumbing with the codec swapped for the
    histogram stub (no image libs in this container).
    """
    m = build_media_table(spark, sf_dir)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(64, dtype=np.uint64)
        for b in batches:
            sigs, bands = [], [[] for _ in range(PHASH_BANDS)]
            for payload in b["payload"]:
                # NULL payload (NULL source text) hashes like the
                # zero-byte payload: all-zero histogram -> sig 0 — the
                # same fold the oracle's LEFT JOIN + COALESCE performs
                arr = np.frombuffer(
                    payload if payload is not None else b"", dtype=np.uint8
                )
                hist = np.bincount(arr >> 2, minlength=64)[:64]
                bits = (hist > hist.mean()).astype(np.uint64)
                sig = int((bits << shifts).sum(dtype=np.uint64))
                for i in range(PHASH_BANDS):
                    bands[i].append((sig >> (16 * i)) & 0xFFFF)
                sigs.append(sig - (1 << 64 if sig >= 1 << 63 else 0))
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "phash": pd.Series(sigs, dtype="int64"),
                    **{
                        f"band{i}": pd.Series(bands[i], dtype="int32")
                        for i in range(PHASH_BANDS)
                    },
                }
            )

    schema = "doc_id long, phash long, " + ", ".join(
        f"band{i} int" for i in range(PHASH_BANDS)
    )
    return m.select("doc_id", "payload").mapInPandas(kernel, schema)


def media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup media pairs by perceptual hash: Hamming ≤
    PHASH_MAX_HAMMING (3) over the 64-bit signatures, banded so the
    candidate join shuffles only (band, bucket, doc_id) — the simhash
    blocking discipline applied to the binary media column. Recall is
    COMPLETE, not tuned: a pair within Hamming ≤ 3 of 64 bits cannot
    disagree on all 4 disjoint 16-bit bands (pigeonhole), so every
    qualifying pair surfaces as a candidate and is then verified
    exactly with bit_count. See the PHASH_BANDS note for why threshold
    3 (matching SIMHASH_MAX_HAMMING) beats widening the guarantee with
    narrower bands at scale.
    """
    sigs = media_phash(spark, sf_dir).repartition(F.col("doc_id"))
    buckets = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"band{i}") for i in range(PHASH_BANDS)])
        ).alias("band", "bucket"),
    )
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
        )
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("phash").alias("pa"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("phash").alias("pb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "hamming", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
        )
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


QUERIES = {
    "media_resize": media_resize,  # oracle (md5-derived geometry)
    "media_frame_sample": media_frame_sample,
    "multimodal_join": multimodal_join,
    "multimodal_bundle": multimodal_bundle,
    "multimodal_features": multimodal_features,
    "media_meta_stats": media_meta_stats,
    "media_phash_dedup": media_phash_dedup,
}


def _phash_dedup_oracle() -> str:
    """All-pairs SQL ground truth for the banded phash dedup.

    Replays the numpy kernel byte-exactly in SQL — UTF-8 bytes from
    ``hex(encode(text))``, 64-bucket histogram (``byte // 4``), bit i
    set when bucket i exceeds the mean bucket mass n/64.0 (missing
    buckets hold 0, never exceed a positive mean, so the GROUP BY over
    present buckets is complete) — then scores EVERY pair with
    bit_count(xor) ≤ PHASH_MAX_HAMMING via a naive self-join. The
    oracle is deliberately quadratic (ground truth, sf0.01-sized);
    hash-matching it proves the engine's banding loses no qualifying
    pair, i.e. the pigeonhole recall guarantee holds on real data.
    HUGEINT accumulates the unsigned signature; the two's-complement
    fold to BIGINT mirrors the kernel's int64 wrap.
    """
    return f"""
        WITH h AS (
          SELECT doc_id, upper(hex(encode(text))) AS hx,
                 octet_length(encode(text)) AS n
          FROM documents
        ),
        idx AS (
          SELECT doc_id, n,
                 unnest(range(0, CAST(n AS BIGINT))) AS i
          FROM h
        ),
        byt AS (
          SELECT doc_id, n,
                 (strpos('0123456789ABCDEF',
                         substr(hx, CAST(i*2+1 AS INT), 1)) - 1) * 4
                 + (strpos('0123456789ABCDEF',
                           substr(hx, CAST(i*2+2 AS INT), 1)) - 1) // 4
                     AS bucket
          FROM idx JOIN h USING (doc_id, n)
        ),
        hist AS (
          SELECT doc_id, any_value(n) AS n, bucket, count(*) AS c
          FROM byt GROUP BY doc_id, bucket
        ),
        -- LEFT JOIN back to h: a zero-byte payload has no byt rows but
        -- the kernel still emits sig = 0 for it (all-false bits); the
        -- per-row range() also removes the old 100000-byte truncation
        sigs AS (
          SELECT h.doc_id, COALESCE(g.sig_u, 0) AS sig_u
          FROM h LEFT JOIN (
              SELECT doc_id,
                     COALESCE(SUM(CASE WHEN c > n / 64.0
                                       THEN CAST(1 AS HUGEINT)
                                            << CAST(bucket AS INT)
                                       ELSE CAST(0 AS HUGEINT) END),
                              0) AS sig_u
              FROM hist GROUP BY doc_id
          ) g ON g.doc_id = h.doc_id
        ),
        signed AS (
          SELECT doc_id,
                 CAST(CASE WHEN sig_u >= 9223372036854775808
                           THEN sig_u - 18446744073709551616
                           ELSE sig_u END AS BIGINT) AS sig
          FROM sigs
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        FROM signed a JOIN signed b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= {PHASH_MAX_HAMMING}
    """


def _features_oracle() -> str:
    """SQL twin of ``decode_media_batch``: the 8-bucket byte histogram.

    Bucket of a byte is its high hex nibble // 2 — computed from
    ``hex(encode(text))`` so the oracle is UTF-8-byte-exact even for
    non-ASCII text. Shares are int/int double divisions, which both
    engines evaluate identically (same IEEE operands → same bits).
    """
    counts = ",\n               ".join(
        f"count(*) FILTER (WHERE bucket = {k}) AS c{k}" for k in range(8)
    )
    shares = ",\n               ".join(
        f"CAST(COALESCE(c.c{k}, 0) AS DOUBLE) / greatest(h.n, 1) AS f{k}"
        for k in range(8)
    )
    # per-row range() replaces the old fixed 100000-byte truncation, and
    # the LEFT JOIN keeps zero-byte documents (the kernel emits all-zero
    # shares for them; the old GROUP BY over byte rows dropped the row)
    return f"""
        WITH h AS (
          SELECT doc_id, upper(hex(encode(text))) AS hx,
                 octet_length(encode(text)) AS n
          FROM documents
        ),
        idx AS (
          SELECT doc_id, n, unnest(range(0, CAST(n AS BIGINT))) AS i
          FROM h
        ),
        b AS (
          SELECT doc_id,
                 (strpos('0123456789ABCDEF',
                         substr(hx, CAST(i*2+1 AS INT), 1)) - 1) // 2
                     AS bucket
          FROM idx JOIN h USING (doc_id, n)
        ),
        cnt AS (
          SELECT doc_id,
               {counts}
          FROM b GROUP BY doc_id
        )
        SELECT h.doc_id,
               CASE WHEN h.doc_id % 3 = 0 THEN 'image'
                    WHEN h.doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               {shares}
        FROM h LEFT JOIN cnt c ON c.doc_id = h.doc_id
    """


ORACLE = {
    "multimodal_bundle": """
        SELECT d.doc_id,
               md5(d.text) AS text_md5,
               -- the CASE guards mirror Spark's aggregate(..., 0.0, +):
               -- an empty array folds to the 0.0 seed (DuckDB's
               -- list_reduce ERRORS on empty lists), a NULL array
               -- stays NULL
               CASE WHEN e.embedding IS NULL THEN NULL
                    WHEN len(e.embedding) = 0 THEN 0.0
                    ELSE list_reduce(
                        list_transform(range(1, len(e.embedding) + 1),
                                       i -> CAST(e.embedding[i] AS DOUBLE)),
                        (x, y) -> x + y) END AS embedding_sum,
               d.lang, d.source, d.n_chars, e.label
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    "media_resize": f"""
        SELECT doc_id,
               'image' AS media_type,
               {RESIZE_TARGET[0]} AS out_width,
               {RESIZE_TARGET[1]} AS out_height,
               {RESIZE_TARGET[0]}.0 / w AS scale_x,
               {RESIZE_TARGET[1]}.0 / h AS scale_y,
               CAST({RESIZE_TARGET[0] * RESIZE_TARGET[1] * 3} AS BIGINT)
                   AS out_bytes
        FROM (
          SELECT doc_id,
                 ('0x' || substr(md5(text), 1, 8))::BIGINT % 1920 + 1 AS w,
                 ('0x' || substr(md5(text), 9, 8))::BIGINT % 1080 + 1 AS h
          FROM documents WHERE doc_id % 3 = 0
        )
    """,
    "multimodal_features": _features_oracle(),
    "media_phash_dedup": _phash_dedup_oracle(),
    "media_frame_sample": """
        SELECT doc_id,
               CAST(i AS INT) AS frame_idx,
               i * 1024 AS frame_offset,
               CASE WHEN n = 0 THEN 0
                    ELSE least(1024, n - i * 1024) END AS frame_bytes
        FROM (
          SELECT doc_id, n,
                 unnest(range(0, greatest(CAST(ceil(n / 1024.0) AS BIGINT),
                                          1))) AS i
          FROM (SELECT doc_id, octet_length(encode(text)) AS n
                FROM documents WHERE doc_id % 3 = 2) v
        )
    """,
    "multimodal_join": """
        SELECT doc_id, lang, source, n_chars, label
        FROM documents JOIN embeddings ON doc_id = vec_id
    """,
    "media_meta_stats": """
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               COUNT(*) AS n_items,
               CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
               CAST(MIN(length(text)) AS BIGINT) AS min_bytes,
               CAST(MAX(length(text)) AS BIGINT) AS max_bytes
        FROM documents
        GROUP BY 1
    """,
}
