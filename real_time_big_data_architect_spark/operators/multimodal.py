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
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        payload.alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64("text"), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64("text", F.lit(1)), F.lit(1080)) + 1)
            .cast("int")
            .alias("height"),
            F.length(F.col("text")).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """STUB decode kernel (no codecs in this container).

    Deterministic fake: "decodes" the payload to a feature vector of 8
    byte-histogram buckets. A real deployment replaces this body with
    PIL/ffmpeg/soundfile calls — signature and batch shape are the
    production ones.
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
    out["features"] = feats
    return out


DECODED_SCHEMA = (
    "doc_id long, media_type string, features array<double>"
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
    """Struct column bundling {text, embedding, metadata} (rows-only)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        F.struct(
            F.col("text"),
            F.col("embedding"),
            F.struct("lang", "source", "n_chars", "label").alias("metadata"),
        ).alias("bundle"),
    )


def media_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over the media table: per-type sizes.

    The width/height fake is xxhash-derived (Spark-only), so the oracle
    covers the byte-size stats that both engines can compute from text.
    """
    media = build_media_table(spark, sf_dir)
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.min(F.col("meta.n_bytes")).alias("min_bytes"),
        F.max(F.col("meta.n_bytes")).alias("max_bytes"),
    )


QUERIES = {
    "multimodal_join": multimodal_join,
    "multimodal_bundle": multimodal_bundle,  # rows-only (struct output)
    "multimodal_features": multimodal_features,  # rows-only (stub kernel)
    "media_meta_stats": media_meta_stats,
}

ORACLE = {
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
