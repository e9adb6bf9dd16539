"""Lake maintenance utilities: small-file compaction and zero-cost
ingest metrics.

Both are table-stakes for a 100 TB lake the reference never needed
(app.py holds ≤50 rows in memory): streaming ingest produces thousands
of small files that degrade scan parallelism bookkeeping and footer
overhead, and every ingest batch needs row/null counts without paying
an extra aggregation scan.
"""

from __future__ import annotations

import glob
import math
import os

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 << 20  # the canonical HDFS/lake block size


def compact_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Rewrite a directory of parquet files into ~target-sized files.

    The output file count comes from the INPUT'S BYTE SIZE (filesystem
    metadata — the same listing Spark performs to plan the scan), never
    from a count() pass over the data. Returns the file count written.
    One round-robin shuffle; at scale this runs per partition directory
    so each compaction unit stays bounded.
    """
    total = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(in_dir, "**", "*.parquet"), recursive=True)
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(in_dir).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(out_dir)
    return n_files


def with_ingest_metrics(
    df: DataFrame, null_check_cols: list[str]
) -> tuple[DataFrame, Observation]:
    """Attach free quality counters to a plan via ``observe``.

    Returns (observed_df, observation): run any action on observed_df
    and ``observation.get`` yields row count plus per-column null counts
    — collected as accumulator side-traffic of the action itself, with
    no second scan (a separate count/agg over 100 TB is a full extra
    pass).
    """
    obs = Observation("ingest_quality")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
            for c in null_check_cols
        ],
    )
    return observed, obs


def ingest_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: the observe() telemetry path end-to-end.

    The events batch is materialized ONCE (noop sink — in production,
    the actual ingest write) and the quality counters ride along as
    accumulator side-traffic of that same action; the returned one-row
    DataFrame is built from the observation, not from a second scan.
    The oracle recomputes the counters with plain SQL, proving
    observe() counts exactly what an aggregation pass would.
    """
    from real_time_big_data_architect_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    observed, obs = with_ingest_metrics(ev, ["value", "props"])
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["null_value"], m["null_props"])],
        "n_rows long, null_value long, null_props long",
    )


def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: small-file compaction preserves content exactly.

    Fragments the events table into 16 small files (a streaming-ingest
    simulation), compacts them to target-sized files, and emits the
    compacted copy's row count + order-insensitive digest-sum checksum.
    The oracle computes the same over the ORIGINAL table — equality
    proves the rewrite moved bytes, not data. This is the verification
    step every production compaction job should ship with.
    """
    import shutil
    import tempfile

    from real_time_big_data_architect_spark.tables import load_table

    work = tempfile.mkdtemp(prefix="compact_")
    try:
        ev = load_table(spark, sf_dir, "events")
        ev.repartition(16).write.mode("overwrite").parquet(f"{work}/frag")
        compact_parquet(spark, f"{work}/frag", f"{work}/compact")
        out = spark.read.parquet(f"{work}/compact")
        digest = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("event_id").cast("string"),
                        F.col("user_id").cast("string"),
                        F.col("event_type"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        result = out.agg(
            F.count("*").alias("n_rows"),
            F.sum(digest).alias("content_checksum"),
        )
        # materialize the 1-row summary so the scratch dir (a full
        # fragmented + compacted copy of events) can be deleted now
        # instead of leaking per invocation
        return spark.createDataFrame(
            result.collect(), "n_rows bigint, content_checksum bigint"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES = {
    "ingest_observe_metrics": ingest_observe_metrics,
    "compaction_roundtrip": compaction_roundtrip,
}

ORACLE = {
    "ingest_observe_metrics": """
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS null_value,
               CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS null_props
        FROM events
    """,
    "compaction_roundtrip": """
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CAST(('0x' || substr(md5(
                     CAST(event_id AS VARCHAR) || '|' ||
                     CAST(user_id AS VARCHAR) || '|' ||
                     event_type), 1, 8)) AS BIGINT)) AS BIGINT)
                 AS content_checksum
        FROM events
    """,
}
