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
