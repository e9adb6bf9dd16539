"""File-format readers beyond parquet: CSV, JSON-lines, and ORC.

The reference ingests JSON over HTTP only (app.py:67-81); a standalone
engine also needs the standard lake interchange formats. Everything is
schema-explicit — inference is disabled deliberately: at 100 TB a
schema-inference pass is a full extra scan, and silent type drift
between files is how pipelines corrupt downstream tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: schema per fixture table, usable for csv/jsonl round-trips
TABLE_SCHEMAS = {
    "events": (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ),
    "documents": "doc_id long, text string, lang string, source string, n_chars long",
    "region": "r_regionkey long, r_name string, r_comment string",
    "nation": "n_nationkey long, n_name string, n_regionkey long, n_comment string",
}


def read_csv(
    spark: SparkSession, path: str, schema: str, *, header: bool = True
) -> DataFrame:
    """Strict CSV reader: explicit schema, FAILFAST on malformed rows
    (a silent PERMISSIVE null is a correctness bug at scale)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        # \N sentinel (matching write_csv): the CSV default reads the
        # empty field as NULL, so empty strings written by a faithful
        # writer would silently become NULLs on the way back
        .option("nullValue", "\\N")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines reader: explicit schema, FAILFAST, no inference scan."""
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
    )


def read_orc(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """ORC reader (the other columnar lake format): explicit schema so a
    drifted file fails analysis instead of silently widening types. ORC
    scans get the same pushdown/pruning treatment as parquet in Spark.
    """
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def write_csv(df: DataFrame, path: str) -> None:
    # \N sentinel: the default writes NULL as an empty field, which the
    # reader cannot tell apart from an empty STRING — round-trips would
    # silently conflate the two (r12 formats review)
    df.write.option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).option("nullValue", "\\N").mode("overwrite").csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).mode("overwrite").json(path)
