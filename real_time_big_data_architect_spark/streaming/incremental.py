"""Checkpointed incremental ingest: the production ETL primitive.

The reference re-fetches and recomputes everything each 60 s tick
(app.py:37 — stateless by design); the Spark-native equivalent is a
checkpointed file-source stream writing an exactly-once file sink:
restarts resume from the offset log, already-processed input is never
re-read, and the output commit log suppresses duplicate files even if a
batch is retried.

Scale notes: this is how a 100 TB lake ingests — the source lists only
NEW files per trigger (the checkpoint holds the seen-set), each
micro-batch is a bounded unit of work, and the sink's `_spark_metadata`
commit log makes downstream reads see exactly-once output. State on
disk, nothing driver-resident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.streaming import progress
from real_time_big_data_architect_spark.tables import (
    _normalize_events_ts,
    probe_events_schema,
)


def incremental_etl(
    spark: SparkSession, in_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain all currently-available input into the output, resumably.

    Each call processes exactly the files not yet recorded in
    ``checkpoint_dir`` (availableNow trigger), applies the normalization
    (ts → timestamp, a derived hour column for partition pruning
    downstream), and appends to the parquet sink. Calling again after
    new files land processes only the delta.
    """
    schema = probe_events_schema(spark, in_dir, "*.parquet")
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(in_dir)
    )
    normalized = _normalize_events_ts(raw).withColumn(
        "event_hour", F.date_trunc("hour", "ts")
    )
    q = (
        normalized.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress.record(q)


def stream_incremental_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: checkpointed exactly-once incremental ingest,
    driven through THREE drains — (1) ingest the events file, (2) a
    second copy lands and ONLY the delta is processed, (3) a no-new-
    input re-run that must add nothing. The returned per-type aggregate
    equals exactly 2× the batch aggregate IFF the checkpoint both
    resumed (batch 2 ingested the new file) and suppressed reprocessing
    (batches 2 and 3 never re-read old input) — a failed offset log in
    either direction breaks the oracle hash. Counts are exact longs,
    value totals exact decimals.
    """
    import shutil

    from real_time_big_data_architect_spark.streaming.stateful import (
        stream_scratch_dir,
    )

    work = stream_scratch_dir("inc_etl_")
    in_dir = f"{work}/in"
    out_dir = f"{work}/out"
    ckpt = f"{work}/ckpt"
    try:
        import os

        os.makedirs(in_dir)
        shutil.copy(f"{sf_dir}/events.parquet", f"{in_dir}/events0.parquet")
        incremental_etl(spark, in_dir, out_dir, ckpt)  # batch 1
        shutil.copy(f"{sf_dir}/events.parquet", f"{in_dir}/events1.parquet")
        incremental_etl(spark, in_dir, out_dir, ckpt)  # batch 2: delta only
        incremental_etl(spark, in_dir, out_dir, ckpt)  # batch 3: no-op
        agg = (
            spark.read.parquet(out_dir)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(30,4)"))
                .cast("double")
                .alias("sum_value"),
            )
        )
        # |event_type|-sized — eager JVM materialization before the
        # scratch dirs go (no Python-RDD scan for the caller's collect)
        return agg.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES = {
    "stream_incremental_etl": stream_incremental_etl,
}

#: exactly-once invariant: the drained sink holds each source row
#: exactly TWICE (two identical input files, zero reprocessing), so
#: every aggregate is exactly 2x the batch value
ORACLE = {
    "stream_incremental_etl": """
        SELECT event_type,
               CAST(2 * COUNT(*) AS BIGINT) AS n_events,
               CAST(2 * SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE)
                   AS sum_value
        FROM events
        GROUP BY event_type
    """,
}
