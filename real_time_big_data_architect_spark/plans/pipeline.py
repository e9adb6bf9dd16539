"""The reference's full live loop as one streaming pipeline.

``app.py`` per tick: fetch (app.py:67-81) → normalize_to_df
(app.py:84-189) → render + agent commentary (app.py:192-247). Here the
same loop is: http_poll streaming source → ``foreachBatch`` →
normalize → :mod:`plans.agents` commentary → status-record sink.
Errors degrade exactly like the reference: a failed fetch or empty
normalization produces a fallback status row, never a crashed stream
(C2-C5).

``run_poll_pipeline`` is the live entry point (60 s processing-time
trigger by default, app.py:37); tests drive it with ``availableNow``
against a loopback HTTP server — no external network.
"""

from __future__ import annotations

from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.plans import agents
from real_time_big_data_architect_spark.sources import normalize as norm
from real_time_big_data_architect_spark.sources.http_poll import (
    HTTP_POLL_AVAILABLE,
    HttpPollDataSource,
)
from real_time_big_data_architect_spark.sources.registry import SOURCES

STATUS_SCHEMA = (
    "tick long, source string, n_rows long, headline string, agent string"
)


def process_tick(
    spark: SparkSession, batch_df: DataFrame, source_key: str, tick: int
) -> DataFrame:
    """One micro-batch: raw (fetch_ts, payload, error) rows → status row.

    The poll source emits one row per tick; normalize + agents run on
    it just like the reference's script body runs per refresh.
    """
    rows = batch_df.select("payload", "error").collect()
    if not rows:
        insight = agents.fallback_insight(source_key, "no poll row")
    else:
        payload, error = rows[-1].payload, rows[-1].error
        if error is not None or payload is None:
            insight = agents.commentary(None, source_key, fetch_error=error or "no payload")
        else:
            tidy = norm.normalize(
                spark.createDataFrame([(payload,)], "payload string"), source_key
            )
            insight = agents.commentary(tidy, source_key)
    d = asdict(insight)
    return spark.createDataFrame(
        [(tick, d["source"], d["n_rows"], d["headline"], d["agent"])],
        STATUS_SCHEMA,
    )


def run_poll_pipeline(
    spark: SparkSession,
    source_key: str,
    *,
    url_override: str | None = None,
    status_table: str = "poll_status",
    available_now: bool = False,
    processing_time: str = "60 seconds",
):
    """Start the live loop for one catalog source; returns the query.

    Status rows append to ``status_table`` (a memory sink), one per
    tick — the engine's analog of the reference's rendered page.
    """
    if not HTTP_POLL_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("Python DataSource API unavailable")
    spec = SOURCES[source_key]
    spark.dataSource.register(HttpPollDataSource)
    stream = (
        spark.readStream.format("http_poll")
        .option("url", url_override or spec.url)
        .option("headers", "{}")
        .option("timeout", str(spec.timeout_s))
        .load()
    )
    ticks = {"n": 0}

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        ticks["n"] += 1
        status = process_tick(batch_df.sparkSession, batch_df, source_key, batch_id)
        # managed table append — the durable analog of the reference's
        # rendered page; one status row per tick survives the stream
        status.write.mode("append").saveAsTable(status_table)

    writer = stream.writeStream.foreachBatch(on_batch)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
