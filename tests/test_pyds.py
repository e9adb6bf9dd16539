"""Spark 4 Python DataSource (http_poll): batch + streaming over the
captured payload fixtures, with the normalize layer stacked on top."""

from __future__ import annotations

import os
import time

from real_time_big_data_architect_spark.sources import normalize
from real_time_big_data_architect_spark.sources.http_poll import (
    register_http_poll,
)

PAYLOADS = os.path.join(os.path.dirname(__file__), "payloads")


def _read(spark, source):
    register_http_poll(spark)
    return (
        spark.read.format("http_poll")
        .option("source", source)
        .option("payload_path", os.path.join(PAYLOADS, f"{source}.json"))
        .load()
    )


def test_batch_read_returns_raw_payload(spark):
    rows = _read(spark, "usgs_quakes").collect()
    assert len(rows) == 1
    assert rows[0].error is None
    assert '"features"' in rows[0].payload


def test_normalize_stacks_on_datasource(spark):
    """The same declarative pipeline used everywhere else parses the
    datasource output — source emits raw, normalize owns parsing."""
    df = _read(spark, "usgs_quakes").select("payload")
    out = normalize.normalize_usgs_quakes(df).collect()
    assert len(out) > 0
    assert {"mag", "place"} <= set(out[0].asDict())


def test_missing_payload_file_degrades_to_error_row(spark):
    register_http_poll(spark)
    rows = (
        spark.read.format("http_poll")
        .option("payload_path", "/nonexistent/x.json")
        .load()
        .collect()
    )
    assert len(rows) == 1
    assert rows[0].payload is None and rows[0].error


def test_streaming_ticks_produce_one_row_per_batch(spark, tmp_path):
    """The 60 s tick as a real stream: each micro-batch is one poll.
    Run with a fast trigger, wait for >=2 ticks, stop."""
    register_http_poll(spark)
    stream = (
        spark.readStream.format("http_poll")
        .option("payload_path", os.path.join(PAYLOADS, "iss_now.json"))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("poll_ticks")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT COUNT(*) c FROM poll_ticks").first().c
            if n >= 2:
                break
            time.sleep(0.5)
        assert n >= 2, f"only {n} ticks arrived"
        rows = spark.sql(
            "SELECT * FROM poll_ticks WHERE payload IS NOT NULL LIMIT 1"
        ).collect()
        assert '"iss_position"' in rows[0].payload
    finally:
        q.stop()
