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


def test_jsonl_sink_two_phase_commit(spark, tmp_path):
    """The Python DataSource writer's publish protocol: after save(),
    only FINAL .jsonl files exist (every per-task .tmp was atomically
    renamed by the driver-side commit), and their content parses back
    to exactly the written rows."""
    import glob
    import json as _json

    from real_time_big_data_architect_spark.sources import lake as L

    if not L.JSONL_SINK_AVAILABLE:
        import pytest

        pytest.skip("Python DataSource API unavailable")
    spark.dataSource.register(L.JsonlSinkDataSource)
    df = spark.range(10).selectExpr(
        "id AS event_id", "id * 2 AS user_id",
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS event_type",
        "CAST(id AS DOUBLE) / 4.0 AS value",
    ).repartition(3)
    out = str(tmp_path / "sink")
    import os

    os.makedirs(out)
    df.write.format("jsonl_sink").option("path", out).mode("append").save()
    assert not glob.glob(f"{out}/*.tmp"), "uncommitted temp files leaked"
    rows = []
    for p in glob.glob(f"{out}/*.jsonl"):
        with open(p) as fh:
            rows.extend(_json.loads(line) for line in fh)
    got = sorted((r["event_id"], r["user_id"], r["event_type"], r["value"])
                 for r in rows)
    want = sorted((i, i * 2, "a" if i % 2 == 0 else "b", i / 4.0)
                  for i in range(10))
    assert got == want
