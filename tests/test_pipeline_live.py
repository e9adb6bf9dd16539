"""End-to-end live-loop test: the reference's whole per-tick behavior
(fetch → normalize → agents → status) running as one Spark streaming
pipeline against a loopback HTTP server."""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from real_time_big_data_architect_spark.plans import pipeline
from real_time_big_data_architect_spark.sources.http_poll import HTTP_POLL_AVAILABLE


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        if self.path.startswith("/binance"):
            body = json.dumps({"symbol": "BTCUSDT", "price": "64250.10"})
            code = 200
        else:
            body = ""
            code = 503
        data = body.encode()
        self.send_response(code)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):
        pass


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


@pytest.mark.skipif(not HTTP_POLL_AVAILABLE, reason="Python DataSource API unavailable")
def test_live_loop_happy_path(spark, server):
    q = pipeline.run_poll_pipeline(
        spark,
        "binance",
        url_override=f"{server}/binance",
        status_table="status_ok",
        available_now=True,
    )
    q.awaitTermination(120)
    rows = spark.table("status_ok").collect()
    assert len(rows) >= 1
    r = rows[-1]
    assert r.agent == "primary"
    assert r.headline == "BTCUSDT 64,250.10"  # A10 formatting via agents
    assert r.n_rows == 1


@pytest.mark.skipif(not HTTP_POLL_AVAILABLE, reason="Python DataSource API unavailable")
def test_live_loop_degrades_on_http_error(spark, server):
    q = pipeline.run_poll_pipeline(
        spark,
        "binance",
        url_override=f"{server}/fail",
        status_table="status_fail",
        available_now=True,
    )
    q.awaitTermination(120)
    rows = spark.table("status_fail").collect()
    assert len(rows) >= 1
    r = rows[-1]
    assert r.agent == "fallback"  # C2/C4: degraded, stream alive
    assert "unavailable" in r.headline


class _MultiHandler(BaseHTTPRequestHandler):
    """Loopback catalog: binance + coingecko succeed, usgs fails."""

    def do_GET(self):  # noqa: N802
        if self.path.startswith("/binance"):
            body, code = json.dumps(
                {"symbol": "BTCUSDT", "price": "64250.10"}
            ), 200
        elif self.path.startswith("/coingecko"):
            body, code = json.dumps(
                {"bitcoin": {"usd": 64000.5}, "ethereum": {"usd": 3100.25}}
            ), 200
        else:
            body, code = "", 503
        data = body.encode()
        self.send_response(code)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):
        pass


@pytest.fixture(scope="module")
def multi_server():
    srv = HTTPServer(("127.0.0.1", 0), _MultiHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


@pytest.mark.skipif(not HTTP_POLL_AVAILABLE, reason="Python DataSource API unavailable")
def test_live_all_sources_tick_mixed_outcomes(spark, multi_server):
    """One concurrent tick over a 3-source subset: two sources succeed,
    one 503s — the tick yields one status row PER source, the failing
    one degraded to the fallback agent without touching the others
    (per-source C2-C5, the property the 1-source reference loop cannot
    express)."""
    q = pipeline.run_poll_all_pipeline(
        spark,
        url_overrides={
            "binance": f"{multi_server}/binance",
            "coingecko": f"{multi_server}/coingecko",
            "usgs_quakes": f"{multi_server}/fail",
        },
        sources=["binance", "coingecko", "usgs_quakes"],
        status_table="status_all_mixed",
        available_now=True,
    )
    q.awaitTermination(120)
    rows = spark.table("status_all_mixed").collect()
    by_src = {r.source: r for r in rows}
    assert set(by_src) == {"binance", "coingecko", "usgs_quakes"}
    assert by_src["binance"].agent == "primary"
    assert by_src["binance"].n_rows == 1
    assert by_src["coingecko"].agent == "primary"
    assert by_src["coingecko"].n_rows == 2
    assert by_src["usgs_quakes"].agent == "fallback"
    assert "unavailable" in by_src["usgs_quakes"].headline


@pytest.mark.skipif(not HTTP_POLL_AVAILABLE, reason="Python DataSource API unavailable")
def test_offline_all_sources_tick_covers_catalog(spark):
    """The offline (payload_dir) all-sources tick normalizes every
    catalog branch in one micro-batch: 10 status rows, all primary."""
    import os

    payload_dir = os.path.join(os.path.dirname(__file__), "payloads")
    q = pipeline.run_poll_all_pipeline(
        spark,
        payload_dir=payload_dir,
        status_table="status_all_offline",
        available_now=True,
    )
    q.awaitTermination(120)
    rows = spark.table("status_all_offline").collect()
    assert len(rows) == 10
    assert {r.source for r in rows} == set(
        __import__(
            "real_time_big_data_architect_spark.sources.registry",
            fromlist=["SOURCES"],
        ).SOURCES
    )
    assert all(r.agent == "primary" for r in rows)
    assert all(r.n_rows >= 1 for r in rows)


def test_oversized_poll_batch_fails_loudly(spark):
    """r5 verdict item 6: a poll batch beyond MAX_POLL_ROWS_PER_BATCH
    must refuse the driver funnel with a clear error (and the failing
    check itself only ever collects cap+1 rows, via limit)."""
    big = spark.range(pipeline.MAX_POLL_ROWS_PER_BATCH + 5).selectExpr(
        "'{}' AS payload", "CAST(NULL AS STRING) AS error"
    )
    with pytest.raises(RuntimeError, match="exceeded .* rows"):
        pipeline.process_tick(spark, big, "binance", tick=0)
    # at the cap: processes normally (one status row)
    ok = spark.range(1).selectExpr(
        "'{\"symbol\": \"BTCUSDT\", \"price\": \"1.0\"}' AS payload",
        "CAST(NULL AS STRING) AS error",
    )
    out = pipeline.process_tick(spark, ok, "binance", tick=0).collect()
    assert len(out) == 1 and out[0].source == "binance"
