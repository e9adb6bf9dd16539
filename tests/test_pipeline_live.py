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
