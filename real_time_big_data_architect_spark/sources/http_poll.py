"""HTTP polling source (reference Extract stage, app.py:67-81).

Two layers:

- :func:`fetch` — the reference's fetch semantics re-implemented with
  stdlib urllib (no ``requests`` dependency): 15 s timeout, optional
  header injection (S2), HTTP-error surfaced, JSON-parse with plain-text
  fallback, returns ``(payload_text, error)``.
- :class:`HttpPollDataSource` — a Spark 4 Python streaming DataSource
  (``SimpleDataSourceStreamReader``): each micro-batch polls the URL
  once and emits one row ``(fetch_ts, payload, error)``; downstream,
  ``sources.normalize`` turns the payload into the tidy table. Gated
  behind an import-try — the API is young and never exercised by the
  driver (tests use fixture payloads, no network; SURVEY §7 M4).

Live wiring (not run in tests)::

    spark.dataSource.register(HttpPollDataSource)
    raw = (spark.readStream.format("http_poll")
           .option("url", SOURCES["binance"].url).load())
    tidy = foreachBatch(lambda df, _: normalize(df, "binance") ...)
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request


def fetch(
    url: str, headers: dict[str, str] | None = None, timeout: int = 15
) -> tuple[str | None, str | None]:
    """GET url → (payload_text, error); mirrors app.py:67-81 semantics.

    The payload is returned as raw text: JSON validity is checked (the
    reference's json-else-text fallback) but parsing into columns is
    Spark's job (``from_json`` in sources.normalize).
    """
    req = urllib.request.Request(url, headers=headers or {})
    if "weather.gov" in url:  # S2: conditional header injection (app.py:71-72)
        req.add_header("User-Agent", "real-time-big-data-architect-spark")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            if resp.status >= 400:
                return None, f"HTTP {resp.status}"
            body = resp.read().decode("utf-8", errors="replace")
    except (urllib.error.URLError, OSError, ValueError) as exc:
        return None, str(exc)
    try:
        json.loads(body)
        return body, None
    except json.JSONDecodeError:
        return body, None  # text fallback (app.py:79): payload kept as-is


def _poll_once(options: dict) -> tuple[float, str | None, str | None]:
    """One tick: (fetch_ts, payload, error).

    Three addressing modes, checked in order:
    - ``payload_path`` — OFFLINE: read a captured payload file (tests /
      the driver's no-network sandbox; SURVEY §5.2);
    - ``source`` — catalog key: URL + conditional headers from
      ``registry.SOURCES`` (app.py:40-52);
    - ``url`` (+ optional JSON ``headers``) — direct.
    Failures surface in the ``error`` column, never as exceptions —
    the reference's degrade-don't-crash contract (C2).
    """
    path = options.get("payload_path")
    if path:
        try:
            with open(path, encoding="utf-8") as f:
                return float(time.time()), f.read(), None
        except OSError as exc:
            return float(time.time()), None, str(exc)
    if "source" in options:
        from real_time_big_data_architect_spark.sources.registry import SOURCES

        spec = SOURCES[options["source"]]
        payload, error = fetch(spec.url, dict(spec.headers or {}))
        return float(time.time()), payload, error
    payload, error = fetch(
        options.get("url", ""),
        json.loads(options.get("headers", "{}")),
        int(options.get("timeout", "15")),
    )
    return float(time.time()), payload, error


try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    class _HttpPollStreamReader(DataSourceStreamReader):
        """One poll per micro-batch; offset = poll counter."""

        def __init__(self, options: dict[str, str]) -> None:
            self._options = dict(options)
            self._offset = 0

        def initialOffset(self) -> dict:
            return {"poll": 0}

        def latestOffset(self) -> dict:
            self._offset += 1
            return {"poll": self._offset}

        def partitions(self, start: dict, end: dict):
            return [InputPartition(end["poll"])]

        def commit(self, end: dict) -> None:
            pass

        def read(self, partition):
            yield _poll_once(self._options)

    class _HttpPollBatchReader(DataSourceReader):
        """One-shot snapshot: a single poll as a 1-row batch frame."""

        def __init__(self, options: dict[str, str]) -> None:
            self._options = dict(options)

        def read(self, partition):  # noqa: ARG002 - one logical partition
            yield _poll_once(self._options)

    class HttpPollDataSource(DataSource):
        """``spark.read[Stream].format("http_poll")`` — snapshot or
        tick loop from one source definition (see :func:`_poll_once`
        for the addressing options)."""

        @classmethod
        def name(cls) -> str:
            return "http_poll"

        def schema(self) -> str:
            return "fetch_ts double, payload string, error string"

        def reader(self, schema):
            return _HttpPollBatchReader(self.options)

        def streamReader(self, schema):
            return _HttpPollStreamReader(self.options)

    def register_http_poll(spark) -> None:
        """Make ``format("http_poll")`` resolvable in this session."""
        spark.dataSource.register(HttpPollDataSource)

    HTTP_POLL_AVAILABLE = True
except ImportError:  # pragma: no cover - Python DataSource API unavailable
    HttpPollDataSource = None  # type: ignore[assignment]
    HTTP_POLL_AVAILABLE = False


import os as _os

_REPO_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)
_USGS_FIXTURE = f"{_REPO_ROOT}/tests/payloads/usgs_quakes.json"


def http_poll_usgs_snapshot(spark, sf_dir: str):  # noqa: ARG001
    """The reference's full S1→N5 path as one oracle-checked query:
    http_poll datasource (offline fixture payload) → declarative
    normalize. The oracle parses the SAME JSON file with DuckDB's
    independent reader — two engines, two JSON parsers, one answer.
    ``sf_dir`` is unused: the input is the captured payload, the
    contract the reference actually consumes."""
    from real_time_big_data_architect_spark.sources.normalize import (
        normalize_usgs_quakes,
    )

    register_http_poll(spark)
    raw = (
        spark.read.format("http_poll")
        .option("source", "usgs_quakes")
        .option("payload_path", _USGS_FIXTURE)
        .load()
    )
    return normalize_usgs_quakes(raw.select("payload"))


QUERIES = {
    "http_poll_usgs_snapshot": http_poll_usgs_snapshot,
}

ORACLE = {
    "http_poll_usgs_snapshot": f"""
        SELECT strftime(make_timestamp(f.properties.time * 1000),
                        '%Y-%m-%d %H:%M:%S') AS time,
               f.properties.mag AS mag,
               f.properties.place AS place,
               f.properties.type AS type
        FROM (SELECT unnest(features) AS f
              FROM read_json('{_USGS_FIXTURE}'))
    """,
}
