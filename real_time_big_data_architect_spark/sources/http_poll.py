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


try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _HttpPollStreamReader(DataSourceStreamReader):
        """One poll per micro-batch; offset = poll counter."""

        def __init__(self, options: dict[str, str]) -> None:
            self._url = options.get("url", "")
            self._headers = json.loads(options.get("headers", "{}"))
            self._timeout = int(options.get("timeout", "15"))
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
            payload, error = fetch(self._url, self._headers, self._timeout)
            yield (float(time.time()), payload, error)

    class HttpPollDataSource(DataSource):
        """spark.readStream.format("http_poll").option("url", ...)"""

        @classmethod
        def name(cls) -> str:
            return "http_poll"

        def schema(self) -> str:
            return "fetch_ts double, payload string, error string"

        def streamReader(self, schema):
            return _HttpPollStreamReader(self.options)

    HTTP_POLL_AVAILABLE = True
except ImportError:  # pragma: no cover - Python DataSource API unavailable
    HttpPollDataSource = None  # type: ignore[assignment]
    HTTP_POLL_AVAILABLE = False
