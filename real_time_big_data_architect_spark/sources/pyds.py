"""Spark 4 Python DataSource for the reference's HTTP poll loop.

The reference's core is ``fetch(url) → normalize → show`` on a 60 s
tick (app.py:37,67-81). This module re-expresses the FETCH side as a
first-class Spark data source — ``spark.read.format("http_poll")`` for
one-shot snapshots and ``spark.readStream.format("http_poll")`` for
the tick loop — so the engine's own source API (not a driver-side
helper) owns polling, and the declarative ``normalize_*`` pipelines
(sources/normalize.py) stack on top unchanged in both modes.

Options:
  source        catalog key from sources.registry.SOURCES (metadata +
                live URL + conditional UA header, app.py:40-52,67-81)
  payload_path  OFFLINE mode: read the payload from this local file
                instead of the network (tests use the captured fixtures
                in tests/payloads/ — no network in CI, SURVEY §5.2)

Output schema (both modes): ``source string, payload string`` — the raw
document, exactly what the reference's ``fetch`` returns; parsing is
the normalize layer's job.

Scale notes: a poll source is inherently 1-row-per-tick (the payload IS
the unit); the weight lives downstream where normalize explodes it.
The streaming reader tracks a monotonically increasing tick counter as
its offset — restart-safe (the checkpoint replays the tick number, and
``readBetweenOffsets`` re-fetches for recovery, matching the
reference's stateless latest-snapshot-wins semantics, SURVEY §3.2).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("payload", StringType()),
    ]
)


def _fetch_payload(options: dict) -> str | None:
    """Offline: read the fixture file. Live: GET the catalog URL with
    the reference's conditional UA header (app.py:67-81). Any failure
    → None payload, which normalize's null guard (N1) turns into an
    empty typed frame — the reference's own fallback."""
    path = options.get("payload_path")
    if path:
        try:
            with open(path, encoding="utf-8") as f:
                return f.read()
        except OSError:
            return None
    # live mode — import lazily so offline workers never need it
    try:
        import urllib.request

        from real_time_big_data_architect_spark.sources.registry import SOURCES

        spec = SOURCES[options["source"]]
        req = urllib.request.Request(spec.url, headers=spec.headers or {})
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.read().decode("utf-8")
    except Exception:  # noqa: BLE001 - any fetch failure is a null tick
        return None


class _HttpPollReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.options = dict(options)

    def read(self, partition):  # noqa: ARG002 - single logical partition
        yield (self.options.get("source", "unknown"), _fetch_payload(self.options))


class _HttpPollStreamReader(SimpleDataSourceStreamReader):
    """One poll per micro-batch; the trigger interval IS the tick
    (production: ``trigger(processingTime='60 seconds')``)."""

    def __init__(self, options: dict) -> None:
        self.options = dict(options)

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def read(self, start: dict):
        row = (self.options.get("source", "unknown"), _fetch_payload(self.options))
        return iter([row]), {"tick": int(start["tick"]) + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        # recovery replay: re-fetch (stateless snapshot semantics)
        n = int(end["tick"]) - int(start["tick"])
        return iter(
            [
                (self.options.get("source", "unknown"), _fetch_payload(self.options))
                for _ in range(max(n, 1))
            ]
        )

    def commit(self, end: dict) -> None:
        pass


class HttpPollDataSource(DataSource):
    """``http_poll`` — batch snapshot + streaming tick source."""

    @classmethod
    def name(cls) -> str:
        return "http_poll"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema) -> _HttpPollReader:  # noqa: ARG002
        return _HttpPollReader(self.options)

    def simpleStreamReader(self, schema) -> _HttpPollStreamReader:  # noqa: ARG002
        return _HttpPollStreamReader(self.options)


def register_http_poll(spark) -> None:
    """Make ``format("http_poll")`` resolvable in this session."""
    spark.dataSource.register(HttpPollDataSource)


_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
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
