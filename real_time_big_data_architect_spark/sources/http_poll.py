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
from real_time_big_data_architect_spark.streaming import progress


#: hard byte ceiling on a single poll payload. The catalog endpoints
#: return small JSON documents (the reference caps at limit=20/50
#: records); a misbehaving endpoint streaming an unbounded body is the
#: one way a poll row could grow without bound, and poll payloads
#: transit the driver (plans/pipeline.py) — so oversize bodies degrade
#: into an error row at FETCH time, like every other fetch failure.
MAX_PAYLOAD_BYTES = 16 * 1024 * 1024


def fetch(
    url: str, headers: dict[str, str] | None = None, timeout: int = 15
) -> tuple[str | None, str | None]:
    """GET url → (payload_text, error); mirrors app.py:67-81 semantics.

    The payload is returned as raw text: JSON validity is checked (the
    reference's json-else-text fallback) but parsing into columns is
    Spark's job (``from_json`` in sources.normalize). Bodies larger
    than ``MAX_PAYLOAD_BYTES`` degrade to an error row (read is capped,
    never unbounded).
    """
    req = urllib.request.Request(url, headers=headers or {})
    if "weather.gov" in url:  # S2: conditional header injection (app.py:71-72)
        req.add_header("User-Agent", "real-time-big-data-architect-spark")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            if resp.status >= 400:
                return None, f"HTTP {resp.status}"
            raw = resp.read(MAX_PAYLOAD_BYTES + 1)
            if len(raw) > MAX_PAYLOAD_BYTES:
                return None, (
                    f"payload exceeds {MAX_PAYLOAD_BYTES} bytes (capped)"
                )
            body = raw.decode("utf-8", errors="replace")
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

    def _multi_poll_options(options: dict) -> list[tuple[str, dict]]:
        """Resolve the per-source polling plan for the all-sources
        reader: ``[(source_key, single-source options), ...]``.

        Addressing, per source key (subset via csv option ``sources``;
        default = the full 10-source catalog):
        - ``payload_dir`` — OFFLINE: ``{dir}/{key}.json`` captured
          payloads (tests / the driver's no-network sandbox);
        - ``urls`` — JSON object ``{key: url}`` overriding the catalog
          URL (loopback servers in tests), falling back to the catalog
          for keys not present;
        - otherwise the catalog entry itself (live).
        """
        from real_time_big_data_architect_spark.sources.registry import (
            SOURCES,
        )

        keys = [
            k for k in options.get("sources", ",".join(SOURCES)).split(",")
            if k
        ]
        overrides = json.loads(options.get("urls", "{}"))
        plan = []
        for key in keys:
            if "payload_dir" in options:
                plan.append(
                    (key, {"payload_path": f"{options['payload_dir']}/{key}.json"})
                )
            elif key in overrides:
                plan.append((key, {"url": overrides[key], "headers": "{}"}))
            else:
                plan.append((key, {"source": key}))
        return plan

    class _HttpMultiPollStreamReader(DataSourceStreamReader):
        """All catalog sources per micro-batch, ONE InputPartition per
        source — the polls run as parallel tasks, not a serial loop.

        The reference polls 1 of its 10 sources per 60 s tick
        (app.py:57-61, the ``st.selectbox`` choice); this reader
        exceeds that: every tick fans out the whole catalog, and a
        slow or failing endpoint degrades only its own row (the error
        column), never the tick.
        """

        def __init__(self, options: dict[str, str]) -> None:
            self._plan = _multi_poll_options(dict(options))
            self._offset = 0

        def initialOffset(self) -> dict:
            return {"poll": 0}

        def latestOffset(self) -> dict:
            self._offset += 1
            return {"poll": self._offset}

        def partitions(self, start: dict, end: dict):
            return [InputPartition(item) for item in self._plan]

        def commit(self, end: dict) -> None:
            pass

        def read(self, partition):
            key, opts = partition.value
            ts, payload, error = _poll_once(opts)
            yield ts, key, payload, error

    class _HttpMultiPollBatchReader(DataSourceReader):
        """One-shot all-sources snapshot: a 10-row frame fetched by 10
        parallel tasks."""

        def __init__(self, options: dict[str, str]) -> None:
            self._plan = _multi_poll_options(dict(options))

        def partitions(self):
            return [InputPartition(item) for item in self._plan]

        def read(self, partition):
            key, opts = partition.value
            ts, payload, error = _poll_once(opts)
            yield ts, key, payload, error

    class HttpPollAllDataSource(DataSource):
        """``format("http_poll_all")`` — the concurrent every-source
        poll (one row per source per tick/snapshot)."""

        @classmethod
        def name(cls) -> str:
            return "http_poll_all"

        def schema(self) -> str:
            return "fetch_ts double, source string, payload string, error string"

        def reader(self, schema):
            return _HttpMultiPollBatchReader(self.options)

        def streamReader(self, schema):
            return _HttpMultiPollStreamReader(self.options)

    def register_http_poll(spark) -> None:
        """Make ``format("http_poll")`` / ``format("http_poll_all")``
        resolvable in this session."""
        spark.dataSource.register(HttpPollDataSource)
        spark.dataSource.register(HttpPollAllDataSource)

    HTTP_POLL_AVAILABLE = True
except ImportError:  # pragma: no cover - Python DataSource API unavailable
    HttpPollDataSource = None  # type: ignore[assignment]
    HttpPollAllDataSource = None  # type: ignore[assignment]
    HTTP_POLL_AVAILABLE = False


import os as _os

_REPO_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)
_USGS_FIXTURE = f"{_REPO_ROOT}/tests/payloads/usgs_quakes.json"
_PAYLOAD_DIR = f"{_REPO_ROOT}/tests/payloads"


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


def http_poll_all_snapshot(spark, sf_dir: str):  # noqa: ARG001
    """Concurrent ALL-sources snapshot through the ``http_poll_all``
    datasource (offline fixture payloads): 10 parallel poll tasks →
    each payload through its own normalize branch → one (source,
    n_rows) row per catalog entry. Exceeds the reference's 1-source-
    per-tick loop (app.py:57-61) while reusing its normalize semantics
    (N1-N12) unchanged. The oracle recomputes every branch's row count
    from the same JSON files with DuckDB's independent parser.
    ``sf_dir`` is unused: the input is the captured payload catalog.
    """
    from pyspark.sql import functions as F

    from real_time_big_data_architect_spark.sources.normalize import (
        normalize,
    )
    from real_time_big_data_architect_spark.sources.registry import SOURCES

    register_http_poll(spark)
    # persist the catalog-sized (10-row) poll result: the 10 normalize
    # branches below each consume this relation, and without the cache
    # every branch would re-execute the full catalog poll (100 reads
    # offline; 100 HTTP fetches live, each source's count then coming
    # from a DIFFERENT poll round than its siblings)
    raw = (
        spark.read.format("http_poll_all")
        .option("payload_dir", _PAYLOAD_DIR)
        .load()
        .persist()
    )
    # one normalize branch per catalog entry over the same snapshot
    # frame — a plan-level loop over the fixed 10-entry catalog
    # (bounded by the catalog, not the data), unioned into one result.
    # Branches are CONSTRUCTED on a small driver thread pool (guide
    # §2.6 applied to plan building): each normalize branch is ~a dozen
    # py4j round-trips, and ten of them serially were the single
    # largest phase of this query (profiled 1.2-1.4 s of pure driver
    # plan construction vs 0.9 s poll + 0.7 s execution). Construction
    # is pure JVM object building — thread-safe, order preserved by
    # pool.map. Measured 1.38 s → 1.09 s end-to-end at sf0.1.
    from concurrent.futures import ThreadPoolExecutor

    def _branch(key: str):
        tidy = normalize(
            raw.filter(F.col("source") == key).select("payload"), key
        )
        return tidy.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(key).alias("source"), "n_rows"
        )

    with ThreadPoolExecutor(max_workers=4) as pool:
        parts = list(pool.map(_branch, list(SOURCES)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def stream_poll_all_tick(spark, sf_dir: str):  # noqa: ARG001
    """The concurrent every-source loop as a TRUE streaming query, one
    availableNow tick over the offline payload catalog: http_poll_all
    stream source → foreachBatch (per-source normalize + agent
    commentary) → status table. Oracle-backed: after one tick the
    status table must hold exactly one row per catalog source whose
    n_rows equals the branch's cardinality rule and whose agent is
    'primary' precisely when that count is positive — both recomputed
    by DuckDB from the same JSON files. ``sf_dir`` unused (payload
    catalog input)."""
    import shutil
    import uuid

    from real_time_big_data_architect_spark.plans.pipeline import (
        run_poll_all_pipeline,
    )
    from real_time_big_data_architect_spark.streaming.stateful import (
        stream_scratch_dir,
    )

    table = f"poll_all_{uuid.uuid4().hex[:12]}"
    ckpt = stream_scratch_dir("poll_all_ckpt_")
    q = run_poll_all_pipeline(
        spark,
        payload_dir=_PAYLOAD_DIR,
        status_table=table,
        available_now=True,
        checkpoint_location=ckpt,
    )
    try:
        q.awaitTermination()
        progress.record(q)
        # materialize the catalog-sized (10-row) status set, then drop
        # the scratch table so repeated invocations leave no warehouse
        # debris — the drop runs even when a tick fails mid-batch
        rows = spark.table(table).select(
            "source", "n_rows", "agent"
        ).collect()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(ckpt, ignore_errors=True)
    # JVM-side VALUES relation: createDataFrame would wrap the 10 rows
    # in a Python-RDD scan, charging the caller's collect a Python
    # worker round-trip (see tables.jvm_local_df)
    from real_time_big_data_architect_spark.tables import jvm_local_df

    return jvm_local_df(
        spark,
        [(r.source, r.n_rows, r.agent) for r in rows],
        "source string, n_rows long, agent string",
    )


def _poll_all_tick_oracle() -> str:
    parts = [
        f"SELECT '{key}' AS source,"
        f" ({sql.format(d=_PAYLOAD_DIR)}) AS n_rows,"
        f" CASE WHEN ({sql.format(d=_PAYLOAD_DIR)}) > 0"
        f" THEN 'primary' ELSE 'fallback' END AS agent"
        for key, sql in _ALL_SNAPSHOT_COUNTS.items()
    ]
    return " UNION ALL ".join(parts)


QUERIES = {
    "http_poll_usgs_snapshot": http_poll_usgs_snapshot,
    "http_poll_all_snapshot": http_poll_all_snapshot,
    "stream_poll_all_tick": stream_poll_all_tick,
}

#: per-branch row-count reconstructions for the all-sources snapshot:
#: each mirrors its normalize branch's cardinality rule (N2 double
#: explode, N4/N9 map→rows, N5/N8 feature explode, N7 head-slice cap,
#: scalar branches = one row per payload) computed from the SAME JSON
#: file with DuckDB's independent parser — nothing hardcoded.
_ALL_SNAPSHOT_COUNTS = {
    "openaq": """
        SELECT CAST(COALESCE(SUM(json_array_length(m, '$.measurements')), 0)
                    AS BIGINT)
        FROM (SELECT unnest(CAST(json_extract(content, '$.results')
                                 AS JSON[])) AS m
              FROM read_text('{d}/openaq.json')) t
    """,
    "open_meteo": "SELECT COUNT(*) FROM read_text('{d}/open_meteo.json')",
    "coingecko": """
        SELECT CAST(len(json_keys(content)) AS BIGINT)
        FROM read_text('{d}/coingecko.json')
    """,
    "usgs_quakes": """
        SELECT CAST(json_array_length(content, '$.features') AS BIGINT)
        FROM read_text('{d}/usgs_quakes.json')
    """,
    "spacex": "SELECT COUNT(*) FROM read_text('{d}/spacex.json')",
    "github_events": """
        SELECT CAST(least(30, json_array_length(content)) AS BIGINT)
        FROM read_text('{d}/github_events.json')
    """,
    "nws_alerts": """
        SELECT CAST(json_array_length(content, '$.features') AS BIGINT)
        FROM read_text('{d}/nws_alerts.json')
    """,
    "fx_rates": """
        SELECT CAST(len(json_keys(content, '$.rates')) AS BIGINT)
        FROM read_text('{d}/fx_rates.json')
    """,
    "iss_now": "SELECT COUNT(*) FROM read_text('{d}/iss_now.json')",
    "binance": "SELECT COUNT(*) FROM read_text('{d}/binance.json')",
}


def _all_snapshot_oracle() -> str:
    parts = [
        f"SELECT '{key}' AS source,"
        f" ({sql.format(d=_PAYLOAD_DIR)}) AS n_rows"
        for key, sql in _ALL_SNAPSHOT_COUNTS.items()
    ]
    return " UNION ALL ".join(parts)


ORACLE = {
    "http_poll_all_snapshot": _all_snapshot_oracle(),
    "stream_poll_all_tick": _poll_all_tick_oracle(),
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
