"""Primary/fallback analytics agents (reference C1-C6, app.py:192-247).

Agent 1 (:func:`snapshot_insights`) validates the batch and computes the
reference's per-source insight queries with DataFrame ops; it raises on
an empty table exactly like ``agent_1`` (app.py:194-195). Agent 2
(:func:`fallback_insight`) is the degrade path. :func:`commentary` is
the try/except dispatcher (``agentic_commentary``, app.py:242-247),
usable directly inside ``foreachBatch`` — each micro-batch gets a
status record instead of a crashed stream.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class EmptyBatchError(ValueError):
    """Raised on an empty tidy table (agent_1's ValueError, app.py:194-195)."""


@dataclass
class Insight:
    source: str
    n_rows: int
    headline: str
    agent: str  # "primary" | "fallback"


def _render_headline(source: str, n: int, row) -> str:
    """Shared headline formatter: ``row`` is the per-source pick (a
    mapping or None), ``n`` the tidy row count. Raises exactly like the
    direct path on malformed picks (e.g. a NULL spot price under a
    numeric format) so the C3 dispatcher degrades identically whether
    the pick came from ``first()`` or from the batched union agg."""
    if source == "coingecko":
        return f"BTC ${row['usd']:,.0f}" if row else "BTC not present"
    if source == "usgs_quakes":
        return f"latest quake M{row['mag']} @ {row['place']}" if row else "no quakes"
    if source == "fx_rates":
        return f"strongest pair {row['pair']} @ {row['rate']:.3f}" if row else "no rates"
    if source == "open_meteo":
        return f"{row['temperature_2m']:.1f}°C wind {row['wind_speed_10m']}" if row else "n/a"
    if source == "iss_now":
        return f"ISS at ({row['lat']:.2f}, {row['lon']:.2f})" if row else "n/a"
    if source == "binance":
        return f"BTCUSDT {row['p']:,.2f}" if row else "n/a"
    return f"{n} records"


def snapshot_insights(df: DataFrame, source: str) -> Insight:
    """Agent 1: count + one per-source headline insight (app.py:192-228).

    Every branch is a Spark expression over the tidy table — the
    reference's pandas lookups (A3-A10) re-expressed:
    count → ``df.count()``; bitcoin spot → filter+first (A4/A5);
    strongest/latest → ``orderBy desc limit 1`` (A7).
    """
    n = df.count()
    if n == 0:
        raise EmptyBatchError(f"{source}: empty batch")

    if source == "coingecko":
        row = (
            df.filter(F.col("asset") == "bitcoin")
            .select(F.col("usd").cast("double").alias("usd"))
            .first()
        )
    elif source == "usgs_quakes":
        row = (
            df.na.drop(subset=["mag"])
            .orderBy(F.col("time").desc())
            .limit(1)
            .first()
        )
    elif source == "fx_rates":
        row = df.orderBy(F.col("rate").desc()).limit(1).first()
    elif source == "open_meteo":
        row = df.first()
    elif source == "iss_now":
        row = df.select(
            F.col("latitude").cast("double").alias("lat"),
            F.col("longitude").cast("double").alias("lon"),
        ).first()
    elif source == "binance":
        row = df.select(F.col("price").cast("double").alias("p")).first()
    else:
        row = None
    headline = _render_headline(source, n, row)
    return Insight(source=source, n_rows=n, headline=headline, agent="primary")


#: Spark-side pick expression per source for the batched union path —
#: the SAME A4/A5/A7 lookups as :func:`snapshot_insights`, re-shaped as
#: single aggregates so a whole catalog tick is ONE Spark job:
#: filter+first → max(CASE WHEN ...), orderBy-desc-limit-1 → max_by
#: (ties arbitrary in both forms). NULL-ordering parity: max_by skips
#: NULL ordering keys exactly like na.drop / the desc-nulls-last first
#: row that the direct path would format (a NULL pick field then raises
#: the same TypeError under the shared formatter → same C3 fallback).
_PICK_EXPRS: dict[str, str] = {
    "coingecko": (
        "named_struct("
        " 'usd', max(CASE WHEN asset = 'bitcoin'"
        "       THEN CAST(usd AS DOUBLE) END),"
        " 'present', count(CASE WHEN asset = 'bitcoin' THEN 1 END) > 0)"
    ),
    "usgs_quakes": (
        "max_by(named_struct('mag', mag, 'place', place),"
        " CASE WHEN mag IS NOT NULL THEN time END)"
    ),
    "fx_rates": (
        "CASE WHEN count(rate) > 0"
        " THEN named_struct('pair', max_by(pair, rate),"
        "                   'rate', max(rate))"
        " ELSE named_struct('pair', CAST(NULL AS STRING),"
        "                   'rate', CAST(NULL AS DOUBLE)) END"
    ),
    # ONE first() over a struct, not one per field: independent
    # first(col) aggregates may each take a DIFFERENT arbitrary row on
    # a multi-row frame, mixing fields across rows; the struct pick
    # takes all fields from the same row, like the direct path's
    # df.first()
    "open_meteo": (
        "first(named_struct('temperature_2m', temperature_2m,"
        " 'wind_speed_10m', wind_speed_10m))"
    ),
    "iss_now": (
        "first(named_struct('lat', CAST(latitude AS DOUBLE),"
        " 'lon', CAST(longitude AS DOUBLE)))"
    ),
    "binance": "first(named_struct('p', CAST(price AS DOUBLE)))",
}


def batch_insights(
    tidies: dict[str, "DataFrame | Any"],
) -> dict[str, Insight]:
    """Agent 1 over a WHOLE catalog tick, one concurrent action per
    source.

    Each source's tidy frame contributes a one-row aggregate branch
    ``(source, n, pick-json)``, collected concurrently across driver
    threads, and the shared formatter renders headlines driver-side
    from the collected picks. Semantics match per-source
    :func:`snapshot_insights` + the C3 dispatcher (same formatter, same
    empty-batch and malformed-pick degrades); cost is the scheduling
    fixed cost of ONE concurrent wave per tick instead of 1-2 serial
    jobs per source (r7 verdict item 2).

    Values may be DataFrames or ZERO-ARG FACTORIES returning one: a
    factory's plan construction (createDataFrame + normalize, ~40 ms of
    py4j chatter each) then runs inside the same worker thread as the
    branch's analysis and collect, overlapping across sources instead
    of serializing before the wave.
    """
    import json
    from concurrent.futures import ThreadPoolExecutor

    out: dict[str, Insight] = {}

    # One action per source, all submitted concurrently: the dominant
    # per-branch cost is JVM-side analysis/optimization of the
    # from_json plan (~0.3 s each), which parallelizes across driver
    # threads — a union would analyze all ten branches serially in one
    # thread. A failing branch degrades through the per-source C3
    # dispatcher, exactly like the sequential path.
    def _one(source: str) -> tuple[str, Any]:
        spec = tidies[source]
        try:
            df = spec() if callable(spec) else spec
        except Exception as exc:  # noqa: BLE001 — C4/C3: the payload
            # can't even become a tidy frame for this source
            return source, fallback_insight(source, str(exc))
        pick = _PICK_EXPRS.get(source)
        try:
            branch = df.agg(
                F.count(F.lit(1)).alias("n"),
                (
                    F.expr(f"to_json({pick})")
                    if pick
                    else F.lit(None).cast("string")
                ).alias("pick"),
            ).select(F.lit(source).alias("source"), "n", "pick")
            return source, branch.collect()[0]
        except Exception:  # noqa: BLE001 — C3 per source: fall back to
            # the sequential dispatcher over the built tidy frame
            return source, commentary(df, source)

    with ThreadPoolExecutor(max_workers=max(len(tidies), 1)) as pool:
        results = list(pool.map(_one, list(tidies)))
    collected = []
    for source, res in results:
        if isinstance(res, Insight):
            out[source] = res
        else:
            collected.append(res)
    for r in collected:
        source, n = r["source"], r["n"]
        try:
            if n == 0:
                raise EmptyBatchError(f"{source}: empty batch")
            pick = json.loads(r["pick"]) if r["pick"] is not None else None
            if source == "coingecko":
                # to_json drops NULL fields: present=false ⇒ no bitcoin
                # row ⇒ the direct path's first() returned None
                pick = (
                    {"usd": pick.get("usd")} if pick.get("present") else None
                )
            elif pick is not None and _PICK_EXPRS.get(source):
                # restore fields to_json dropped as NULL so the shared
                # formatter sees the same keys the direct path would
                for k in _PICK_KEYS[source]:
                    pick.setdefault(k, None)
            out[source] = Insight(
                source=source,
                n_rows=n,
                headline=_render_headline(source, n, pick),
                agent="primary",
            )
        except Exception as exc:  # noqa: BLE001 — C3: degrade per source
            out[source] = fallback_insight(source, str(exc))
    return out


_PICK_KEYS = {
    "coingecko": ("usd",),
    "usgs_quakes": ("mag", "place"),
    "fx_rates": ("pair", "rate"),
    "open_meteo": ("temperature_2m", "wind_speed_10m"),
    "iss_now": ("lat", "lon"),
    "binance": ("p",),
}


def fallback_insight(source: str, reason: str) -> Insight:
    """Agent 2: source-down diagnosis + retry suggestion (app.py:230-240)."""
    return Insight(
        source=source,
        n_rows=0,
        headline=f"source '{source}' unavailable ({reason}); retry or switch source",
        agent="fallback",
    )


def commentary(df: DataFrame | None, source: str, fetch_error: str | None = None) -> Insight:
    """try/except dispatcher (app.py:242-247): primary, else fallback.

    Also absorbs the fetch-error degrade (C4) and empty-result degrade
    (C5): a fetch error or empty/None table routes to Agent 2.
    """
    if fetch_error is not None or df is None:
        return fallback_insight(source, fetch_error or "no payload")
    try:
        return snapshot_insights(df, source)
    except Exception as exc:  # C3: any primary failure → fallback
        return fallback_insight(source, str(exc))
