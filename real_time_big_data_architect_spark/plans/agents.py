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
        headline = f"BTC ${row['usd']:,.0f}" if row else "BTC not present"
    elif source == "usgs_quakes":
        row = (
            df.na.drop(subset=["mag"])
            .orderBy(F.col("time").desc())
            .limit(1)
            .first()
        )
        headline = f"latest quake M{row['mag']} @ {row['place']}" if row else "no quakes"
    elif source == "fx_rates":
        row = df.orderBy(F.col("rate").desc()).limit(1).first()
        headline = f"strongest pair {row['pair']} @ {row['rate']:.3f}" if row else "no rates"
    elif source == "open_meteo":
        row = df.first()
        headline = f"{row['temperature_2m']:.1f}°C wind {row['wind_speed_10m']}" if row else "n/a"
    elif source == "iss_now":
        row = df.select(
            F.col("latitude").cast("double").alias("lat"),
            F.col("longitude").cast("double").alias("lon"),
        ).first()
        headline = f"ISS at ({row['lat']:.2f}, {row['lon']:.2f})" if row else "n/a"
    elif source == "binance":
        row = df.select(F.col("price").cast("double").alias("p")).first()
        headline = f"BTCUSDT {row['p']:,.2f}" if row else "n/a"
    else:
        headline = f"{n} records"
    return Insight(source=source, n_rows=n, headline=headline, agent="primary")


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
