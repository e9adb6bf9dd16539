"""Normalization: raw JSON payload → tidy typed DataFrame.

The Spark-first re-expression of ``normalize_to_df`` (app.py:84-189,
SURVEY §2.2): each branch is a ``from_json`` + explode/select pipeline
over a DataFrame holding the raw payload string in a ``payload`` column
— fully declarative, so the same pipelines run identically in batch
(unit tests on captured payloads) and inside ``foreachBatch`` on the
live poll stream.

Branch map (reference → here):
  N1  null guard            → empty DF with the branch schema
  N2  openaq                → double explode, parent key carried down
  N3  open_meteo            → nested-struct projection
  N4  coingecko             → MapType explode (map→rows pivot)
  N5  usgs_quakes           → explode + timestamp_millis + date_format
  N6  spacex                → scalar projection
  N7  github_events         → array head-slice (limit 30) + dotted paths
  N8  nws_alerts            → explode + projection
  N9  fx_rates              → map explode + concat_ws scalar carry-down
  N10 iss_now               → struct projection, strings kept as strings
  N11 binance               → flat projection
  N12 unknown key           → empty DF
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_big_data_architect_spark.sources import schemas as S

GITHUB_CLIENT_CAP = 30  # raw[:30], app.py:144


def _parsed(df: DataFrame, schema) -> DataFrame:
    """Parse + drop unparseable payloads: ``from_json`` yields NULL for
    a null or non-JSON payload (an HTML error page from a 200, a
    truncated body), and without this filter the SCALAR-projection
    branches emitted one all-NULL phantom row the dashboards then
    "reported" (r10 review finding — explode branches were immune only
    because exploding NULL yields no rows). The N1 contract is the
    same for every branch: unparseable → ZERO rows."""
    return df.select(F.from_json("payload", schema).alias("p")).filter(
        F.col("p").isNotNull()
    )


def normalize_openaq(df: DataFrame) -> DataFrame:
    """results[] × measurements[] → rows; city carried down (N2)."""
    return (
        _parsed(df, S.OPENAQ)
        .select(F.explode("p.results").alias("r"))
        .select(F.col("r.city").alias("city"), F.explode("r.measurements").alias("m"))
        .select(
            "city",
            F.col("m.parameter").alias("parameter"),
            F.col("m.value").alias("value"),
            F.col("m.unit").alias("unit"),
            F.col("m.lastUpdated").alias("updated"),
        )
    )


def normalize_open_meteo(df: DataFrame) -> DataFrame:
    """single nested struct → 1-row projection (N3)."""
    return _parsed(df, S.OPEN_METEO).select(
        F.col("p.current.temperature_2m").alias("temperature_2m"),
        F.col("p.current.wind_speed_10m").alias("wind_speed_10m"),
        F.col("p.current.time").alias("time"),
    )


def normalize_coingecko(df: DataFrame) -> DataFrame:
    """map→rows pivot: asset keys become rows (N4)."""
    return (
        _parsed(df, S.COINGECKO)
        .select(F.explode("p").alias("asset", "v"))
        .select("asset", F.col("v.usd").alias("usd"))
    )


def normalize_usgs_quakes(df: DataFrame) -> DataFrame:
    """explode features[]; epoch-ms → 'yyyy-MM-dd HH:mm:ss' string (N5)."""
    return (
        _parsed(df, S.USGS_QUAKES)
        .select(F.explode("p.features").alias("f"))
        .select(
            F.date_format(
                F.timestamp_millis(F.col("f.properties.time")), "yyyy-MM-dd HH:mm:ss"
            ).alias("time"),
            F.col("f.properties.mag").alias("mag"),
            F.col("f.properties.place").alias("place"),
            F.col("f.properties.type").alias("type"),
        )
    )


def normalize_spacex(df: DataFrame) -> DataFrame:
    """top-level scalar projection (N6)."""
    return _parsed(df, S.SPACEX).select(
        F.col("p.name").alias("name"),
        F.col("p.date_utc").alias("date_utc"),
        F.col("p.success").alias("success"),
        F.col("p.flight_number").alias("flight_number"),
    )


def normalize_github_events(df: DataFrame) -> DataFrame:
    """array head-slice (first 30) + nested projection (N7)."""
    return (
        _parsed(df, S.GITHUB_EVENTS)
        .select(F.explode(F.slice("p", 1, GITHUB_CLIENT_CAP)).alias("ev"))
        .select(
            F.col("ev.type").alias("type"),
            F.col("ev.repo.name").alias("repo"),
            F.col("ev.actor.login").alias("actor"),
            F.col("ev.created_at").alias("created_at"),
        )
    )


def normalize_nws_alerts(df: DataFrame) -> DataFrame:
    """explode features[], project properties.* (N8)."""
    return (
        _parsed(df, S.NWS_ALERTS)
        .select(F.explode("p.features").alias("f"))
        .select(
            F.col("f.properties.event").alias("event"),
            F.col("f.properties.areaDesc").alias("area"),
            F.col("f.properties.severity").alias("severity"),
            F.col("f.properties.sent").alias("sent"),
        )
    )


def normalize_fx_rates(df: DataFrame) -> DataFrame:
    """map→rows + 'base/key' concat carrying scalars to every row (N9)."""
    return (
        _parsed(df, S.FX_RATES)
        .select("p.base", "p.date", F.explode("p.rates").alias("ccy", "rate"))
        .select(
            # F.concat, not concat_ws: a payload missing 'base' must
            # surface as a NULL pair, not silently render as the bare
            # currency code (concat_ws skips NULL fields AND the
            # separator — r10 review finding)
            F.concat(F.col("base"), F.lit("/"), F.col("ccy")).alias("pair"),
            "rate",
            "date",
        )
    )


def normalize_iss_now(df: DataFrame) -> DataFrame:
    """struct projection; lat/long stay strings — cast at analytics (N10)."""
    return _parsed(df, S.ISS_NOW).select(
        F.col("p.iss_position.latitude").alias("latitude"),
        F.col("p.iss_position.longitude").alias("longitude"),
        F.col("p.timestamp").alias("timestamp"),
    )


def normalize_binance(df: DataFrame) -> DataFrame:
    """flat dict → 1-row table; price stays a string (N11)."""
    return _parsed(df, S.BINANCE).select(
        F.col("p.symbol").alias("symbol"), F.col("p.price").alias("price")
    )


_BRANCHES = {
    "openaq": normalize_openaq,
    "open_meteo": normalize_open_meteo,
    "coingecko": normalize_coingecko,
    "usgs_quakes": normalize_usgs_quakes,
    "spacex": normalize_spacex,
    "github_events": normalize_github_events,
    "nws_alerts": normalize_nws_alerts,
    "fx_rates": normalize_fx_rates,
    "iss_now": normalize_iss_now,
    "binance": normalize_binance,
}

def empty_result(spark, source: str) -> DataFrame:
    """N1/N12: null payload or unknown source → empty table with the
    branch's EXACT output schema — derived by running the branch over
    an empty payload relation, so it can never drift from the real
    projection (r10 review finding: the former hand-maintained DDL
    table had no parity enforcement; tidy schemas are documented in
    FIXTURES.md §B)."""
    branch = _BRANCHES.get(source)
    if branch is None:
        return spark.createDataFrame([], T.StructType([]))
    return branch(spark.createDataFrame([], "payload string"))


def normalize(df: DataFrame, source: str) -> DataFrame:
    """Dispatch one payload DataFrame (column ``payload`` string) through
    its source branch; unknown source → empty DF (N12)."""
    branch = _BRANCHES.get(source)
    if branch is None:
        return empty_result(df.sparkSession, source)
    return branch(df)
