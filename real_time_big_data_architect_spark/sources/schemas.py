"""Explicit ``StructType`` payload schemas for the 10 sources.

The reference's only schema system is the hard-coded column list each
``normalize_to_df`` branch emits (app.py:84-189, SURVEY §1.2); here each
payload shape is a real Spark schema consumed by ``from_json`` — no
inference anywhere.
"""

from __future__ import annotations

from pyspark.sql import types as T

_S = T.StringType()
_D = T.DoubleType()
_L = T.LongType()

#: openaq: {results: [{city, measurements: [{parameter, value, unit, lastUpdated}]}]}
OPENAQ = T.StructType(
    [
        T.StructField(
            "results",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("city", _S),
                        T.StructField(
                            "measurements",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("parameter", _S),
                                        T.StructField("value", _D),
                                        T.StructField("unit", _S),
                                        T.StructField("lastUpdated", _S),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

#: open_meteo: {current: {temperature_2m, wind_speed_10m, time}}
OPEN_METEO = T.StructType(
    [
        T.StructField(
            "current",
            T.StructType(
                [
                    T.StructField("temperature_2m", _D),
                    T.StructField("wind_speed_10m", _D),
                    T.StructField("time", _S),
                ]
            ),
        )
    ]
)

#: coingecko: {<asset>: {usd: …}} — dynamic keys ⇒ MapType
COINGECKO = T.MapType(_S, T.StructType([T.StructField("usd", _D)]))

#: usgs_quakes: {features: [{properties: {time epoch-ms, mag, place, type}}]}
USGS_QUAKES = T.StructType(
    [
        T.StructField(
            "features",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "properties",
                            T.StructType(
                                [
                                    T.StructField("time", _L),
                                    T.StructField("mag", _D),
                                    T.StructField("place", _S),
                                    T.StructField("type", _S),
                                ]
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)

#: spacex: flat launch record
SPACEX = T.StructType(
    [
        T.StructField("name", _S),
        T.StructField("date_utc", _S),
        T.StructField("success", T.BooleanType()),
        T.StructField("flight_number", _L),
    ]
)

#: github_events: top-level array of event objects
GITHUB_EVENTS = T.ArrayType(
    T.StructType(
        [
            T.StructField("type", _S),
            T.StructField("repo", T.StructType([T.StructField("name", _S)])),
            T.StructField("actor", T.StructType([T.StructField("login", _S)])),
            T.StructField("created_at", _S),
        ]
    )
)

#: nws_alerts: {features: [{properties: {event, areaDesc, severity, sent}}]}
NWS_ALERTS = T.StructType(
    [
        T.StructField(
            "features",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "properties",
                            T.StructType(
                                [
                                    T.StructField("event", _S),
                                    T.StructField("areaDesc", _S),
                                    T.StructField("severity", _S),
                                    T.StructField("sent", _S),
                                ]
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)

#: fx_rates: {base, date, rates: {<ccy>: rate}} — map + scalars
FX_RATES = T.StructType(
    [
        T.StructField("base", _S),
        T.StructField("date", _S),
        T.StructField("rates", T.MapType(_S, _D)),
    ]
)

#: iss_now: {iss_position: {latitude: "str", longitude: "str"}, timestamp epoch-s}
ISS_NOW = T.StructType(
    [
        T.StructField(
            "iss_position",
            T.StructType(
                [T.StructField("latitude", _S), T.StructField("longitude", _S)]
            ),
        ),
        T.StructField("timestamp", _L),
    ]
)

#: binance: {symbol, price: "str"} — string-encoded numeric kept as string
BINANCE = T.StructType(
    [T.StructField("symbol", _S), T.StructField("price", _S)]
)

PAYLOAD_SCHEMAS = {
    "openaq": OPENAQ,
    "open_meteo": OPEN_METEO,
    "coingecko": COINGECKO,
    "usgs_quakes": USGS_QUAKES,
    "spacex": SPACEX,
    "github_events": GITHUB_EVENTS,
    "nws_alerts": NWS_ALERTS,
    "fx_rates": FX_RATES,
    "iss_now": ISS_NOW,
    "binance": BINANCE,
}
