"""Per-branch unit tests for the 10 normalize pipelines (N1-N12).

Each test runs a captured sample payload (tests/payloads/, shapes per
the reference's normalize_to_df, app.py:84-189) through the declarative
from_json pipeline and asserts the exact tidy rows.
"""

from __future__ import annotations

import real_time_big_data_architect_spark.sources.normalize as N


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_openaq_double_explode_carries_city(payload_df):  # N2
    out = N.normalize(payload_df("openaq"), "openaq")
    assert out.columns == ["city", "parameter", "value", "unit", "updated"]
    got = rows(out)
    assert got == [
        ("London", "pm25", 12.5, "µg/m³", "2024-05-01T10:00:00Z"),
        ("London", "no2", 31.0, "µg/m³", "2024-05-01T10:00:00Z"),
        ("Berlin", "pm10", 22.75, "µg/m³", "2024-05-01T09:45:00Z"),
    ]


def test_open_meteo_struct_projection(payload_df):  # N3
    out = N.normalize(payload_df("open_meteo"), "open_meteo")
    assert rows(out) == [(17.3, 11.2, "2024-05-01T10:00")]


def test_coingecko_map_to_rows(payload_df):  # N4
    out = N.normalize(payload_df("coingecko"), "coingecko")
    assert sorted(rows(out)) == [
        ("bitcoin", 64250.0),
        ("ethereum", 3100.5),
        ("solana", 145.25),
    ]


def test_usgs_epoch_ms_to_formatted_ts(payload_df):  # N5
    out = N.normalize(payload_df("usgs_quakes"), "usgs_quakes")
    got = rows(out)
    # epoch-ms 1714557600000 == 2024-05-01 10:00:00 UTC (app.py:127 conversion)
    assert got[0] == ("2024-05-01 10:00:00", 4.6, "10km N of Alpha", "earthquake")
    assert got[2][1] is None  # null mag survives normalization (dropped later, A6)


def test_spacex_scalar_projection(payload_df):  # N6
    out = N.normalize(payload_df("spacex"), "spacex")
    assert rows(out) == [("Starlink Group 6-53", "2024-04-30T01:00:00.000Z", True, 321)]


def test_github_head_slice_caps_at_30(payload_df):  # N7: raw[:30], app.py:144
    out = N.normalize(payload_df("github_events"), "github_events")
    got = rows(out)
    assert len(got) == 30  # payload has 35 events
    assert got[0] == ("WatchEvent", "org0/repo0", "user0", "2024-05-01T10:00:00Z")
    assert got[-1] == ("PushEvent", "org4/repo29", "user29", "2024-05-01T10:29:00Z")


def test_nws_alerts_explode_projection(payload_df):  # N8
    out = N.normalize(payload_df("nws_alerts"), "nws_alerts")
    assert rows(out) == [
        ("Flood Warning", "King County, WA", "Severe", "2024-05-01T08:00:00-07:00"),
        ("Wind Advisory", "Multnomah County, OR", "Moderate", "2024-05-01T07:30:00-07:00"),
    ]


def test_fx_rates_concat_carries_base(payload_df):  # N9: f"{base}/{k}", app.py:172
    out = N.normalize(payload_df("fx_rates"), "fx_rates")
    got = sorted(rows(out))
    assert got == [
        ("USD/EUR", 0.93, "2024-05-01"),
        ("USD/GBP", 0.8, "2024-05-01"),
        ("USD/JPY", 157.2, "2024-05-01"),
    ]


def test_iss_now_keeps_strings(payload_df):  # N10: lat/long stay strings
    out = N.normalize(payload_df("iss_now"), "iss_now")
    assert dict(out.dtypes)["latitude"] == "string"
    assert rows(out) == [("47.6062", "-122.3321", 1714557600)]


def test_binance_price_stays_string(payload_df):  # N11
    out = N.normalize(payload_df("binance"), "binance")
    assert dict(out.dtypes)["price"] == "string"
    assert rows(out) == [("BTCUSDT", "64250.10")]


def test_null_payload_yields_empty_with_schema(spark):  # N1
    out = N.empty_result(spark, "coingecko")
    assert out.count() == 0
    assert out.columns == ["asset", "usd"]


def test_unknown_source_yields_empty(spark, payload_df):  # N12
    out = N.normalize(payload_df("binance"), "nonsense_source")
    assert out.count() == 0


def test_malformed_json_yields_null_rows_not_crash(spark):
    """from_json on garbage → null struct → zero exploded rows (C4 posture)."""
    df = spark.createDataFrame([("{not json",)], "payload string")
    out = N.normalize(df, "openaq")
    assert out.count() == 0


def test_partial_payload_missing_fields_yield_nulls(spark):
    """Missing keys in a payload → null columns, never a crash (C4)."""
    df = spark.createDataFrame(
        [('{"iss_position": {"latitude": "10.0"}}',)], "payload string"
    )
    out = N.normalize(df, "iss_now").collect()
    assert out[0].latitude == "10.0"
    assert out[0].longitude is None and out[0].timestamp is None


def test_partial_openaq_missing_measurements(spark):
    """A result with no measurements array contributes zero rows."""
    df = spark.createDataFrame(
        [('{"results": [{"city": "X"}, {"city": "Y", "measurements": '
          '[{"parameter": "pm25", "value": 1.0, "unit": "u", '
          '"lastUpdated": "t"}]}]}',)],
        "payload string",
    )
    got = [tuple(r) for r in N.normalize(df, "openaq").collect()]
    assert got == [("Y", "pm25", 1.0, "u", "t")]


def test_payload_extra_fields_ignored(spark):
    """Unknown payload keys are dropped by the explicit schema."""
    df = spark.createDataFrame(
        [('{"symbol": "BTCUSDT", "price": "1.0", "bogus": 42}',)],
        "payload string",
    )
    got = [tuple(r) for r in N.normalize(df, "binance").collect()]
    assert got == [("BTCUSDT", "1.0")]
