"""Property-based normalization tests (hypothesis): for randomly shaped
payloads, the declarative from_json pipelines must agree with a direct
Python evaluation of the reference semantics (app.py:115-118, 168-173).
"""

from __future__ import annotations

import json
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import real_time_big_data_architect_spark.sources.normalize as N

_key = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-", min_size=1, max_size=12
)
_price = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(payload=st.dictionaries(_key, st.fixed_dictionaries({"usd": _price}), max_size=8))
@_SETTINGS
def test_coingecko_map_pivot_matches_python(spark, payload):
    df = spark.createDataFrame([(json.dumps(payload),)], "payload string")
    got = sorted((r.asset, r.usd) for r in N.normalize(df, "coingecko").collect())
    want = sorted((k, v["usd"]) for k, v in payload.items())
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_, gv), (_, wv) in zip(got, want):
        assert math.isclose(gv, wv, rel_tol=1e-12)


@given(
    base=_key,
    date=st.dates().map(str),
    rates=st.dictionaries(_key, _price, max_size=8),
)
@_SETTINGS
def test_fx_rates_concat_matches_python(spark, base, date, rates):
    payload = {"base": base, "date": date, "rates": rates}
    df = spark.createDataFrame([(json.dumps(payload),)], "payload string")
    got = sorted((r.pair, r.rate, r.date) for r in N.normalize(df, "fx_rates").collect())
    want = sorted((f"{base}/{k}", v, date) for k, v in rates.items())
    assert [g[0] for g in got] == [w[0] for w in want]
    assert all(g[2] == date for g in got)
    for (_, gv, _), (_, wv, _) in zip(got, want):
        assert math.isclose(gv, wv, rel_tol=1e-12)


@given(
    events=st.lists(
        st.fixed_dictionaries(
            {
                "type": _key,
                "repo": st.fixed_dictionaries({"name": _key}),
                "actor": st.fixed_dictionaries({"login": _key}),
                "created_at": st.datetimes().map(lambda d: d.isoformat()),
            }
        ),
        max_size=40,
    )
)
@_SETTINGS
def test_github_head_slice_matches_python(spark, events):
    df = spark.createDataFrame([(json.dumps(events),)], "payload string")
    got = [tuple(r) for r in N.normalize(df, "github_events").collect()]
    want = [
        (e["type"], e["repo"]["name"], e["actor"]["login"], e["created_at"])
        for e in events[: N.GITHUB_CLIENT_CAP]
    ]
    assert got == want  # order-preserving head slice, exactly raw[:30]
