"""Unit tests: behavioral/timeseries operators (sessionize, funnel,
retention, OHLC) on tiny hand-computed fixtures.

The oracle-differential check certifies these at sf0.01; here the
semantics are pinned on inputs small enough to verify by hand —
session boundaries exactly at the 30-min threshold, strict funnel
ordering (a click *before* the first view must not count), and OHLC
open/close tiebreaks.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from real_time_big_data_architect_spark.operators import behavioral


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=ts,
                user_id=uid,
                event_type=etype,
                value=float(val),
                props="{}",
            )
            for i, (uid, ts, etype, val) in enumerate(rows)
        ]
    )


def test_sessionize_gap_boundary(spark, monkeypatch):
    # user 1: events at 0 and exactly 30min later (gap == threshold, NOT
    # a new session), then 31min after that (new session)
    ev = _events(
        spark,
        [
            (1, _ts(0), "view", 1.0),
            (1, dt.datetime(2024, 1, 1, 0, 30), "view", 2.0),
            (1, dt.datetime(2024, 1, 1, 1, 1), "view", 4.0),
            (2, _ts(5), "view", 8.0),
        ],
    )
    monkeypatch.setattr(
        "real_time_big_data_architect_spark.operators.behavioral.load_table",
        lambda spark, sf_dir, name: ev,
    )
    out = {
        (r.user_id, r.session_seq): (r.n_events, r.session_value)
        for r in behavioral.sessionize(spark, "ignored").collect()
    }
    assert out == {
        (1, 1): (2, 3.0),
        (1, 2): (1, 4.0),
        (2, 1): (1, 8.0),
    }


def test_funnel_requires_strict_order(spark, monkeypatch):
    # user 1 converts in order; user 2 clicks BEFORE its first view
    # (must not count); user 3 views only
    ev = _events(
        spark,
        [
            (1, _ts(0), "view", 0.0),
            (1, _ts(1), "click", 0.0),
            (1, _ts(2), "purchase", 0.0),
            (2, _ts(0), "click", 0.0),
            (2, _ts(1), "view", 0.0),
            (3, _ts(0), "view", 0.0),
        ],
    )
    monkeypatch.setattr(
        "real_time_big_data_architect_spark.operators.behavioral.load_table",
        lambda spark, sf_dir, name: ev,
    )
    out = {
        r.stage: r.users
        for r in behavioral.funnel_steps(spark, "ignored").collect()
    }
    assert out == {
        "1_view": 3,
        "2_click_after_view": 1,
        "3_purchase_after_click": 1,
    }


def test_retention_cohort_offsets(spark, monkeypatch):
    # user 1 first seen week of Mon 2024-01-01, active again 2 weeks on
    ev = _events(
        spark,
        [
            (1, dt.datetime(2024, 1, 3), "view", 0.0),
            (1, dt.datetime(2024, 1, 17), "view", 0.0),
            (2, dt.datetime(2024, 1, 10), "view", 0.0),
        ],
    )
    monkeypatch.setattr(
        "real_time_big_data_architect_spark.operators.behavioral.load_table",
        lambda spark, sf_dir, name: ev,
    )
    rows = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in behavioral.retention_cohorts(spark, "ignored").collect()
    }
    w1 = dt.datetime(2024, 1, 1)
    w2 = dt.datetime(2024, 1, 8)
    assert rows == {(w1, 0): 1, (w1, 2): 1, (w2, 0): 1}


def test_ohlc_open_close_tiebreak(spark, monkeypatch):
    # two events share ts; event_id breaks the tie for open
    ev = _events(
        spark,
        [
            (1, _ts(10), "view", 5.0),   # event_id 0 -> open
            (1, _ts(10), "view", 9.0),   # event_id 1
            (1, _ts(20), "view", 1.0),   # low
            (1, _ts(30), "view", 7.0),   # close
        ],
    )
    monkeypatch.setattr(
        "real_time_big_data_architect_spark.operators.behavioral.load_table",
        lambda spark, sf_dir, name: ev,
    )
    (bar,) = behavioral.ohlc_bars(spark, "ignored").collect()
    assert (bar.open, bar.high, bar.low, bar.close, bar.n_events) == (
        5.0,
        9.0,
        1.0,
        7.0,
        4,
    )


def test_attribution_last_touch_python_replay(spark, sf_small):
    """Channel credit matches a per-user Python scan with the same
    lookback and 'direct' fallback."""
    from collections import defaultdict

    from real_time_big_data_architect_spark.operators import behavioral as B
    from real_time_big_data_architect_spark.tables import load_table

    ev = sorted(
        load_table(spark, sf_small, "events").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    last_touch: dict = {}
    conv = defaultdict(int)
    rev = defaultdict(float)
    for r in ev:
        if r.event_type == "purchase":
            lt = last_touch.get(r.user_id)
            if lt is None or (r.ts - lt[0]).total_seconds() > B.ATTR_WINDOW_S:
                ch = "direct"
            else:
                ch = lt[1]
            conv[ch] += 1
            rev[ch] += r.value or 0.0
        if r.event_type in B.ATTR_CHANNELS:
            last_touch[r.user_id] = (r.ts, r.event_type)
    got = {r.channel: r for r in B.attribution_last_touch(spark, sf_small).collect()}
    assert set(got) == set(conv)
    for ch in conv:
        assert got[ch].n_conversions == conv[ch]
        assert abs(got[ch].revenue - rev[ch]) < 1e-6
    assert len(got) >= 2  # at least one real channel plus plausibly direct


def test_time_to_convert_python_replay(spark, sf_small):
    import statistics

    from real_time_big_data_architect_spark.operators import behavioral as B
    from real_time_big_data_architect_spark.tables import load_table

    ev = sorted(
        load_table(spark, sf_small, "events").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    last_touch: dict = {}
    gaps: dict = {}
    for r in ev:
        if r.event_type == "purchase":
            lt = last_touch.get(r.user_id)
            if lt is not None:
                g = int(r.ts.timestamp()) - int(lt[0].timestamp())
                if g <= B.ATTR_WINDOW_S:
                    gaps.setdefault(lt[1], []).append(g)
        if r.event_type in B.ATTR_CHANNELS:
            last_touch[r.user_id] = (r.ts, r.event_type)
    got = {r.channel: r for r in B.time_to_convert(spark, sf_small).collect()}
    assert set(got) == set(gaps)
    for ch, gs in gaps.items():
        assert got[ch].n_conversions == len(gs)
        assert abs(got[ch].mean_gap_s - sum(gs) / len(gs)) < 1e-9
        med = statistics.quantiles(sorted(gs), n=2, method="inclusive")[0] if len(gs) > 1 else gs[0]
        assert abs(got[ch].median_gap_s - med) < 1e-6


def test_sequence_gaps_recovers_planted_holes(spark, sf_small):
    from real_time_big_data_architect_spark.operators import behavioral as B
    from real_time_big_data_architect_spark.tables import load_table

    ids = sorted(
        r.event_id
        for r in load_table(spark, sf_small, "events").collect()
        if r.event_id % 101 != 0
    )
    expect = [
        (a, b, b - a - 1) for a, b in zip(ids, ids[1:]) if b - a > 1
    ]
    got = sorted(
        (r.gap_after, r.resumes_at, r.n_missing)
        for r in B.sequence_gaps(spark, sf_small).collect()
    )
    assert got == expect and got
