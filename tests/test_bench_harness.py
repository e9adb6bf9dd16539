"""Bench-harness contention machinery (r10 verdict item 3): the
pass-boundary idle-wait must retry under a bounded shared budget and
leave clean passes untouched — pure-logic tests, no Spark session.
"""

from __future__ import annotations

import bench


def test_pass_window_clean_load_consumes_no_budget(monkeypatch):
    monkeypatch.setattr(
        bench.os, "getloadavg", lambda: (bench.PASS_LOADAVG_CEILING - 1, 0, 0)
    )
    monkeypatch.setattr(
        bench.time, "sleep", lambda s: (_ for _ in ()).throw(
            AssertionError("must not sleep under the ceiling")
        ),
    )
    budget = [3]
    la = bench._await_pass_window(budget)
    assert la == bench.PASS_LOADAVG_CEILING - 1
    assert budget == [3]


def test_pass_window_waits_until_quiet_and_spends_one_attempt(monkeypatch):
    readings = iter([9.0, 8.0, 3.0, 3.0])
    last = [9.0]

    def _load():
        try:
            last[0] = next(readings)
        except StopIteration:
            pass
        return (last[0], 0, 0)

    monkeypatch.setattr(bench.os, "getloadavg", _load)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    budget = [3]
    la = bench._await_pass_window(budget)
    assert la <= bench.PASS_LOADAVG_CEILING
    assert budget == [2], "one bounded wait spent, not more"


def test_pass_window_exhausted_budget_proceeds_contended(monkeypatch):
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.9, 0, 0))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    budget = [0]
    la = bench._await_pass_window(budget)
    # no budget: returns immediately with the (contended) reading so
    # the caller records it and the artifact self-declares contended
    assert la == 9.9
    assert budget == [0]


def test_pass_window_persistent_load_bounded(monkeypatch):
    """A machine that never quiets must exhaust the budget in bounded
    time (the monotonic deadline per attempt), not spin forever."""
    clock = [0.0]

    def _mono():
        clock[0] += 30.0
        return clock[0]

    monkeypatch.setattr(bench.time, "monotonic", _mono)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (99.0, 0, 0))
    budget = [3]
    la = bench._await_pass_window(budget)
    assert la == 99.0
    assert budget == [0], "all attempts spent, then proceed"
