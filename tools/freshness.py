"""Stale-artifact gate (r11 verdict item 6).

r11's only bookkeeping slips were committed artifacts whose generation
inputs had moved on underneath them: ``COVERAGE.md`` was generated one
driver round before the artifact it should have ingested, and
``BENCH_LOCAL.json`` carried a drift-episode recording superseded in
the same session. This tool re-derives each committed artifact's
expected content from ITS INPUTS AT HEAD and fails loudly on any
mismatch, so the round ritual catches staleness mechanically instead
of by judge review.

Checks (each prints one PASS/FAIL line):

1. coverage   — ``COVERAGE.json``/``COVERAGE.md`` equal a fresh
                recompute from every ``CORRECTNESS_r*.json`` at HEAD
                (the exact staleness r11 shipped).
2. inventory  — ``INVENTORY.md``'s declared-query count equals the
                live registry's.
3. bench      — ``BENCH_LOCAL.json`` covers the current HEADLINE list
                (a bench recorded before a headline edit is stale) and
                carries no taint marker (``contended``/``drifted``) —
                a tainted recording must be re-taken, not committed.
4. bench_full — ``BENCH_full.json`` timed every currently-declared
                query and recorded zero failures.

Usage::

    python tools/freshness.py          # exit 0 iff everything fresh
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _load(name: str):
    with open(os.path.join(ROOT, name)) as fh:
        return json.load(fh)


def check_coverage() -> list[str]:
    from tools.coverage import collect

    cert, _owner, declared = collect()
    fresh = {q: sorted(set(r)) for q, r in sorted(cert.items())}
    errs = []
    try:
        committed = _load("COVERAGE.json")
    except (OSError, ValueError) as exc:
        return [f"COVERAGE.json unreadable: {exc}"]
    if committed != fresh:
        extra = set(committed) - set(fresh)
        missing = set(fresh) - set(committed)
        moved = [
            q
            for q in set(committed) & set(fresh)
            if committed[q] != fresh[q]
        ]
        errs.append(
            "COVERAGE.json != recompute from CORRECTNESS_r*.json at HEAD"
            f" (stale-extra={sorted(extra)[:5]}"
            f" missing={sorted(missing)[:5]} moved={sorted(moved)[:5]})"
        )
    # the human ledger must state the same certified count
    try:
        md = open(os.path.join(ROOT, "COVERAGE.md")).read()
    except OSError as exc:
        return errs + [f"COVERAGE.md unreadable: {exc}"]
    want = (
        f"- Declared queries: **{len(declared)}**\n"
        f"- Externally certified at least once: "
        f"**{len([q for q in declared if q in cert])}**"
    )
    if want not in md:
        errs.append(
            f"COVERAGE.md header does not state '{want.splitlines()[1]}'"
            " — regenerate with tools/coverage.py"
        )
    return errs


def check_inventory() -> list[str]:
    from real_time_big_data_architect_spark.plans import workload

    n = len(workload.build_queries())
    try:
        head = open(os.path.join(ROOT, "INVENTORY.md")).read(400)
    except OSError as exc:
        return [f"INVENTORY.md unreadable: {exc}"]
    if f"{n} queries:" not in head:
        return [
            f"INVENTORY.md does not declare '{n} queries:' —"
            " regenerate with tools/inventory.py"
        ]
    return []


def check_bench_local() -> list[str]:
    import bench

    errs = []
    try:
        rec = _load("BENCH_LOCAL.json")
    except (OSError, ValueError) as exc:
        return [f"BENCH_LOCAL.json unreadable: {exc}"]
    missing = [q for q in bench.HEADLINE if q not in rec.get("queries", {})]
    if missing:
        errs.append(
            f"BENCH_LOCAL.json missing current headline queries {missing[:5]}"
            " — recorded before a headline edit; re-run bench.py"
        )
    for taint in ("contended", "drifted"):
        if rec.get(taint):
            errs.append(
                f"BENCH_LOCAL.json is marked '{taint}' — a tainted"
                " recording must be re-taken on a quiet host, not kept"
            )
    return errs


def check_bench_full() -> list[str]:
    from real_time_big_data_architect_spark.plans import workload

    errs = []
    try:
        rec = _load("BENCH_full.json")
    except (OSError, ValueError) as exc:
        return [f"BENCH_full.json unreadable: {exc}"]
    declared = set(workload.build_queries())
    timed = set(rec.get("queries", {}))
    gap = sorted(declared - timed)
    if gap:
        errs.append(
            f"BENCH_full.json did not time {len(gap)} declared queries"
            f" ({gap[:5]}) — re-run tools/sweep.py"
        )
    if rec.get("n_failures"):
        errs.append(
            f"BENCH_full.json records {rec['n_failures']} failures —"
            " a failing sweep must not be the committed artifact"
        )
    return errs


def main() -> int:
    rc = 0
    for name, fn in (
        ("coverage", check_coverage),
        ("inventory", check_inventory),
        ("bench", check_bench_local),
        ("bench_full", check_bench_full),
    ):
        errs = fn()
        if errs:
            rc = 1
            for e in errs:
                print(f"STALE {name}: {e}")
        else:
            print(f"fresh {name}")
    print("freshness:", "CLEAN" if rc == 0 else "STALE ARTIFACTS FOUND")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
