"""External-certification coverage ledger (r7 verdict item 1).

Reads every driver-recorded ``CORRECTNESS_r*.json`` in the repo root and
emits:

- ``COVERAGE.json`` — machine-readable ``{query: [rounds hash-certified]}``
  consumed by ``plans/workload.py`` to order the declared registry so the
  driver's 50-query prefix sample certifies never-yet-certified queries
  first (converging the union of external certification fastest).
- ``COVERAGE.md`` — the human ledger the judge reads: one row per declared
  query with its owning module and the rounds in which the DRIVER's
  DuckDB differential hash-certified it.

Run from the repo root::

    python tools/coverage.py

Certification criterion: ``hash_match == true`` in the driver artifact
(every declared query is oracle-backed, so rows-only passes don't count).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def collect() -> tuple[dict[str, list[int]], dict[str, str], list[str]]:
    from real_time_big_data_architect_spark.plans import workload

    owner: dict[str, str] = {}
    declared: list[str] = []
    for mod in workload._MODULES:
        short = mod.__name__.rsplit(".", 1)[-1]
        for q in mod.QUERIES:
            owner[q] = short
            declared.append(q)

    cert: dict[str, list[int]] = defaultdict(list)
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        for q, v in rows.items():
            if isinstance(v, dict) and v.get("hash_match"):
                cert[q].append(rnd)
    return dict(cert), owner, declared


def main() -> None:
    cert, owner, declared = collect()
    json.dump(
        {q: sorted(set(r)) for q, r in sorted(cert.items())},
        open(os.path.join(ROOT, "COVERAGE.json"), "w"),
        indent=1,
    )

    never = [q for q in declared if q not in cert]
    per_mod: dict[str, list[str]] = defaultdict(list)
    for q in declared:
        per_mod[owner[q]].append(q)
    full_mods = sorted(
        m for m, qs in per_mod.items() if all(q in cert for q in qs)
    )

    lines = [
        "# COVERAGE — external (driver) certification ledger",
        "",
        "Union of rounds in which the DRIVER's `CORRECTNESS_r*.json` "
        "hash-certified each declared query (oracle differential at "
        "sf0.01). Regenerate with `python tools/coverage.py` after each "
        "round's artifact lands.",
        "",
        f"- Declared queries: **{len(declared)}**",
        f"- Externally certified at least once: **{len(cert)}**",
        f"- Never externally certified: **{len(never)}** "
        "(self-certified only — green in every committed "
        "`PREFLIGHT_r*.json` 258-query differential)",
        f"- Fully-certified modules: {', '.join(full_mods) or '(none)'}",
        "",
        "The registry order (`plans/workload.py:build_queries`) is "
        "coverage-aware: ALL never-certified queries lead, round-robin "
        "across modules, then the certified ones in LEAST-RECENTLY-"
        "certified order (ascending last-certified round — the r10 "
        "verdict's post-closure policy). Every slot of the driver's "
        "50-prefix sample is a first-time certification candidate while "
        "never-certified queries remain; once all are certified, the "
        "sample continuously re-freshens the stalest certifications on "
        "a ~258/50 ≈ 5-round cycle.",
        "",
        "| query | module | certified in rounds |",
        "|---|---|---|",
    ]
    for q in sorted(declared):
        rounds = ", ".join(f"r{r}" for r in sorted(set(cert.get(q, [])))) or "—"
        lines.append(f"| `{q}` | {owner[q]} | {rounds} |")
    open(os.path.join(ROOT, "COVERAGE.md"), "w").write("\n".join(lines) + "\n")
    print(
        f"COVERAGE: {len(cert)}/{len(declared)} certified, "
        f"{len(never)} never; wrote COVERAGE.json + COVERAGE.md"
    )


if __name__ == "__main__":
    main()
