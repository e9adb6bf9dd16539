"""Declared workload: merged QUERIES/ORACLE registries (driver contract).

Every operator module contributes its declared queries and DuckDB
oracles; ``__spark_entry__.py`` re-exports these. Keys without an oracle
entry get the driver's weaker rows-only check (streaming semantics,
UDF-backed heuristics, fp-tie-sensitive top-k).
"""

from __future__ import annotations

from collections.abc import Callable
from itertools import zip_longest

from pyspark.sql import DataFrame, SparkSession

from real_time_big_data_architect_spark.operators import (
    aggregates,
    behavioral,
    curation,
    dedup,
    graph,
    joins,
    multimodal,
    mutations,
    quality,
    relational,
    scalars,
    semistructured,
    setops,
    similarity,
    sketches,
    text,
    tpch,
    udfs,
    windows,
)
from real_time_big_data_architect_spark.sources import http_poll, lake
from real_time_big_data_architect_spark.streaming import (
    incremental,
    stateful,
    time_windows,
)

# Module registry for the stratified round-robin interleave below.
_MODULES = (
    relational,
    scalars,
    semistructured,
    joins,
    tpch,
    mutations,
    aggregates,
    windows,
    behavioral,
    setops,
    sketches,
    quality,
    graph,
    text,
    curation,
    udfs,
    multimodal,
    lake,
    http_poll,
    time_windows,
    dedup,
    similarity,
    stateful,
    incremental,
)


def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Declared queries, COVERAGE-AWARE order (r9 verdict item 1). The
    driver's external correctness check samples the first ~50 keys of
    this registry, so the order converges the union of EXTERNAL
    certification across rounds as fast as possible:

    1. First: every never-externally-certified query (COVERAGE.json —
       the ledger of every ``hash_match`` the driver has ever recorded,
       regenerated per round by ``tools/coverage.py``), round-robin
       across modules so no single big module monopolizes the sample.
    2. Then: all already-certified queries in LEAST-RECENTLY-certified
       order (r10 verdict item 2, the post-closure policy): ascending by
       the round of each query's most recent driver certification, so
       once all 258 are certified the 50-prefix sample continuously
       re-certifies the stalest queries and every query's external
       certification refreshes on a ~258/50 ≈ 5-round cycle instead of
       freezing at its first pass. This is self-rotating: the ~50
       queries the driver samples this round become the MOST recently
       certified and sink to the back of next round's order.

    The r6/r7 all-module stratification (one lead query per module) was
    retired in r10: with most modules fully certified, reserving a
    prefix slot per module wasted driver sample slots on already-done
    modules. Packing never-certified first makes all 50 slots
    productive while any remain.

    Within the uncertified tier (per module) and within each
    equal-last-round cohort of the certified tier, the order is rotated
    by the round number so repeat picks differ round over round even if
    a driver artifact fails to land. Stable WITHIN a round:
    COVERAGE.json and PROGRESS.jsonl are committed artifacts, so the
    driver's sample and the committed preflight see the same order."""
    rot = _round_number()
    last_cert = _certification_last_round()
    seen: set[str] = set()
    uncert_tiers: list[list[tuple[str, Callable[[SparkSession, str], DataFrame]]]] = []
    certified: list[tuple[str, Callable[[SparkSession, str], DataFrame]]] = []
    for mod in _MODULES:
        overlap = seen & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names from {mod.__name__}: {overlap}")
        seen |= mod.QUERIES.keys()
        unc = [kv for kv in mod.QUERIES.items() if kv[0] not in last_cert]
        certified.extend(kv for kv in mod.QUERIES.items() if kv[0] in last_cert)
        if unc:
            k = rot % len(unc)
            unc = unc[k:] + unc[:k]
        uncert_tiers.append(unc)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for tier in zip_longest(*uncert_tiers):
        for item in tier:
            if item is not None:
                out[item[0]] = item[1]
    # Certified tier: LRU cohorts (same last-certified round), each
    # name-sorted then rotated by the round number.
    cohorts: dict[int, list[tuple[str, Callable[[SparkSession, str], DataFrame]]]] = {}
    for kv in certified:
        cohorts.setdefault(last_cert[kv[0]], []).append(kv)
    for rnd in sorted(cohorts):
        cohort = sorted(cohorts[rnd], key=lambda kv: kv[0])
        k = rot % len(cohort)
        for key, fn in cohort[k:] + cohort[:k]:
            out[key] = fn
    return out


def _certification_last_round() -> dict[str, int]:
    """Per-query MOST RECENT driver-certification round (COVERAGE.json,
    the committed ``{query: [rounds hash-certified]}`` ledger regenerated
    by ``tools/coverage.py`` from every ``CORRECTNESS_r*.json``). Empty
    dict when absent (bare clone) — the order then degrades to the plain
    per-module round-robin of the uncertified tier."""
    import json
    import os

    path = os.path.join(_repo_root(), "COVERAGE.json")
    try:
        ledger = json.load(open(path))
        return {
            q: max(rounds)
            for q, rounds in ledger.items()
            if isinstance(rounds, list) and rounds
        }
    except (OSError, ValueError, TypeError, AttributeError):
        return {}


def _repo_root() -> str:
    import os

    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def _round_number() -> int:
    """Current build round from the driver's PROGRESS.jsonl (0 when
    absent — e.g. a bare clone), used only to rotate the registry's
    per-module lead query round-over-round."""
    import json
    import os

    path = os.path.join(_repo_root(), "PROGRESS.jsonl")
    try:
        last = None
        with open(path) as fh:
            for line in fh:
                if line.strip():
                    last = line
        return int(json.loads(last)["round"]) if last else 0
    except (OSError, ValueError, KeyError, TypeError):
        return 0


def build_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query for ``entry(spark)``: the TPC-H-Q1-shaped hash agg
    (SURVEY §7 M1) — the reference's analytics shape at engine scale."""
    return aggregates.group_agg(spark, sf_dir)
