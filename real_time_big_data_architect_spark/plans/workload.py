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
    """Declared queries, STRATIFIED round-robin across modules: the
    k-th declared query of every module precedes the (k+1)-th of any
    module, so any prefix sample of the registry (the driver's
    external correctness check takes the first N keys) certifies every
    operator family — relational, TPC-H, streaming, dedup, ANN,
    curation, multimodal — instead of only the cheapest modules (the
    r6 verdict's coverage gap: its sample never got past the
    relational/joins prefix). Within a module the declared order is
    preserved, so each module leads with its most representative
    query."""
    per_mod: list[list[tuple[str, Callable[[SparkSession, str], DataFrame]]]] = []
    seen: set[str] = set()
    rot = _round_number()
    for mod in _MODULES:
        overlap = seen & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names from {mod.__name__}: {overlap}")
        seen |= mod.QUERIES.keys()
        items = list(mod.QUERIES.items())
        # rotate each module's lead query by the round number (the r6
        # verdict's full prescription): the external prefix sample
        # certifies DIFFERENT members of every family each round,
        # converging on whole-surface external coverage over rounds.
        # Stable WITHIN a round (the driver's correctness sample and
        # the committed preflight artifact see the same order).
        k = rot % len(items) if items else 0
        per_mod.append(items[k:] + items[:k])
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for tier in zip_longest(*per_mod):
        for item in tier:
            if item is not None:
                out[item[0]] = item[1]
    return out


def _round_number() -> int:
    """Current build round from the driver's PROGRESS.jsonl (0 when
    absent — e.g. a bare clone), used only to rotate the registry's
    per-module lead query round-over-round."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "PROGRESS.jsonl",
    )
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
