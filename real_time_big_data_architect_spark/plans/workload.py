"""Declared workload: merged QUERIES/ORACLE registries (driver contract).

Every operator module contributes its declared queries and DuckDB
oracles; ``__spark_entry__.py`` re-exports these. Keys without an oracle
entry get the driver's weaker rows-only check (streaming semantics,
UDF-backed heuristics, fp-tie-sensitive top-k).
"""

from __future__ import annotations

from collections.abc import Callable

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

# Ordered cheapest-and-most-certifiable-first: oracle-able single-scan /
# one-shuffle families, then text/multimodal/batch-window families, then
# the candidate-pair dedup and similarity families, and LAST the true
# streaming queries (each drives a full micro-batch run and most are
# rows-only) — so a time-boxed correctness sweep certifies the maximum
# number of oracle-backed queries before spending seconds per stream.
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
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names from {mod.__name__}: {overlap}")
        out.update(mod.QUERIES)
    return out


def build_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query for ``entry(spark)``: the TPC-H-Q1-shaped hash agg
    (SURVEY §7 M1) — the reference's analytics shape at engine scale."""
    return aggregates.group_agg(spark, sf_dir)
