"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``real_time_big_data_architect_spark``; this
module is a thin adapter (plans/workload.py merges the per-module
QUERIES/ORACLE registries).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_big_data_architect_spark.plans import workload

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return workload.build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-SQL twin per oracle-able query; keys omitted for
    non-SQL-expressible ops (streaming, UDF heuristics, fp top-k)."""
    return workload.build_oracle_sql()
