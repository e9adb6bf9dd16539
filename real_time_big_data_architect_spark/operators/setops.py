"""Set operations — absent from the reference (SURVEY §2.5 NS4).

UNION ALL / UNION DISTINCT / INTERSECT / EXCEPT over customer-key sets.

Scale notes: UNION ALL is free (plan concatenation, no shuffle);
the DISTINCT variants shuffle once on the full row — at 100 TB prefer
pre-aggregated inputs or semi/anti joins when only membership matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.tables import load_table


def _buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """custkeys that placed an urgent order."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )


def _big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """custkeys with any order over 300k."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice") > 300000.0)
        .select(F.col("o_custkey").alias("custkey"))
    )


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of the two key sets (NS4)."""
    return _buyers(spark, sf_dir).union(_big_spenders(spark, sf_dir)).distinct()


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — bag semantics, no dedup shuffle (NS4)."""
    return _buyers(spark, sf_dir).unionAll(_big_spenders(spark, sf_dir))


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) (NS4)."""
    return _buyers(spark, sf_dir).intersect(_big_spenders(spark, sf_dir))


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): urgent buyers that are not big spenders (NS4).

    ``subtract`` is Spark's EXCEPT DISTINCT (``exceptAll`` would keep
    leftover duplicate copies — different semantics than SQL EXCEPT).
    """
    return _buyers(spark, sf_dir).subtract(_big_spenders(spark, sf_dir))


_BUYERS_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
_SPENDERS_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000.0"

QUERIES = {
    "set_union": set_union,
    "set_union_all": set_union_all,
    "set_intersect": set_intersect,
    "set_except": set_except,
}

ORACLE = {
    "set_union": f"{_BUYERS_SQL} UNION {_SPENDERS_SQL}",
    "set_union_all": f"{_BUYERS_SQL} UNION ALL {_SPENDERS_SQL}",
    "set_intersect": f"{_BUYERS_SQL} INTERSECT {_SPENDERS_SQL}",
    "set_except": f"{_BUYERS_SQL} EXCEPT {_SPENDERS_SQL}",
}
