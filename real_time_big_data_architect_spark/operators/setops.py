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

def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two document snapshots with DIFFERENT
    column sets (an old vintage without ``lang``, a new one without
    ``n_chars``) merge by COLUMN NAME with missing columns null-filled
    (``unionByName(allowMissingColumns=True)``) — how a lake unions
    parquet written before and after a schema change without a
    rewrite. Oracle: DuckDB's UNION ALL BY NAME, same null-fill
    semantics.
    """
    d = load_table(spark, sf_dir, "documents")
    old_snap = d.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "source", "n_chars"
    )
    new_snap = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source", "lang"
    )
    return old_snap.unionByName(new_snap, allowMissingColumns=True)


QUERIES = {
    "union_by_name_evolution": union_by_name_evolution,
    "set_union": set_union,
    "set_union_all": set_union_all,
    "set_intersect": set_intersect,
    "set_except": set_except,
}

ORACLE = {
    "union_by_name_evolution": """
        SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 2 = 0
        UNION ALL BY NAME
        SELECT doc_id, source, lang FROM documents WHERE doc_id % 2 = 1
    """,
    "set_union": f"{_BUYERS_SQL} UNION {_SPENDERS_SQL}",
    "set_union_all": f"{_BUYERS_SQL} UNION ALL {_SPENDERS_SQL}",
    "set_intersect": f"{_BUYERS_SQL} INTERSECT {_SPENDERS_SQL}",
    "set_except": f"{_BUYERS_SQL} EXCEPT {_SPENDERS_SQL}",
}
