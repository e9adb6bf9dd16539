"""Numeric aggregation helpers with engine-independent results.

Why this exists: double-precision ``SUM`` is order-dependent, and Spark's
partial-aggregation merge order differs run-to-run and engine-to-engine
(the DuckDB oracle sums in a different order). The driver's correctness
gate hashes values exactly, so money aggregates here accumulate in exact
DECIMAL (order-independent, no rounding error) and cast the final result
back to double — Spark and DuckDB then produce bit-identical doubles.

At 100 TB this costs nothing extra: decimal sum is still a single-pass
partial aggregation (map-side combine) with the same shuffle shape as a
double sum.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: enough integer digits for 100 TB-scale money sums, 4 fractional digits
#: (price has 2 decimals, price*(1-discount) has exact 4-decimal products)
#:
#: Input contract (probed r12, alongside the finite-doubles rule): the
#: per-row magnitude must keep value·10⁴ exactly representable in
#: binary64 (|value| ≲ 9e11 for money-like inputs). Spark's
#: double→decimal cast is exact BigDecimal conversion at any
#: magnitude, but DuckDB's scales through float multiplication —
#: CAST(1e20 AS DECIMAL(30,4)) reads 100000000000000000000.0000 in
#: Spark vs 99999999999999998322.2784 in DuckDB. Money-scale fixture
#: values sit far inside the bound; the SUM itself then has 26 integer
#: digits of exact headroom.
DEC = "decimal(30,4)"


def dec_sum(col: Column | str, alias: str) -> Column:
    """Exact, order-independent sum of a money-like double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def dec_avg(col: Column | str, alias: str) -> Column:
    """Exact-sum average: CAST(SUM(decimal) AS DOUBLE) / COUNT(col).

    Both engines evaluate the same double division on identical operands,
    so the result is bit-identical. (Plain AVG(double) is order-dependent.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def oracle_dec_sum(expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`dec_sum` for oracle SQL strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,4))) AS DOUBLE) AS {alias}"


def oracle_dec_avg(expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`dec_avg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(30,4))) AS DOUBLE) / COUNT({expr}) AS {alias}"
    )
