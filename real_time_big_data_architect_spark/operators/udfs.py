"""User-defined function surface: pandas UDF, grouped-agg UDF, UDTF.

The reference has no UDF machinery (plain Python helpers only,
app.py:67,84,192,230); this module is the north-star's sanctioned
Python escape hatch, Arrow-batched end to end:

- ``udf_scalar`` — a vectorized ``pandas_udf`` scalar. The kernel
  keeps to +,-,*,/ and clamping, so the DuckDB oracle reproduces it
  bit-for-bit (same IEEE-754 operations; no libm calls whose last-ulp
  behavior differs between engines).
- ``weighted_mean_agg`` — a grouped-aggregate ``pandas_udf`` (UDAF).
  Float accumulation order differs between numpy's pairwise sum and
  any SQL engine's sequential sum, so this one is locked by a unit
  test against a tolerance instead of a hash oracle.
- ``sentences_udtf`` — a Python UDTF exploding text into numbered
  sentence rows (arrow-enabled); exercised by the test suite.

Scale: all three run scan-side over Arrow batches — no shuffle is
introduced by the Python stage itself.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from real_time_big_data_architect_spark.tables import load_table

VALUE_LO = 5.0
VALUE_SPAN = 90.0


@pandas_udf(DoubleType())
def _minmax_score(v: pd.Series) -> pd.Series:
    # exact-arithmetic kernel: (v - lo) / span clamped to [0, 1]
    return ((v - VALUE_LO) / VALUE_SPAN).clip(lower=0.0, upper=1.0)


def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: min-max score per event (SURVEY
    §2.5 UDF row). Oracle = the same arithmetic as a SQL expression."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        _minmax_score("value").alias("value_score"),
    )


@pandas_udf(DoubleType())
def _weighted_mean(v: pd.Series, w: pd.Series) -> float:
    total = float(w.sum())
    return float((v * w).sum() / total) if total else 0.0


def weighted_mean_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (UDAF): event-value mean weighted by
    user_id (an arbitrary deterministic weight present in the fixture).
    Not oracle-hashed: numpy's pairwise float summation order differs
    from a SQL engine's sequential fold; semantics locked by unit test.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        _weighted_mean("value", "user_id").alias("weighted_mean_value")
    )


class SentencesUDTF:
    """Python UDTF: text → (sentence_idx, sentence) rows.

    The UDTF shape for row-expanding Python logic when the expansion
    isn't expressible as a generator expression (here it is — the
    point is the API surface; see tests for registration + SQL use).
    """

    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        for i, s in enumerate(t for t in text.split(". ") if t):
            yield doc_id, i, s


#: epoch offset (µs) recentring x so Σx² stays inside DuckDB's HUGEINT
_OLS_X0_US = 1_700_000_000_000_000


def _ols_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group OLS of value against event time, in EXACT arithmetic:
    x = recentred epoch-µs (int), y = value·10⁴ (int — fixture values
    carry ≤4 decimals, so this is lossless); the five moment sums
    accumulate as Python big-ints, and only the final closed-form
    expressions run in double — each one `float(exact int)` (correctly
    rounded) then the identical IEEE op sequence as the oracle SQL, so
    the slope/intercept hash bit-for-bit. The numpy/pandas float path
    could not promise this (pairwise summation order differs)."""
    import math

    x_us = (
        (pdf["ts"] - pd.Timestamp("1970-01-01")) // pd.Timedelta(microseconds=1)
    ).astype("int64")
    n = sx = sy = sxx = sxy = 0
    for xv, v in zip(x_us, pdf["value"]):
        x = int(xv) - _OLS_X0_US
        y = math.floor(v * 10000 + 0.5)  # half-up, mirrored in SQL
        n += 1
        sx += x
        sy += y
        sxx += x * x
        sxy += x * y
    num = float(n * sxy - sx * sy)
    den = float(n * sxx - sx * sx)
    if den == 0.0:  # single row / identical timestamps: fit undefined
        slope = intercept = None
    else:
        slope = num / den
        intercept = (float(sy) - slope * float(sx)) / float(n)
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_rows": [n],
            "slope": [slope],
            "intercept": [intercept],
        }
    )


def grouped_map_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-event-type OLS trend of value
    over time — the UDF shape for per-group model fitting where each
    group needs its whole partition at once (the others here are
    scalar / grouped-agg / UDTF; this completes the pandas-UDF family).
    One shuffle on the group key; each group arrives as one Arrow
    batch. Slope is in value·10⁴ per µs (the exact-arithmetic units —
    see _ols_kernel); fully oracle-checked, unlike weighted_mean_agg,
    because the kernel avoids float accumulation entirely.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    return ev.groupBy("event_type").applyInPandas(
        _ols_kernel,
        schema="event_type string, n_rows long, slope double, intercept double",
    )


QUERIES = {
    "udf_scalar": udf_scalar,
    "weighted_mean_agg": weighted_mean_agg,  # rows-only (float-sum order)
    "grouped_map_ols": grouped_map_ols,
}

ORACLE = {
    "grouped_map_ols": f"""
        WITH b AS (
            SELECT event_type,
                   epoch_us(ts) - {_OLS_X0_US} AS x,
                   CAST(floor(value * 10000 + 0.5) AS BIGINT) AS y4
            FROM events WHERE value IS NOT NULL
        ),
        s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(x) AS sx, SUM(y4) AS sy,
                   SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
                   SUM(CAST(x AS HUGEINT) * CAST(y4 AS HUGEINT)) AS sxy
            FROM b GROUP BY event_type
        )
        SELECT event_type, n AS n_rows,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0) AS slope,
               (CAST(sy AS DOUBLE)
                - (CAST(n * sxy - sx * sy AS DOUBLE)
                   / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0))
                   * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS intercept
        FROM s
    """,
    "udf_scalar": """
        SELECT event_id, event_type,
               -- NULL guard: DuckDB's greatest/least SKIP nulls (a null
               -- input would clamp to 0.0) while the Arrow kernel is
               -- null-in/null-out — make the oracle null-preserving too
               CASE WHEN value IS NULL THEN NULL
                    ELSE least(greatest((value - 5.0) / 90.0, 0.0), 1.0)
               END AS value_score
        FROM events
    """,
}
