"""User-defined function surface: pandas UDF, grouped-agg UDF, UDTF.

The reference has no UDF machinery (plain Python helpers only,
app.py:67,84,192,230); this module is the north-star's sanctioned
Python escape hatch, Arrow-batched end to end:

- ``udf_scalar`` — a vectorized ``pandas_udf`` scalar. The kernel
  keeps to +,-,*,/ and clamping, so the DuckDB oracle reproduces it
  bit-for-bit (same IEEE-754 operations; no libm calls whose last-ulp
  behavior differs between engines).
- ``weighted_mean_agg`` — a grouped-aggregate ``pandas_udf`` (UDAF).
  Oracle-hashed since r5: the kernel accumulates value·10⁴ × weight
  products as Python big-ints (order-independent, overflow-proof) and
  performs one double division mirrored token-for-token in SQL.
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


#: fixed-point scale for the UDAF accumulator: value carries <= 4
#: decimal digits in every fixture (verified: round(v*1e4)/1e4 == v for
#: all rows), so the scaled products are exact int64s and the group sum
#: is order-independent INTEGER arithmetic — which is what makes a
#: Python UDAF oracle-hashable at all (a float fold would expose
#: numpy's pairwise-summation order vs SQL's sequential fold)
WMEAN_SCALE = 10_000


@pandas_udf(DoubleType())
def _weighted_mean(v: pd.Series, w: pd.Series) -> float:
    import math

    # Python big-int accumulation (the _ols_kernel discipline): an
    # int64 dot product would wrap SILENTLY once scaled values ×
    # weights × group size clear 2^63 — exactly the kind of at-scale
    # corruption this engine refuses. floor(x + 0.5) = half-UP, the
    # same tie rule the SQL oracle states; null values drop out of the
    # numerator while their weights still count in the denominator
    # (mean over the full weighted population). NULL WEIGHTS drop out
    # of both sums — SQL's SUM(user_id) and SUM(...*user_id) skip the
    # row entirely, and int(NaN) would crash the kernel (r11
    # adversarial finding on a NULL user_id row).
    den = sum(int(x) for x in w.to_numpy() if x == x) * WMEAN_SCALE
    if den == 0:
        return 0.0
    num = 0
    for val, wt in zip(v.to_numpy(), w.to_numpy()):
        if val == val and wt == wt:  # not NaN
            num += math.floor(float(val) * WMEAN_SCALE + 0.5) * int(wt)
    return float(num) / float(den)


def weighted_mean_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (UDAF): event-value mean weighted by
    user_id (an arbitrary deterministic weight present in the fixture).

    Oracle-hashed: the kernel accumulates in 1e-4 fixed point (exact
    int64 products, order-independent), then performs ONE double
    division — token-mirrored in the SQL oracle, so the Python UDAF is
    bit-identical to DuckDB despite crossing the Arrow boundary.
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
    see _ols_kernel); fully oracle-checked because the kernel avoids
    float accumulation entirely (as does weighted_mean_agg since r5).
    """
    # ts IS NOT NULL too (r11 adversarial finding): a NaT reaching the
    # kernel's epoch-µs astype("int64") crashes the whole group, and a
    # timeless point contributes nothing to a time regression anyway —
    # mirrored in the oracle's WHERE
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    return ev.groupBy("event_type").applyInPandas(
        _ols_kernel,
        schema="event_type string, n_rows long, slope double, intercept double",
    )


#: fixed-point scale for the mapInArrow norm kernel (the
#: _scaled_value_sum / stateful-counter discipline)
NORM_FP_SCALE = 10_000_000_000  # 1e10 = 10-decimal fixed point


def _norm_batches(batches):
    """mapInArrow kernel: per-vector squared-norm in exact 1e-10 fixed
    point. Each x² is floored at the 10th decimal HALF-UP
    (floor(x²·1e10 + 0.5) — x² ≥ 0, so this equals both engines' round)
    and summed as int64 — order-independent across any batching, and
    bit-replayable by a DuckDB decimal sum. numpy's pairwise float sums
    (np.sum) would NOT replay; the int sums do.

    Input contract (like the finite-`value` decimal convention): the
    scaled x²·1e10 must stay under 2^53 per component for the float
    floor to be exact (|x| ≲ 30) and the per-vector sum under 2^63 —
    satisfied with huge headroom by unit-scale embeddings."""
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        tbl = pa.Table.from_batches([batch])
        vec_ids = tbl.column("vec_id").to_pylist()
        embs = tbl.column("embedding").to_pylist()
        fp = []
        for e in embs:
            if e is None or any(c is None for c in e):
                # NULL vector OR any NULL component -> NULL out. The
                # element case matters: np.asarray maps None -> NaN and
                # floor(NaN).astype(int64) is UNDEFINED (platform
                # garbage, silently corrupting the norm) — r12 review.
                # Poisoning the whole vector mirrors the engine-wide
                # F.aggregate convention (NULL element -> NULL fold);
                # the oracle replays it with an explicit CASE rather
                # than SUM's null-skip.
                fp.append(None)
                continue
            x = np.asarray(e, dtype=np.float64)
            fp.append(int(
                np.floor(x * x * NORM_FP_SCALE + 0.5).astype(np.int64).sum()
            ))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(vec_ids, pa.int64()),
                pa.array(fp, pa.int64()),
            ],
            names=["vec_id", "norm2_fp"],
        )


def arrow_batch_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norms via ``mapInArrow`` — the lowest-level Python
    crossing Spark offers (raw Arrow RecordBatches, no pandas
    conversion), completing the UDF-surface family (pandas_udf / UDAF /
    UDTF / applyInPandas / mapInPandas / mapInArrow).

    The kernel returns the squared norm in exact 1e-10 FIXED POINT
    (int64), so the result is independent of Arrow batch boundaries
    and partitioning, and the DuckDB oracle replays it with a decimal
    sum over round(x², 10); the final norm is one sqrt on the exact
    quotient — the same double on both sides. Scan-side only: no
    shuffle, embarrassingly parallel at 100 TB.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = emb.mapInArrow(_norm_batches, "vec_id long, norm2_fp long")
    return out.select(
        "vec_id",
        "norm2_fp",
        F.sqrt(
            F.col("norm2_fp").cast("double") / F.lit(float(NORM_FP_SCALE))
        ).alias("l2_norm"),
    )


QUERIES = {
    "arrow_batch_norms": arrow_batch_norms,
    "udf_scalar": udf_scalar,
    "weighted_mean_agg": weighted_mean_agg,
    "grouped_map_ols": grouped_map_ols,
}

ORACLE = {
    "arrow_batch_norms": f"""
        WITH sums AS (
            SELECT vec_id,
                   CAST(SUM(CAST(floor(
                       CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
                           * {NORM_FP_SCALE} + 0.5) AS BIGINT))
                        AS BIGINT) AS s
            FROM (SELECT vec_id, unnest(embedding) AS c FROM embeddings)
            GROUP BY vec_id
        ),
        fp AS (
            -- LEFT JOIN completion: empty arrays fold to 0 (the
            -- kernel's empty int sum), NULL arrays stay NULL, and a
            -- NULL ELEMENT poisons the vector (the kernel's contract;
            -- bare SUM would null-SKIP the element instead)
            SELECT e.vec_id,
                   CASE WHEN e.embedding IS NULL THEN NULL
                        WHEN len(list_filter(e.embedding,
                                             x -> x IS NULL)) > 0
                             THEN NULL
                        ELSE COALESCE(f.s, 0) END AS norm2_fp
            FROM embeddings e LEFT JOIN sums f USING (vec_id)
        )
        SELECT vec_id, norm2_fp,
               sqrt(CAST(norm2_fp AS DOUBLE)
                    / CAST({NORM_FP_SCALE} AS DOUBLE)) AS l2_norm
        FROM fp
    """,
    "weighted_mean_agg": f"""
        SELECT event_type,
               CASE WHEN COALESCE(SUM(user_id), 0) = 0 THEN 0.0
                    ELSE CAST(COALESCE(SUM(CASE WHEN value IS NOT NULL
                              THEN CAST(floor(value * {WMEAN_SCALE} + 0.5)
                                        AS BIGINT) * user_id END), 0)
                              AS DOUBLE)
                         / CAST(SUM(user_id) * {WMEAN_SCALE} AS DOUBLE)
               END AS weighted_mean_value
        FROM events
        GROUP BY event_type
    """,
    "grouped_map_ols": f"""
        WITH b AS (
            SELECT event_type,
                   epoch_us(ts) - {_OLS_X0_US} AS x,
                   CAST(floor(value * 10000 + 0.5) AS BIGINT) AS y4
            FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
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
