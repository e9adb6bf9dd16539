"""Round-5 guards: driver-canonicalizable results everywhere.

The r4 driver went red on ``array_hof`` / ``array_set_ops`` not because
the answers were wrong but because the driver canonicalizes result
frames with ``pandas.DataFrame.sort_values`` over all columns, which
raises ``TypeError: unhashable type`` on list cells. These tests pin
the two repairs:

1. an engine-wide invariant — NO oracle-backed query may return an
   array/map/struct column (reshaped queries return scalar columns or
   canonical joined strings instead);
2. the preflight mirror now canonicalizes through the driver's actual
   frame-level ``sort_values`` path, proven red on a deliberate
   list-typed fixture (the r4 blind spot: preflight's string-row
   canonicalizer silently survived list cells).

Plus element-semantics replays for the reshaped queries, so the
serialization change is proven value-preserving.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

import __spark_entry__ as entrymod
from real_time_big_data_architect_spark.operators import (
    multimodal,
    semistructured,
    similarity,
)
from real_time_big_data_architect_spark.tables import load_table

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)
from preflight import _driver_canon_check  # noqa: E402


def test_no_complex_typed_results_on_oracle_backed_queries(spark, sf_small):
    """Driver-hashability invariant over the whole oracle surface.

    Every oracle-backed query's result schema must be free of
    array/map/struct columns — any such column crashes the driver's
    pandas lexsort before values are even compared (the only red ink
    in CORRECTNESS_r04). Note: fn() CONSTRUCTION executes the
    declared-materialized queries (streaming drains, roundtrip
    writes) at sf0.001 — the cost of checking the invariant over the
    real registry rather than a hand-maintained schema list.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    offenders = {}
    for name, fn in queries.items():
        if name not in oracles:
            continue
        df = fn(spark, sf_small)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            offenders[name] = complex_cols
    assert offenders == {}, (
        f"oracle-backed queries with driver-unhashable columns: {offenders}"
    )


def test_driver_canon_check_rejects_list_cells():
    """The preflight gate must go red on exactly the frame shape that
    crashed the r4 driver — a column of Python lists."""
    bad = pd.DataFrame({"k": [1, 2], "arr": [[1.0, 2.0], [3.0]]})
    err = _driver_canon_check(bad)
    assert err is not None and "TypeError" in err

    ok = pd.DataFrame({"k": [2, 1], "v": ["b", "a"]})
    assert _driver_canon_check(ok) is None

    empty = pd.DataFrame()
    assert _driver_canon_check(empty) is None


def test_array_hof_topk_scalars_match_replay(spark, sf_small):
    """top1/2/3_abs scalar columns carry the same values the old
    array<double> column did: the 3 largest |x| in descending order."""
    rows = semistructured.array_hof(spark, sf_small).collect()
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_small, "embeddings").collect()
    }
    assert len(rows) == len(vecs)
    for r in rows:
        vec = vecs[r.vec_id]
        want = sorted((abs(x) for x in vec), reverse=True)[:3]
        got = [r.top1_abs, r.top2_abs, r.top3_abs][: len(want)]
        assert got == want
        assert r.n_pos == sum(1 for x in vec if x > 0)


def test_array_set_ops_strings_split_back_to_sets(spark, sf_small):
    """The '|'-joined strings decode to exactly the set-algebra results
    a Python replay computes from the raw text."""
    rows = semistructured.array_set_ops(spark, sf_small).collect()
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_small, "documents").collect()
    }
    assert len(rows) == len(texts)
    for r in rows:
        ws = texts[r.doc_id].split(" ")
        h = len(ws) // 2
        a, b = set(ws[:h]), set(ws[h:])
        split = lambda s: set(s.split("|")) if s else set()  # noqa: E731
        assert split(r.vocab_union) == a | b
        assert split(r.vocab_both) == a & b
        assert split(r.vocab_first_only) == a - b
        assert r.n_shared == len(a & b)
        # and the string is canonically sorted, so it is hash-stable
        assert r.vocab_union == "|".join(sorted(a | b))


def test_embedding_quantize_codes_split_back_to_ints(spark, sf_small):
    """q_codes decodes to round-half-away(x*127/max|x|) per element."""
    rows = similarity.embedding_quantize(spark, sf_small).collect()
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_small, "embeddings").collect()
    }
    checked = 0
    for r in rows:
        if not r.q_codes:
            continue
        codes = [int(c) for c in r.q_codes.split(",")]
        vec = vecs[r.vec_id]
        assert len(codes) == len(vec)
        if r.max_abs and r.max_abs > 0:
            import decimal

            for q, x in zip(codes, vec):
                # Spark's round(double) goes through the JVM's
                # BigDecimal.valueOf = shortest-decimal-repr of the
                # IEEE quotient, then HALF_UP — Python's repr() is the
                # same shortest repr, so this replay is bit-faithful
                v = x * 127.0 / r.max_abs
                want = int(
                    decimal.Decimal(repr(v)).to_integral_value(
                        rounding=decimal.ROUND_HALF_UP
                    )
                )
                assert q == want
                checked += 1
    assert checked > 0


def test_multimodal_features_scalar_columns_replay(spark, sf_small):
    """f0..f7 equal the byte-histogram shares of the payload."""
    import numpy as np

    media = {
        r.doc_id: bytes(r.payload)
        for r in multimodal.build_media_table(spark, sf_small).collect()
    }
    rows = multimodal.multimodal_features(spark, sf_small).collect()
    assert len(rows) == len(media)
    for r in rows[:50]:
        arr = np.frombuffer(media[r.doc_id], dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=8, range=(0, 256))
        total = max(int(hist.sum()), 1)
        want = (hist / total).tolist()
        got = [getattr(r, f"f{k}") for k in range(8)]
        assert got == want
