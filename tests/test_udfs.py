"""UDF-surface tests: scalar pandas UDF, grouped-agg UDAF, Python UDTF."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from real_time_big_data_architect_spark.operators import udfs
from real_time_big_data_architect_spark.tables import load_table


@pytest.fixture(scope="module")
def sf_small():
    return "/root/testdata/sf0.001"


def test_udf_scalar_matches_builtin_expr(spark, sf_small):
    got = {
        r.event_id: r.value_score
        for r in udfs.udf_scalar(spark, sf_small).collect()
    }
    want = {
        r.event_id: r.score
        for r in load_table(spark, sf_small, "events")
        .select(
            "event_id",
            F.least(
                F.greatest((F.col("value") - 5.0) / 90.0, F.lit(0.0)),
                F.lit(1.0),
            ).alias("score"),
        )
        .collect()
    }
    assert got == want  # bit-exact: same IEEE ops either path
    assert all(0.0 <= v <= 1.0 for v in got.values())


def test_weighted_mean_agg_close_to_sql_fold(spark, sf_small):
    got = {
        r.event_type: r.weighted_mean_value
        for r in udfs.weighted_mean_agg(spark, sf_small).collect()
    }
    want = {
        r.event_type: r.wm
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type")
        .agg(
            (F.sum(F.col("value") * F.col("user_id")) / F.sum("user_id")).alias(
                "wm"
            )
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in got:  # float-order differences only — near-equal
        assert math.isclose(got[k], want[k], rel_tol=1e-9)


def test_sentences_udtf_registers_and_explodes(spark, sf_small):
    sentences = udtf(udfs.SentencesUDTF, returnType="doc_id long, sentence_idx int, sentence string")
    spark.udtf.register("sentences", sentences)
    load_table(spark, sf_small, "documents").createOrReplaceTempView("docs_udtf")
    out = spark.sql(
        """
        SELECT s.doc_id, s.sentence_idx, s.sentence
        FROM docs_udtf, LATERAL sentences(doc_id, text) s
        WHERE docs_udtf.doc_id < 20
        """
    ).collect()
    assert len(out) >= 20  # at least one sentence per doc
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r.sentence_idx)
    for idxs in per_doc.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense numbering
    assert all(r.sentence for r in out)


def test_arrow_batch_norms_null_component_poisons(spark, tmp_path):
    """A NULL embedding COMPONENT must yield a NULL norm in BOTH the
    Arrow kernel and the oracle (r12 review: np.asarray maps None to
    NaN, and floor(NaN).astype(int64) is undefined-behavior garbage —
    the kernel now detects the element and poisons the vector, the
    engine-wide F.aggregate NULL-fold convention; the oracle's bare
    SUM-over-unnest would instead SKIP the element, so it carries an
    explicit CASE)."""
    import duckdb

    from real_time_big_data_architect_spark.plans import workload

    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [
            (0, [1.0, 2.0, 3.0], 0),
            (1, [1.0, None, 3.0], 1),  # NULL component
            (2, None, 2),              # NULL vector
            (3, [], 3),                # empty vector
        ],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    import glob
    import os
    import shutil

    p = f"{d}/embeddings.parquet"
    part = glob.glob(f"{p}/part-*.parquet")[0]
    shutil.move(part, f"{p}.file")
    shutil.rmtree(p)
    os.replace(f"{p}.file", p)

    got = {
        r.vec_id: (r.norm2_fp, r.l2_norm)
        for r in udfs.arrow_batch_norms(spark, d).collect()
    }
    assert got[1] == (None, None)  # poisoned, not garbage
    assert got[2] == (None, None)
    assert got[3] == (0, 0.0)
    assert got[0][0] == 140_000_000_000  # (1+4+9)·1e10 exact

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{d}/embeddings.parquet')"
    )
    want = {
        int(v): (n if n is None else int(n), l)
        for v, n, l in con.execute(
            workload.build_oracle_sql()["arrow_batch_norms"]
        ).fetchall()
    }
    assert want == got
