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
