"""Adversarial oracle differential: the driver's Spark-vs-DuckDB
comparison replayed on HANDCRAFTED boundary data instead of the benign
fixtures — same-timestamp ties, odd-length repeated-token runs (the
double-pass replace edge), alternating patterns, unicode, negative and
null values, duplicate embeddings (score ties).

A hash mismatch here means an operator and its oracle disagree on an
edge the synthetic corpus never exercises; the sf0.01 gate would stay
green while production data diverged.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from real_time_big_data_architect_spark.plans import workload
from tools.preflight import value_hash

#: queries whose inputs the adversarial tables fully cover
QUERIES_UNDER_TEST = [
    "interval_merge",
    "gapfill_interp",
    "batch_cep_pattern",
    "attribution_last_touch",
    "weighted_median",
    "hll_distinct",
    "audience_overlap",
    "phrase_merges",
    "collocations_lift",
    "dedup_url_canonical",
    "sample_weighted",
    "auc_rank",
    "rate_anomaly",
    "inverted_index",
    # windows / behavioral over events
    "sessionize",
    "funnel_steps",
    "retention_cohorts",
    "ohlc_bars",
    "gapfill_locf",
    "ewma_smooth",
    "window_running_sum",
    "window_lag",
    "scd2_history",
    "scd2_lookup",
    "zscore_outliers",
    "anomaly_mad",
    # text / curation over documents
    "text_wordcount",
    "text_stats",
    "token_count",
    "tfidf_top_terms",
    "bm25_score",
    "repetition_ratios",
    "contamination_ngram",
    "bigram_lm_score",
    "dedup_exact",
    "dedup_paragraphs",
    "doc_fingerprint",
    "pii_scrub",
    "train_test_split",
    "doc_chunks",
    "pack_sequences",
    "cap_per_source",
    # embeddings
    "label_centroids",
    "embedding_quantize",
]


def _ts(h: int, m: int = 0, s: int = 0, us: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, 1, h, m, s, us)


@pytest.fixture(scope="module")
def adv_dir(spark, tmp_path_factory) -> str:
    tmp = tmp_path_factory.mktemp("adv")
    # events: same-ts pairs (tiebreak), single-event user, negative /
    # zero / null values, hour gaps (interior interpolation), and a
    # view->click->purchase run with an exact-boundary lookback
    t0 = _ts(0)
    rows = [
        # user 1: two events at the SAME timestamp, then a purchase
        (1, t0, 1, "view", 1.5, '{"k": 3}'),
        (2, t0, 1, "click", -2.0, '{"k": 4}'),
        (3, _ts(0, 10), 1, "purchase", 0.0, '{"k": 5}'),
        # user 2: single event only
        (4, _ts(5), 2, "signup", None, '{"k": 1}'),
        # user 3: vcp twice with same-ts edge inside, hour gaps 1-2
        (5, _ts(0, 1), 3, "view", 10.0, '{"k": 2}'),
        (6, _ts(0, 2), 3, "click", 10.0, '{"k": 2}'),
        (7, _ts(0, 3), 3, "purchase", -10.0, '{"k": 2}'),
        (8, _ts(3, 1), 3, "view", 2.25, '{"k": 9}'),
        (9, _ts(3, 1), 3, "click", 2.25, '{"k": 9}'),
        (10, _ts(3, 2), 3, "purchase", 2.25, '{"k": 9}'),
        # user 4: error noise + a purchase with NO prior touch
        (11, _ts(2), 4, "error", 7.0, '{"k": 0}'),
        (12, _ts(2, 30), 4, "purchase", 3.5, '{"k": 0}'),
        # user 5: interval chain exactly touching (30 min apart)
        (13, _ts(6), 5, "view", 1.0, '{"k": 1}'),
        (14, _ts(6, 30), 5, "view", 1.0, '{"k": 1}'),
        (15, _ts(7, 0, 0, 1), 5, "view", 1.0, '{"k": 1}'),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    # documents: odd repeated runs, alternation, unicode, minimal text
    docs = [
        (0, "a a a a a", "en", "alpha", 9),
        (1, "a a a a", "en", "alpha", 7),
        (2, "x y x y x y x y x y", "en", "beta", 19),
        (3, "héllo wörld héllo wörld", "de", "beta", 23),
        (4, "z", "en", "gamma", 1),
        (5, "a a b b a a b b", "en", "gamma", 15),
        (6, "the quick brown fox the quick brown fox", "en", "alpha", 39),
        (7, "a a a a a a a", "en", "beta", 13),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/documents.parquet"
    )
    # embeddings: duplicate vectors (exact score ties), tiny values
    base = [0.0] * 64
    v1 = list(base)
    v1[0] = 1.0
    v2 = list(base)
    v2[1] = -1.0
    embs = [
        (0, [float(x) for x in v1], 0),
        (1, [float(x) for x in v1], 1),  # duplicate of 0, other label
        (2, [float(x) for x in v2], 2),
        (3, [float(x) for x in base], 3),  # zero vector
        (4, [float(i) / 64.0 for i in range(64)], 4),
        (5, [float(-i) / 64.0 for i in range(64)], 5),
    ]
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/embeddings.parquet"
    )
    return str(tmp)


def test_adversarial_oracle_differential(spark, adv_dir):
    qs = workload.build_queries()
    oracles = workload.build_oracle_sql()
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{adv_dir}/{t}.parquet/*.parquet')"
        )
    failures = []
    for name in QUERIES_UNDER_TEST:
        spark.catalog.clearCache()
        sdf = qs[name](spark, adv_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        odf = con.execute(oracles[name]).df()
        ocols = list(odf.columns)
        def _nan_to_none(v):
            try:
                if v != v:  # scalar NaN only; arrays raise TypeError
                    return None
            except (TypeError, ValueError):
                pass
            return v

        orows = [
            tuple(_nan_to_none(v) for v in row)
            for row in odf.itertuples(index=False, name=None)
        ]
        from tools.preflight import _from_pandas

        orows = [tuple(_from_pandas(v) for v in row) for row in orows]
        srows = [tuple(_from_pandas(v) for v in row) for row in srows]
        if len(srows) != len(orows):
            failures.append(f"{name}: rows {len(srows)} != {len(orows)}")
            continue
        if value_hash(srows, scols) != value_hash(orows, ocols):
            failures.append(f"{name}: value hash mismatch")
    assert not failures, failures
