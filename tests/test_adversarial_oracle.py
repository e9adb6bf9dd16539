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
from tools.preflight import _rows_from_pandas, value_hash

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
    # relational / scalars over the TPC-H-ish tables
    "scan_project",
    "filter_eq",
    "filter_notnull",
    "filter_range",
    "topk_order_limit",
    "lastk_tail",
    "pareto_frontier",
    "ts_format",
    "date_parts",
    "date_arith",
    "string_fns",
    "number_format",
    "math_expr",
    "json_extract",
    "null_fns",
    "regex_fns",
    "date_dim_build",
    "tz_normalize",
    # joins
    "join_inner",
    "join_broadcast",
    "join_left",
    "join_semi",
    "join_anti",
    "join_star",
    "asof_join",
    "asof_nearest",
    "join_null_safe",
    "join_skew_salted",
    "record_linkage",
    # aggregates / windows / setops
    "group_agg",
    "distinct_count",
    "rollup_agg",
    "cube_agg",
    "minmax_agg",
    "mode_agg",
    "string_agg_sorted",
    "argminmax_agg",
    "period_over_period",
    "ratio_to_report",
    "histogram_fixed",
    "window_rank",
    "topk_per_group",
    "set_union",
    "set_except",
    # mutations / sketches
    "merge_upsert",
    "cdc_diff",
    "snapshot_restore",
    "golden_record",
    "zorder_layout",
    "table_checksum",
    "skew_stats",
    "cms_heavy_hitters",
]

#: oracle-backed queries NOT adversarially checked: only the HTTP
#: payload-catalog queries (the two batch snapshots here plus
#: stream_poll_all_tick, which the stream_ filter already skips) —
#: their inputs are fixed captured payload files, so they would
#: "pass" on any adv_dir without reading it: a meaningless green. Everything else runs here, including the lake
#: ops (they rewrite the adversarial events through their scratch
#: layouts) and the IVF/kmeans/centroid family (the embeddings corpus
#: carries 26 vectors across 10 labels — duplicates, zero vectors,
#: negative mirrors — precisely to exercise centroid ties and
#: zero-norm cosines).
_EXCLUDED = {
    "http_poll_usgs_snapshot",
    "http_poll_all_snapshot",
}


#: oracle-backed streaming drains included explicitly (each runs a full
#: availableNow micro-batch query against the adversarial events —
#: slower than batch queries but they exercise the merge/commit paths
#: on NULL-bearing and single-row groups). The four watermark drains
#: additionally exercise the append-emission oracle (end <= final
#: watermark) on hour-gapped, same-ts, DST-straddling event times.
_STREAMING_INCLUDED = [
    "stream_foreachbatch_mv",
    "stream_poll_tick",
    "stream_static_join",
    "stream_stream_join",
    "stream_stream_left_outer",
    "stream_hll_distinct",
    "stream_cdc_apply",
    "stream_tumbling_watermark",
    "stream_sliding_watermark",
    "stream_session_watermark",
    "stream_dedup_watermark",
    "stream_stateful_final",
    # the CEP pair joined in r12: the corpus's NULL-ts row crashed
    # arrival mode (NaT.timestamp()) and stepped the oracle's machine
    # through NULL timeout arithmetic — both now exclude timeless
    # events, and this inclusion pins the contract
    "stream_pattern_cep",
    "stream_pattern_cep_eventtime",
]


def _full_list():
    oracles = workload.build_oracle_sql()
    extra = [
        n
        for n in oracles
        if n not in QUERIES_UNDER_TEST
        and n not in _EXCLUDED
        and not n.startswith("stream_")
    ]
    # registry membership guard: the TWS-backed CEP pair registers only
    # where transformWithStateInPandas is available (their oracles are
    # unconditional, so filter on the queries registry, not on oracles)
    declared = set(workload.build_queries())
    return (
        QUERIES_UNDER_TEST
        + extra
        + [n for n in _STREAMING_INCLUDED if n in declared]
    )


def _ts(h: int, m: int = 0, s: int = 0, us: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, 1, h, m, s, us)


def _flatten(tmp) -> None:
    """Replace each <table>.parquet DIRECTORY (Spark write layout) with
    the single part file inside it, matching the fixtures' flat-file
    layout — the streaming file source globs events*.parquet FILES."""
    import glob as _glob
    import os
    import shutil

    for d in _glob.glob(f"{tmp}/*.parquet"):
        if os.path.isdir(d):
            part = _glob.glob(f"{d}/part-*.parquet")[0]
            shutil.move(part, f"{d}.file")
            shutil.rmtree(d)
            os.replace(f"{d}.file", d)


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
        # user 7: a NULL event-time next to a real one — pins the
        # engine-vs-oracle null-ordering contract (Spark ASC defaults
        # NULLS FIRST, DuckDB NULLS LAST; r11 aligned every ts window
        # to NULLS LAST explicitly) and NULL propagation through
        # date_trunc/unix_micros/gap arithmetic
        (16, _ts(8), 7, "view", 2.0, '{"k": 6}'),
        (17, None, 7, "click", 4.0, '{"k": 6}'),
        # NULL user_id and NULL event_type rows: per-user windows and
        # partitioned aggregations must agree on the NULL partition
        # (COUNT DISTINCT excludes it, GROUP BY keeps it — r10 found
        # window_count_distinct running permanently +1 on exactly this;
        # nothing pinned the class until now), and NULL-key groupBys /
        # string functions must propagate identically
        (18, _ts(9), None, "view", 6.0, '{"k": 2}'),
        (19, _ts(9, 5), None, "click", 8.0, '{"k": 2}'),
        (20, _ts(9, 10), 6, None, 12.0, '{"k": 3}'),
        # r12: a non-NULL type BEFORE user 6's NULL-type row plants the
        # prev='view' -> cur=NULL transition in scd2/lag change
        # detection: both engine and oracle skip it (prev <> cur is
        # NULL; only prev IS NULL opens a version) — a consistent,
        # token-mirrored contract this row pins. Also gives the NULL
        # partition a non-first position in every lag/lead path.
        (30, _ts(9, 0), 6, "view", 1.0, '{"k": 1}'),
    ]
    # user 8: timestamps straddling the US spring-forward DST boundary
    # (2024-03-10 06:59/07:01 UTC = 01:59 EST / 03:01 EDT) and the
    # fall-back boundary — the riskiest inputs for tz conversion
    rows.append((90, dt.datetime(2024, 3, 10, 6, 59), 8, "view", 1.0, '{"k": 1}'))
    rows.append((91, dt.datetime(2024, 3, 10, 7, 1), 8, "click", 1.0, '{"k": 1}'))
    rows.append((92, dt.datetime(2024, 11, 3, 5, 30), 8, "view", 1.0, '{"k": 1}'))
    rows.append((93, dt.datetime(2024, 11, 3, 6, 30), 8, "purchase", 1.0, '{"k": 1}'))
    # NULL event_type on BOTH sides of mv_incremental_refresh's
    # 2024-01-20 cutoff (r11 advisor finding): the incremental merge
    # joins base and delta on event_type, and an equi full-outer never
    # matches NULL keys — with NULL-type groups on both legs a non-null-
    # safe join emits two NULL rows where the full recompute's GROUP BY
    # emits one. Row 20 (2024-03-01) already sits in the delta; row 94
    # plants the base-side NULL-type group that pins the eqNullSafe fix.
    # User 10 is UNIQUE to this row: stream_dedup_watermark's oracle
    # relies on arrival order ≡ (ts, event_id) order per dedup key, and
    # this row arrives last with the corpus-minimal ts — sharing a
    # (user_id, event_type) key with row 20 made the engine (arrival
    # order) and oracle (ts order) pick different survivors.
    rows.append((94, dt.datetime(2024, 1, 5, 12, 0), 10, None, 5.0, '{"k": 4}'))
    # r12 second plant wave (the r11 notes' "NULL props / empty-string
    # keys next"): an EMPTY-STRING event_type (distinct from NULL in
    # GROUP BY, LIKE, concat and CASE paths on both engines) and a NULL
    # props payload (every JSON-extraction path must propagate NULL
    # identically). Unique users 11/12 keep the stream-dedup
    # arrival-order ≡ ts-order fixture contract intact.
    rows.append((95, _ts(11), 11, "", 2.5, '{"k": 7}'))
    rows.append((96, _ts(11, 30), 12, "view", 3.5, None))
    # r12 third plant wave: NEGATIVE ZERO in value (Spark normalizes
    # -0.0 = 0.0 in GROUP BY/join keys; the engines must agree wherever
    # value becomes a key, and -0.0 round-trips DECIMAL cleanly).
    # NaN/±Infinity were probed and REVERTED: the surface's
    # exact-decimal-sum convention (CAST(value AS DECIMAL(30,4)) on
    # both sides — the thing that makes ~50 aggregation oracles
    # order-independent and hash-exact) is defined over FINITE values
    # only; DuckDB refuses NaN->DECIMAL outright. Finite `value` is a
    # documented input precondition (ROUND12_NOTES), matching the
    # testdata generator's contract — not a silently-absorbed case.
    rows.append((160, _ts(12, 30), 15, "view", -0.0, '{"k": 4}'))
    # r12 (continued): a +0.0 row in the SAME (event_type, hour) cell
    # as the -0.0 plant puts BOTH zeros in one MIN/MAX group. Probed:
    # MIN over a {-0.0, 0.0} tie returns the FIRST-ARRIVAL
    # representative in both Spark (partition-order-dependent!) and
    # DuckDB — ohlc_bars' high/low and weighted_median's qualifying
    # min now canonicalize (value + 0.0) on both sides, and this pair
    # keeps that contract tested. Same user 15: arrival order (160,
    # 163) ≡ (ts, event_id) order, so the stream-dedup fixture
    # contract holds.
    rows.append((163, _ts(12, 31), 15, "view", 0.0, '{"k": 2}'))
    # r12 fourth plant wave: a FULLY-TIED pair — same user, same
    # event_type, same timestamp, different event_id/value. Any
    # first/last/lag/min_by path ordering by ts alone (without the
    # event_id tiebreak convention) becomes engine-dependent exactly
    # here; the pair makes the tiebreak a tested contract instead of a
    # convention. User 16 is unique (stream-dedup arrival contract:
    # arrival order 161 then 162 == (ts, event_id) order).
    rows.append((161, _ts(13), 16, "view", 1.0, '{"k": 5}'))
    rows.append((162, _ts(13), 16, "view", 2.0, '{"k": 6}'))
    # r12 fifth plant wave — unicode KEY columns, deep JSON, triple tie:
    # an emoji event_type (hits every GROUP BY/ORDER BY on the key, the
    # funnel's substring(event_type,1,1) initial — substring/length are
    # codepoint-based in BOTH engines, probed) and a multibyte umlaut
    # type (UTF-8 byte order ≡ codepoint order, so binary collations
    # agree); a props payload with nested objects/arrays/null and
    # non-ASCII values (every $.k extraction must ignore the extra
    # structure identically); and a THIRD row in user 16's fully-tied
    # (user, type, ts) cell — the (ts, event_id) tiebreak now resolves
    # a 3-way tie, not just a pair. Users 17/18/19 unique; 167 extends
    # user 16's key in (ts, event_id) ≡ arrival order.
    rows.append((164, _ts(14), 17, "🔥flash", 2.0, '{"k": 1}'))
    rows.append((165, _ts(14, 5), 18, "größe-Ökauf", 3.0, '{"k": 2}'))
    rows.append(
        (166, _ts(14, 10), 19, "view", 4.0,
         '{"k": 2, "nested": {"deep": [1, {"x": "ünïcode"}], "n": null}}')
    )
    rows.append((167, _ts(13), 16, "view", 3.0, '{"k": 7}'))
    # r12 fifth wave (continued): an NFC/NFD pair — visually identical
    # 'café' in composed (U+00E9) and decomposed (e + U+0301) forms.
    # NEITHER engine Unicode-normalizes, so these are TWO distinct
    # groups/keys everywhere (binary UTF-8 comparison on both sides) —
    # the plant pins that no normalization sneaks into either engine.
    # Plus an int64-OVERFLOW JSON number: typed long extraction
    # (from_json / variant_get / MapType) must null-or-drop it
    # identically on both sides, while string-path extraction keeps
    # the full digits and double casts round identically.
    rows.append((168, _ts(15), 20, "caf\u00e9", 1.0, '{"k": 1}'))
    rows.append((169, _ts(15, 5), 21, "café", 2.0, '{"k": 2}'))
    rows.append(
        (170, _ts(15, 10), 22, "view", 5.0, '{"k": 99999999999999999999}')
    )
    # r12 sixth wave: a DENORMAL value (5e-324, the smallest positive
    # double). Exact in every pure-double path on both engines, rounds
    # to 0.0000 through the DECIMAL(30,4) convention on both, and is a
    # distinct GROUP BY key from 0.0 (binary comparison). The LARGE
    # extreme is documented out of contract instead of planted:
    # DuckDB's double->decimal scales through float multiplication and
    # diverges from Spark's exact BigDecimal conversion at 1e20
    # (functions/numeric.py DEC contract, probed).
    rows.append((171, _ts(15, 15), 23, "view", 5e-324, '{"k": 3}'))
    # user 9: HOT key — 60 events in one burst (skew paths: salted agg,
    # session merge, CEP over a long single-user sequence, per-user
    # windows with deep frames)
    for i in range(60):
        rows.append(
            (
                100 + i,
                _ts(10, i % 60, i % 7),
                9,
                ["view", "click", "purchase", "signup", "error"][i % 5],
                float(i % 13) - 6.0,
                '{"k": %d}' % (i % 9),
            )
        )
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    # documents: odd repeated runs, alternation, unicode, minimal text
    docs = [
        (8, "🚀 rocket 🚀 rocket science", "en", "gamma", 26),
        (9, " ".join(["tok"] * 500), "en", "alpha", 1999),
        (0, "a a a a a", "en", "alpha", 9),
        (1, "a a a a", "en", "alpha", 7),
        (2, "x y x y x y x y x y", "en", "beta", 19),
        (3, "héllo wörld héllo wörld", "de", "beta", 23),
        (4, "z", "en", "gamma", 1),
        (5, "a a b b a a b b", "en", "gamma", 15),
        (6, "the quick brown fox the quick brown fox", "en", "alpha", 39),
        (7, "a a a a a a a", "en", "beta", 13),
        # tokenizer edges: double space (empty token), leading/trailing
        # spaces, empty text (splits to ['']), NULL text — every
        # text-over-documents oracle must agree with the engine on the
        # empty-token convention (word <> '') and NULL propagation
        (10, "gap  gap", "en", "alpha", 8),
        (11, " lead trail ", "en", "beta", 12),
        (12, "", "en", "gamma", 0),
        (13, None, "en", "alpha", 0),
        # whitespace-only edges for the blank-doc guard: ASCII tab-only
        # is BLANK (null signature) on both sides; NBSP-only is
        # NON-blank on both sides (the guard trims exactly the 6 ASCII
        # whitespace chars — see dedup._ASCII_WS / _BLANK_GUARD)
        (14, "\t \t", "en", "beta", 3),
        (15, "\xa0", "en", "gamma", 1),
        # r12 second plant wave: NULL lang (per-language groupings keep
        # the NULL partition), empty-string source (distinct from NULL
        # in GROUP BY / caps / stratified sampling), and a doc with
        # BOTH NULL — the metadata-free document every crawl produces
        (16, "hello world hello", None, "alpha", 17),
        (17, "data data data", "en", "", 14),
        (18, "word word", None, None, 9),
        # r12 multimodal review: NULL-text and empty-text docs whose
        # ids are ≡ 2 (mod 3) — i.e. VIDEO rows in build_media_table's
        # modulo typing. The frame-sample kernel emits one 0-byte frame
        # for a payload-less video; the oracle's NULL n walked DuckDB's
        # NULL-ignoring least(1024, NULL-0) to 1024 instead (real
        # divergence, latent because doc 13 — the only NULL-text doc —
        # is an audio row). Ids 20/23 stay off the phash plant lattice
        # (neither ≡ 0 nor ≡ 25 mod 50).
        (20, None, "en", "gamma", 0),
        (23, "", "de", "beta", 0),
        # r12 dedup line review: a NULL-lang NEAR-DUP pair (edit
        # distance 1, same 32-char length bucket as docs 16/18). The
        # engine's groupBy blocks on (NULL, 0) like any other key and
        # pairs these; the oracle's old equi-join blocking dropped
        # NULL-lang rows from the pair space entirely — latent until
        # this plant because docs 16/18 sit > 8 edits apart. Ids 21/22
        # stay off the phash lattice (neither ≡ 0 nor ≡ 25 mod 50).
        (21, "the cat sat on the mat", None, "alpha", 22),
        (22, "the cat sat on the hat", None, "beta", 22),
        # r12 fifth wave: NEGATIVE n_chars — corrupt metadata a real
        # crawl produces. Pins truncate-vs-floor agreement everywhere
        # n_chars is arithmetic input: (n_chars+3) div 4 (Spark div)
        # vs // (DuckDB) both truncate toward zero (probed); the
        # levenshtein len_bucket FLOOR(-7/32) = -1 on both (float
        # division then floor); weighted-sampling p ∝ n_chars goes
        # negative identically. 24 stays off the phash lattice.
        (24, "negative metadata doc", "en", "alpha", -7),
        # r12 seventh wave: unicode KEY columns on documents — CJK lang,
        # emoji/CJK source (every per-lang grouping, per-source cap /
        # stratified md5(source) draw, and contamination matrix key is
        # binary UTF-8 on both engines), a ZERO-WIDTH SPACE inside a
        # token (split(' ') keeps it: 'zw\u200bj' is ONE token whose
        # md5/length both engines read identically), and a flag-emoji
        # lang (two regional-indicator codepoints). Ids 26/27 stay off
        # the phash lattice (25 is ON it — excluded).
        (26, "tok zw\u200bj tok", "\u65e5\u672c\u8a9e", "\u6e90\U0001f525", 14),
        (27, "ascii text here", "\U0001f1e9\U0001f1ea", "emoji-source", 15),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/documents.parquet"
    )
    # embeddings: duplicate vectors (exact score ties), tiny values,
    # zero vectors, negative mirrors — 26 vectors over 10 labels so the
    # centroid family (label_centroids, ivf_assign/topk, kmeans,
    # dedup_embedding_cosine/clusters) runs with its full input
    # contract (>= KMEANS_K seed ids, all 10 label cells populated)
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
    for i in range(6, 26):
        if i % 5 == 0:
            vec = [float(x) for x in base]  # more zero vectors
        elif i % 5 == 1:
            vec = [float(x) for x in v1]  # more exact duplicates
        elif i % 5 == 2:
            # near-duplicate of v1: one extra tiny component
            vec = [float(x) for x in v1]
            vec[(i * 7) % 64] = 1e-3
        elif i % 5 == 3:
            # sign-alternating ramp, scaled by row
            vec = [
                ((-1.0) ** j) * float(j) / (16.0 + i) for j in range(64)
            ]
        else:
            # tiny-magnitude vector (denormal-adjacent dot products)
            vec = [1e-6 * float((i + j) % 7) for j in range(64)]
        embs.append((i, vec, i % 10))
    # NULL embedding and NULL label plants (r11 verdict item 2): a
    # whole-NULL vector must be excluded/propagated IDENTICALLY by the
    # engine and every oracle (the ts/user_id/event_type plants of r11
    # surfaced 11 latent defects this way), and a NULL label exercises
    # the centroid family's NULL-group contract. vec_id 26/27 keep the
    # label cells 0-9 populated from rows 0-25, so the input contracts
    # (>= KMEANS_K seeds, all label cells) still hold.
    embs.append((26, None, 3))
    embs.append((27, [float(x) for x in v1], None))
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/embeddings.parquet"
    )
    # TPC-H-ish tables with edge rows. Dims (nation/region) copy the
    # real fixtures so name-correlated queries stay meaningful.
    for t in ("nation", "region"):
        spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{tmp}/{t}.parquet")
    cust = [
        # key 0, shortest possible name (survivorship substring edges)
        (0, "ab", 0, 0.0, "BUILDING"),
        (1, "Customer#000000001", 1, -999.99, "BUILDING"),
        (2, "Cüstomer#ünïcode", 2, 4242.42, "MACHINERY"),
        (3, "Customer#000000003", 3, 0.01, "AUTOMOBILE"),
        # duplicate name, different key
        (4, "Customer#000000001", 4, 111.11, "HOUSEHOLD"),
        # customer with NO orders
        (5, "Customer#000000005", 0, 55.5, "FURNITURE"),
        (100, "Customer#000000100", 1, 1e7, "BUILDING"),
        # r12 fifth wave: unicode names in the 1:1 case-mapping subset
        # (ĳ→Ĳ, Ł, Ё, emoji — Spark's FULL and DuckDB's SIMPLE case
        # mapping agree on all of these; ß/İ/ligatures are the
        # documented out-of-contract class, see scalars.string_fns).
        # Key 6: corruption position 6%8+2 = 8 is ASCII 'e' amid
        # multibyte neighbors. Key 7: position 7%8+2 = 9 is the
        # MULTIBYTE 'ü' itself — 'x' replaces a 2-byte char, which
        # unfolded scores 1 (Spark codepoints) vs 2 (DuckDB bytes);
        # pins record_linkage's ASCII-folded scoring.
        (6, "ĳsselmeer Łódź Ёж 🚀", 2, 77.7, "BUILDING"),
        (7, "Kundenmaüber#07", 1, 12.34, "MACHINERY"),
    ]
    spark.createDataFrame(
        cust, "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")
    d92 = dt.datetime(1992, 1, 1)
    d95 = dt.datetime(1995, 6, 15)
    d99 = dt.datetime(1999, 12, 31)
    d04 = dt.datetime(2004, 12, 31)  # outside the dq date domain
    orders = [
        # key 0: update-mod branch (0 % 7 == 0), range-edge date
        (0, 0, "O", 100.0, d92, "1-URGENT"),
        (3, 1, "F", 0.0, d95, "5-LOW"),  # delete-mod key (3 % 11 == 3)
        (5, 2, "O", 250.5, d95, "9-BOGUS"),  # invalid priority (dq)
        (7, 3, "P", 1.25, d99, "2-HIGH"),
        (14, 4, "O", 3.5, d95, "3-MEDIUM"),
        (18, 9999, "O", 42.0, d95, "4-NOT SPECIFIED"),  # orphan custkey
        (21, 1, "F", 7.75, d04, "1-URGENT"),
        (22, 1, "O", 7.75, d95, "1-URGENT"),  # same price as key 21
        # NULL price and NULL date: aggregates must skip, predicates
        # must reject, COUNT(col) vs COUNT(*) must diverge identically
        # in both engines
        (25, 2, "O", None, d95, "2-HIGH"),
        (26, 3, "F", 11.0, None, "5-LOW"),
        # r12 formats review: EMPTY-STRING status — the CSV default
        # writes NULL as the empty field and reads the empty field as
        # NULL, so csv_roundtrip would silently conflate '' with NULL
        # against its pass-through oracle; the explicit \N sentinel
        # (to_csv/from_csv options) keeps '' quoted and NULL as \N.
        # Key 27 also walks corrupt_quarantine's %11=5 mutation branch
        # (symmetric engine/oracle).
        (27, 4, "", 9.99, d95, "3-MEDIUM"),
        # r12 seventh wave: 1900-02-28 — the day before the classic
        # NON-leap century boundary (1900 % 100 == 0, % 400 != 0).
        # Pins proleptic-Gregorian agreement through +90-day arith,
        # datediff, ISO week/dow, and stretches the calendar-dim spine
        # to ~36k days (still dimension-sized on both sides).
        (28, 3, "F", 5.0, dt.datetime(1900, 2, 28), "2-HIGH"),
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    li = [
        # (okey, pkey, skey, line, qty, price, disc, tax, rf, ls, ship)
        (0, 0, 0, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", d92),
        (0, 1, 1, 2, 50.0, 0.0, 1.0, 0.08, "R", "F", d95),  # 100% disc
        (3, 0, 0, 1, 2.0, 55.5, 0.05, 0.0, "A", "F", d95),
        (7, 1, 1, 1, 3.0, 10.0, 0.10, 0.02, "N", "O", d99),
        (999, 0, 0, 1, 4.0, 20.0, 0.0, 0.0, "N", "O", d95),  # orphan
        # NULL qty/discount/tax: SUM skips on both sides while
        # COUNT(*) still counts the row; NULL shipdate fails every
        # range predicate in both engines
        (3, 1, 1, 2, None, 30.0, None, None, "A", "F", d95),
        (7, 0, 0, 2, 5.0, 40.0, 0.05, 0.01, "N", "O", None),
    ]
    spark.createDataFrame(
        li, "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
    part = [
        (0, "cold widget", "Brand#13", "ECONOMY", 24, 900.0),
        (1, "tiny widget", "Brand#5", "STANDARD", 1, 0.01),
        # pareto ties: same price, different sizes; same size, diff price
        (2, "dup widget", "Brand#5", "ECONOMY", 24, 900.0),
        (3, "edge widget", "Brand#13", "PROMO", 50, 900.0),
        (4, "cheap widget", "Brand#13", "PROMO", 50, 1.0),
    ]
    spark.createDataFrame(
        part, "p_partkey long, p_name string, p_brand string,"
        " p_type string, p_size int, p_retailprice double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/part.parquet")
    supp = [
        (0, "Supplier#000000000", 0, 100.0),
        (1, "Supplier#000000001", 1, -5.0),
    ]
    spark.createDataFrame(
        supp, "s_suppkey long, s_name string, s_nationkey long,"
        " s_acctbal double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/supplier.parquet")
    _flatten(tmp)
    return str(tmp)


def test_adversarial_rows_only_smoke(spark, adv_dir):
    """Library APIs outside the declared surface (no oracle to diff)
    must still RUN clean on boundary inputs — empty-ish docs,
    single-token texts, zero vectors. multimodal_bundle graduated to
    the oracle differential in r6; pca_project is the per-row library
    twin of the declared pca_certify."""
    from real_time_big_data_architect_spark.operators import similarity

    errors = []
    for fn in (similarity.pca_project,):
        spark.catalog.clearCache()
        try:
            fn(spark, adv_dir).collect()
        except Exception as e:  # noqa: BLE001
            errors.append(f"{fn.__name__}: {type(e).__name__}: {str(e)[:120]}")
    assert not errors, errors


def test_adversarial_oracle_differential(spark, adv_dir):
    qs = workload.build_queries()
    oracles = workload.build_oracle_sql()
    con = duckdb.connect()
    for t in (
        "events", "documents", "embeddings", "orders", "customer",
        "lineitem", "part", "supplier", "nation", "region",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{adv_dir}/{t}.parquet')"
        )
    failures = []
    for name in _full_list():
        spark.catalog.clearCache()
        sdf = qs[name](spark, adv_dir)
        scols = sdf.columns
        # identical fetch path to tools/preflight (and the driver):
        # BOTH result sets travel through pandas, so dtype coercions
        # (nullable BIGINT -> float64) hit both sides symmetrically
        srows = _rows_from_pandas(sdf.toPandas())
        odf = con.execute(oracles[name]).df()
        ocols = list(odf.columns)
        orows = _rows_from_pandas(odf)
        if len(srows) != len(orows):
            failures.append(f"{name}: rows {len(srows)} != {len(orows)}")
            continue
        if value_hash(srows, scols) != value_hash(orows, ocols):
            failures.append(f"{name}: value hash mismatch")
    assert not failures, failures
