"""Behavioral / timeseries analytics — absent from the reference.

The reference renders one snapshot table per poll tick (app.py:274) and
computes no history-aware analytics at all. These are the event-log
staples a real-time architecture is normally built to answer:
gap-based sessionization, funnel conversion, cohort retention, and
OHLC bars. All four are window/groupBy compositions over `events` —
pure built-in expressions, fully oracle-checked.

Scale notes: every query here shuffles on `user_id` or
`(event_type, hour)` — bounded-cardinality keys that partition evenly.
Sessionization and SCD-style windows are one shuffle + one in-stage
sort; the funnel reuses the `user_id` partitioning across all three
stages, so AQE coalesces rather than re-shuffles. No floats are
accumulated: sums run in exact decimal and are cast to double at the
end, so results are bit-stable against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.functions.ranking import (
    range_partitioned_key_lead,
)
from real_time_big_data_architect_spark.tables import fan_out, load_table

#: session gap threshold: a pause longer than this starts a new session
SESSION_GAP_US = 1_800_000_000  # 30 minutes in microseconds


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >30-min pause starts a new session.

    The classic clickstream operator (Timescale/ClickHouse `session`
    idiom): lag the event time per user, flag gaps over the threshold,
    and running-sum the flags into a session sequence number. One
    window shuffle on ``user_id``, then a groupBy on the same key —
    the agg reuses the window's partitioning, so at 100 TB this is a
    single-shuffle pipeline.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = ev.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "session_seq",
        F.sum("is_new")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("int"),
    )
    return flagged.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,4)"))
        .cast("double")
        .alias("session_value"),
    )


def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion: view -> click-after-view ->
    purchase-after-click, counting users who reach each stage in strict
    time order (not merely "did all three").

    Each stage is a groupBy on ``user_id`` joined back on the same key,
    so the per-user partitioning is established once and reused; the
    stage frontiers (one row per qualifying user) shrink monotonically.
    """
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        views.agg(F.count("*").alias("users")).select(
            F.lit("1_view").alias("stage"), "users"
        )
        .unionAll(
            clicks.agg(F.count("*").alias("users")).select(
                F.lit("2_click_after_view").alias("stage"), "users"
            )
        )
        .unionAll(
            purchases.agg(F.count("*").alias("users")).select(
                F.lit("3_purchase_after_click").alias("stage"), "users"
            )
        )
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week,
    counted in each subsequent activity week.

    ``date_trunc('week')`` lands on Monday midnight in both engines
    (timestamps are UTC — no DST drift), so the week offset is an exact
    integer division of the epoch difference. The distinct-users agg
    shuffles on (cohort_week, week_offset) — dozens of cells regardless
    of corpus size; the user-level distinct runs map-side first.
    """
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("activity_week")
    ).distinct()
    joined = activity.join(cohort, "user_id")
    return (
        joined.select(
            "user_id",
            "cohort_week",
            (
                (
                    F.unix_timestamp("activity_week")
                    - F.unix_timestamp("cohort_week")
                )
                / 604_800
            )
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event_type — the candlestick rollup.

    open/close are `min_by`/`max_by` over the unique (ts, event_id)
    key so they are deterministic; high/low are plain min/max. Raw
    double values pass through un-accumulated, so every output cell is
    bit-identical to the oracle. The whole bar is ONE hash aggregate
    on (event_type, hour) — partial map-side combine, no window sort.
    """
    # ts IS NOT NULL on both sides (r10 advice): min_by/max_by over
    # struct(ts, event_id) sorts a NULL ts FIRST, while the oracle's
    # ORDER BY ts, event_id defaults NULLS LAST — a NULL-ts row would
    # silently flip open/close (same class batch_cep_pattern and
    # time_windows fixed in r10; fixtures carry no NULL ts today).
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    ev = ev.withColumn("hour", F.date_trunc("hour", "ts"))
    # open/close via min_by/max_by over the unique (ts, event_id) key:
    # ONE hash aggregate, partial-aggregating map-side — the old
    # full-frame window pass materialized open_v/close_v on every row
    # and forced a per-partition sort before the same groupBy (r10
    # review finding); values are identical because the key is unique.
    key = F.struct("ts", "event_id")
    # high/low canonicalize signed zero (value + 0.0, exact for every
    # other finite double): MIN/MAX over a {-0.0, 0.0} tie returns the
    # FIRST-ARRIVAL representative in both engines (probed r12) — i.e.
    # a partition-order-dependent sign in Spark and an arrival-order
    # sign in DuckDB. Same class/fix as percentile_agg's r12 plant.
    # open/close stay raw: min_by/max_by over the UNIQUE (ts, event_id)
    # key pick a deterministic row, so the stored bit pattern is the
    # answer on both sides.
    v0 = F.col("value") + F.lit(0.0)
    return ev.groupBy("event_type", "hour").agg(
        F.min_by("value", key).alias("open"),
        F.max(v0).alias("high"),
        F.min(v0).alias("low"),
        F.max_by("value", key).alias("close"),
        F.count("*").alias("n_events"),
    )


def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types: shared users and
    Jaccard — the segment-intersection question behind campaign overlap
    and cannibalization dashboards.

    One distinct pass builds the (event_type, user_id) audience
    relation; a self-join on user_id (the natural shuffle key — high
    cardinality, even) counts co-membership per unordered type pair,
    and per-type audience sizes broadcast onto the tiny pair table.
    The corpus is never crossed: the self-join fans out only within a
    user's own type set (≤ |types|² per user). Jaccard is one double
    division over exact bigint counts — bit-stable.
    """
    ev = load_table(spark, sf_dir, "events")
    aud = ev.select("event_type", "user_id").distinct()
    sizes = aud.groupBy("event_type").agg(F.count("*").alias("n"))
    a = aud.alias("a")
    b = aud.alias("b")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = F.broadcast(sizes.withColumnRenamed("event_type", "type_a"))
    sb = F.broadcast(sizes.withColumnRenamed("event_type", "type_b"))
    out = (
        inter.join(sa, "type_a")
        .withColumnRenamed("n", "n_a")
        .join(sb, "type_b")
        .withColumnRenamed("n", "n_b")
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    ).cast("double")
    return out.select(
        "type_a", "type_b", "n_shared", "n_a", "n_b", jac.alias("jaccard")
    )


def batch_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CEP: count strict view→click→purchase triples per user —
    the MATCH_RECOGNIZE shape, solved relationally (the streaming twin
    is ``stream_pattern_cep``).

    Each user's history collapses to an ordered initial string (one
    char per event, first letter of the type — all five types have
    distinct initials), built with sort_array over (ts, event_id)
    structs so the order is deterministic and engine-independent; the
    pattern count is then a per-row regex scan. ONE shuffle on user_id
    and a per-user payload of ~bytes-per-event: at 100 TB this is the
    cheapest exact sequential-pattern plan there is — no self-joins,
    no window chains, and the regex generalizes to any fixed pattern.
    """
    # event-time CEP has no position for a row without event time, and
    # the engines would disagree on one anyway (sort_array sorts NULL
    # structs FIRST, the oracle's ORDER BY ts defaults NULLS LAST) —
    # exclude them on both sides (r10 review finding; latent, the
    # fixtures carry no NULL ts). A NULL event_type has no initial
    # either: excluded on both sides (r11 adversarial finding — an
    # all-NULL-type user otherwise yields seq '' here but NULL in the
    # oracle's null-skipping string_agg)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    seq = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("ts"),
                        F.col("event_id"),
                        F.substring("event_type", 1, 1).alias("ini"),
                    )
                )
            ),
            lambda s: s["ini"],
        ),
        "",
    )
    per_user = ev.groupBy("user_id").agg(seq.alias("seq"))
    return per_user.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        F.size(F.regexp_extract_all("seq", F.lit("vcp"), 0))
        .cast("bigint")
        .alias("n_conversions"),
    )


#: attribution lookback: a purchase credits the most recent qualifying
#: touch within this many seconds, else the 'direct' channel
ATTR_WINDOW_S = 7 * 24 * 3600
ATTR_CHANNELS = ("view", "click", "signup")


def _with_prior_touch(ev: DataFrame) -> DataFrame:
    """Attach each event's most recent PRIOR qualifying touch (type +
    epoch-seconds) via two last-ignorenulls expressions over ONE
    user_id window sort — the shared lookback machinery behind
    attribution_last_touch AND time_to_convert (single source of
    truth: a one-sided edit to the window frame, channel set, or epoch
    granularity cannot de-sync the two reports — r10 review finding).
    """
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*ATTR_CHANNELS)
    return ev.withColumn(
        "prior_type",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(
            w
        ),
    ).withColumn(
        "prior_epoch",
        F.last(
            F.when(is_touch, F.unix_timestamp("ts")), ignorenulls=True
        ).over(w),
    )


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: credit each purchase to the
    user's most recent qualifying touch (view/click/signup) within a
    7-day lookback, else 'direct' — conversions and revenue per channel.

    The prior touch comes from two last_value-ignorenulls expressions
    (type and epoch) over ONE user_id window sort — no self-join, no
    per-purchase scan; the lookback test and channel fallback are plain
    map expressions, and the final per-channel rollup is a 4-row agg.
    One shuffle on user_id + one tiny agg shuffle, same partitioning
    discipline as sessionize/funnel. Revenue accumulates in exact
    decimal.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = _with_prior_touch(ev).filter(
        F.col("event_type") == "purchase"
    )
    channel = F.when(
        F.col("prior_type").isNull()
        | (F.unix_timestamp("ts") - F.col("prior_epoch") > ATTR_WINDOW_S),
        "direct",
    ).otherwise(F.col("prior_type"))
    return (
        purchases.select(
            channel.alias("channel"),
            F.col("value").cast("decimal(18,4)").alias("rev"),
        )
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_conversions"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency-to-conversion distribution per channel: for every
    attributed purchase (same lookback machinery as
    attribution_last_touch), the touch→purchase delay summarized as
    count / mean / median / p90 — the funnel-velocity report.

    Rides the one-window attribution pass, then a per-channel exact
    percentile aggregation over the (tiny) attributed set. Delays are
    integer seconds, so mean/percentiles are cross-engine exact
    (both engines interpolate quantiles at (n−1)·p).
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = (
        _with_prior_touch(ev)
        .withColumn("gap_s", F.unix_timestamp("ts") - F.col("prior_epoch"))
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("prior_type").isNotNull()
            & (F.col("gap_s") <= ATTR_WINDOW_S)
        )
    )
    return purchases.groupBy(F.col("prior_type").alias("channel")).agg(
        F.count("*").alias("n_conversions"),
        (F.sum("gap_s").cast("double") / F.count("*")).alias("mean_gap_s"),
        F.percentile("gap_s", F.lit(0.5)).alias("median_gap_s"),
        F.percentile("gap_s", F.lit(0.9)).alias("p90_gap_s"),
    )


def detect_id_gaps(ids: DataFrame, id_col: str = "event_id") -> DataFrame:
    """The PRODUCTION data-completeness detector: holes in a dense
    producer-assigned id sequence — every jump > 1 is missing data.
    Run this directly on a real ingest stream; it emits each gap's
    bounds and width, and nothing when the sequence is dense.

    The global successor comes from the sketch-bounded two-pass
    key-lead (functions/ranking.py) — per-partition ``lead`` inside a
    keyed window over literal quantile bounds, plus boundary stitching
    via partition minima; deterministic with nothing persisted — NOT
    from ``lead().over(Window.orderBy(id))``, whose single
    unpartitioned window task would serialize the entire id stream at
    100 TB.
    """
    # fan_out BEFORE the two-pass lead: a single-file scan is one task,
    # so both the percentile-bounds pass and the pid case-chain would
    # evaluate serially (~1.3 s each at sf0.1, caught by
    # tools/parallelcheck.py); the id column is a few MB to reshuffle
    return (
        range_partitioned_key_lead(
            fan_out(ids.select(id_col)), id_col, "next_id"
        )
        .filter(F.col("next_id") - F.col(id_col) > 1)
        .select(
            F.col(id_col).alias("gap_after"),
            F.col("next_id").alias("resumes_at"),
            (F.col("next_id") - F.col(id_col) - 1).alias("n_missing"),
        )
    )


def sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared DEMO of :func:`detect_id_gaps`: the fixture's id
    sequence is dense (a real detector run would emit zero rows and
    verify nothing), so this query SIMULATES dropped batches first —
    every 101st id is removed, the oracle removes the same ones, and
    the detector must recover exactly those holes. The simulation
    lives HERE, in the declared fixture-facing query — the detector
    itself (above) takes the stream as-is and is what production ingest
    runs (r10 review: the planting must not be part of the operator, or
    the audit fabricates gaps on real data).
    """
    planted = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 101 != 0
    )
    return detect_id_gaps(planted)


#: fixed RFM scoring thresholds (days / purchase count / value total).
#: Fixed rules, not quantiles: segment membership must be a pure map
#: expression over per-user aggregates — quantile-based scoring would
#: re-introduce a global rank per dimension (see decile_cutpoints for
#: that machinery); production RFM almost always ships fixed bands.
RFM_RECENT_D, RFM_MID_D = 60, 180
RFM_FREQ_HI, RFM_FREQ_MID = 5, 2
RFM_MON_HI, RFM_MON_MID = 20.0, 5.0


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over purchase events — the classic
    behavioral-analytics primitive: per user, Recency (days since last
    purchase, vs the corpus's latest event), Frequency (purchase
    count), Monetary (exact-decimal value total), each scored 1-3 by
    fixed bands, composed into a segment label.

    One filter + per-user aggregate (a single user-keyed shuffle), the
    global anchor timestamp broadcast from a 1-row agg, and scoring as
    pure CASE expressions — no window, no quantile pass. Monetary sums
    in DECIMAL(30,4) so ties and hashes are split-independent.
    """
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("anchor_ts"))
    per = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_purchase_ts"),
            F.count("*").alias("frequency"),
            F.sum(
                F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(30,4)")
            )
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn(
            "recency_days",
            F.datediff(
                F.col("anchor_ts").cast("date"),
                F.col("last_purchase_ts").cast("date"),
            ).cast("int"),
        )
    )
    r = (
        F.when(F.col("recency_days") <= RFM_RECENT_D, 3)
        .when(F.col("recency_days") <= RFM_MID_D, 2)
        .otherwise(1)
    )
    f = (
        F.when(F.col("frequency") >= RFM_FREQ_HI, 3)
        .when(F.col("frequency") >= RFM_FREQ_MID, 2)
        .otherwise(1)
    )
    m = (
        F.when(F.col("monetary") >= RFM_MON_HI, 3)
        .when(F.col("monetary") >= RFM_MON_MID, 2)
        .otherwise(1)
    )
    return per.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        r.alias("r_score"),
        f.alias("f_score"),
        m.alias("m_score"),
        F.concat(
            r.cast("string"), f.cast("string"), m.cast("string")
        ).alias("segment"),
    )


QUERIES = {
    "rfm_segments": rfm_segments,
    "sessionize": sessionize,
    "funnel_steps": funnel_steps,
    "retention_cohorts": retention_cohorts,
    "ohlc_bars": ohlc_bars,
    "audience_overlap": audience_overlap,
    "batch_cep_pattern": batch_cep_pattern,
    "attribution_last_touch": attribution_last_touch,
    "time_to_convert": time_to_convert,
    "sequence_gaps": sequence_gaps,
}

ORACLE = {
    "rfm_segments": f"""
        WITH anchor AS (SELECT MAX(ts) AS anchor_ts FROM events),
        per AS (
            SELECT user_id,
                   MAX(ts) AS last_purchase_ts,
                   CAST(COUNT(*) AS BIGINT) AS frequency,
                   CAST(SUM(CAST(COALESCE(value, 0.0) AS DECIMAL(30,4)))
                        AS DOUBLE) AS monetary
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        ),
        scored AS (
            SELECT p.user_id,
                   CAST(datediff('day', CAST(p.last_purchase_ts AS DATE),
                                 CAST(a.anchor_ts AS DATE)) AS INT)
                       AS recency_days,
                   p.frequency, p.monetary
            FROM per p CROSS JOIN anchor a
        )
        SELECT user_id, recency_days, frequency, monetary,
               r_score, f_score, m_score,
               CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                   || CAST(m_score AS VARCHAR) AS segment
        FROM (
            SELECT *,
                   CASE WHEN recency_days <= {RFM_RECENT_D} THEN 3
                        WHEN recency_days <= {RFM_MID_D} THEN 2
                        ELSE 1 END AS r_score,
                   CASE WHEN frequency >= {RFM_FREQ_HI} THEN 3
                        WHEN frequency >= {RFM_FREQ_MID} THEN 2
                        ELSE 1 END AS f_score,
                   CASE WHEN monetary >= {RFM_MON_HI!r} THEN 3
                        WHEN monetary >= {RFM_MON_MID!r} THEN 2
                        ELSE 1 END AS m_score
            FROM scored
        )
    """,
    "time_to_convert": f"""
        WITH marked AS (
            SELECT user_id, ts, event_id, event_type,
                   LAST_VALUE(CASE WHEN event_type IN
                       ('view', 'click', 'signup')
                       THEN event_type END IGNORE NULLS) OVER w
                       AS prior_type,
                   CAST(floor(epoch(ts)) AS BIGINT)
                     - LAST_VALUE(CASE WHEN event_type IN
                           ('view', 'click', 'signup')
                           THEN CAST(floor(epoch(ts)) AS BIGINT) END
                           IGNORE NULLS) OVER w AS gap_s
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            )
        )
        SELECT prior_type AS channel,
               CAST(COUNT(*) AS BIGINT) AS n_conversions,
               CAST(SUM(gap_s) AS DOUBLE) / COUNT(*) AS mean_gap_s,
               quantile_cont(gap_s, 0.5) AS median_gap_s,
               quantile_cont(gap_s, 0.9) AS p90_gap_s
        FROM marked
        WHERE event_type = 'purchase' AND prior_type IS NOT NULL
          AND gap_s <= {ATTR_WINDOW_S}
        GROUP BY prior_type
    """,
    "sequence_gaps": """
        SELECT event_id AS gap_after,
               next_id AS resumes_at,
               next_id - event_id - 1 AS n_missing
        FROM (
            SELECT event_id, LEAD(event_id) OVER (ORDER BY event_id)
                       AS next_id
            FROM events WHERE event_id % 101 <> 0
        )
        WHERE next_id - event_id > 1
    """,
    "attribution_last_touch": f"""
        WITH marked AS (
            SELECT user_id, ts, event_id, event_type, value,
                   LAST_VALUE(CASE WHEN event_type IN
                       ('view', 'click', 'signup')
                       THEN event_type END IGNORE NULLS) OVER w
                       AS prior_type,
                   LAST_VALUE(CASE WHEN event_type IN
                       ('view', 'click', 'signup')
                       THEN CAST(floor(epoch(ts)) AS BIGINT) END
                       IGNORE NULLS) OVER w AS prior_epoch
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            )
        ),
        attributed AS (
            SELECT CASE WHEN prior_type IS NULL
                          OR CAST(floor(epoch(ts)) AS BIGINT) - prior_epoch
                             > {ATTR_WINDOW_S}
                        THEN 'direct' ELSE prior_type END AS channel,
                   CAST(value AS DECIMAL(18,4)) AS rev
            FROM marked WHERE event_type = 'purchase'
        )
        SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_conversions,
               CAST(SUM(rev) AS DOUBLE) AS revenue
        FROM attributed GROUP BY channel
    """,
    "batch_cep_pattern": """
        WITH seqs AS (
            SELECT user_id,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS seq
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY user_id
        )
        SELECT user_id,
               CAST(length(seq) AS BIGINT) AS n_events,
               CAST(len(regexp_extract_all(seq, 'vcp', 0)) AS BIGINT)
                   AS n_conversions
        FROM seqs
    """,
    "audience_overlap": """
        WITH aud AS (
            SELECT DISTINCT event_type, user_id FROM events
        ),
        sizes AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM aud GROUP BY event_type
        ),
        inter AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM aud a JOIN aud b USING (user_id)
            WHERE a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT i.type_a, i.type_b, i.n_shared,
               sa.n AS n_a, sb.n AS n_b,
               CAST(i.n_shared AS DOUBLE) /
               CAST(sa.n + sb.n - i.n_shared AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.event_type = i.type_a
        JOIN sizes sb ON sb.event_type = i.type_b
    """,
    "sessionize": """
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                             IS NULL
                          OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                             > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT user_id, ts, value,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS INT) AS session_seq
            FROM flagged
        )
        SELECT user_id, session_seq,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE)
                   AS session_value
        FROM numbered
        GROUP BY user_id, session_seq
    """,
    "funnel_steps": """
        WITH views AS (
            SELECT user_id, MIN(ts) AS t_view
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        clicks AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN views v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t_view
            GROUP BY e.user_id
        ),
        purchases AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN clicks c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            GROUP BY e.user_id
        )
        SELECT '1_view' AS stage, COUNT(*) AS users FROM views
        UNION ALL
        SELECT '2_click_after_view', COUNT(*) FROM clicks
        UNION ALL
        SELECT '3_purchase_after_click', COUNT(*) FROM purchases
    """,
    "retention_cohorts": """
        WITH cohort AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP)
                       AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS TIMESTAMP)
                       AS activity_week
            FROM events
        )
        SELECT c.cohort_week,
               CAST((epoch(a.activity_week) - epoch(c.cohort_week))
                    / 604800 AS INT) AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_users
        FROM activity a JOIN cohort c ON a.user_id = c.user_id
        GROUP BY 1, 2
    """,
    "ohlc_bars": """
        WITH framed AS (
            SELECT event_type, date_trunc('hour', ts) AS hour, value,
                   FIRST_VALUE(value) OVER w AS open_v,
                   LAST_VALUE(value) OVER w AS close_v
            FROM events
            WHERE value IS NOT NULL AND ts IS NOT NULL
            WINDOW w AS (
                PARTITION BY event_type, date_trunc('hour', ts)
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING
            )
        )
        SELECT event_type, hour,
               MIN(open_v) AS open,
               MAX(value + 0.0) AS high,
               MIN(value + 0.0) AS low,
               MIN(close_v) AS close,
               COUNT(*) AS n_events
        FROM framed
        GROUP BY event_type, hour
    """,
}
