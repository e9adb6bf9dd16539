"""Window functions — absent from the reference (SURVEY §2.5 NS3).

rank / row_number, running aggregates, lag/lead, top-k per group.

Scale notes: a window = one shuffle on partitionBy + per-partition sort.
Every ORDER BY below carries a unique tiebreak column so results are
deterministic (and hash-stable vs the oracle). Running sums accumulate
in exact decimal: a running frame is evaluated strictly in frame order
by both engines, but the decimal path removes any fp drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from real_time_big_data_architect_spark.tables import load_table


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number + rank per customer over order price (NS3)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
    )


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running sum over event time (NS3)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(30,4)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + inter-event gap per user (NS3)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    return ev.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (
            F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
        ).alias("gap_seconds"),
    )


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the canonical window top-k (NS3).

    At 100 TB the window shuffle is unavoidable, but the rn<=k filter
    runs inside the same stage — nothing beyond the top-k rows leaves
    the sort.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour sum per user — an interval RANGE frame (NS3).

    The timeseries staple ("rolling 1h spend"). The frame is expressed
    over ``unix_micros(ts)`` so the range bound is an exact integer in
    both engines (Spark range frames need a numeric ORDER BY; DuckDB
    mirrors with ``epoch_us``). All rows with equal ts are frame peers
    in both engines. Decimal accumulation keeps the sum hash-stable.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)  # 1 hour in microseconds
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(30,4)"))
        .over(w)
        .cast("double")
        .alias("trailing_1h_value"),
    )


def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions per event_type (NS3): quartile
    bucket (ntile), percent_rank, cume_dist, and the partition's first
    value — the analytics staples beyond rank/row_number.

    The ORDER BY carries the unique event_id tiebreak, so every row is
    its own peer group and all four functions are deterministic and
    oracle-exact.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_first(), F.col("event_id")
    )
    return ev.select(
        "event_type",
        "event_id",
        "value",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("event_id").over(w).alias("first_event_id"),
    )


def _hourly_spine_filled(ev: DataFrame, with_counts: bool) -> DataFrame:
    """Per-type hourly aggregate LEFT-joined onto its dense hour spine
    (``sequence(min_hour, max_hour, 1 hour)`` exploded off a 5-row
    bounds table) — the shared skeleton behind gapfill_locf AND
    gapfill_interp (single source of truth for spine granularity and
    decimal width — r10 review finding). The spine is dimension-sized
    (groups × hours), never corpus-sized."""
    aggs = [
        F.sum(F.col("value").cast("decimal(30,4)"))
        .cast("double")
        .alias("sum_value")
    ]
    if with_counts:
        aggs.insert(0, F.count("*").alias("n"))
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(*aggs)
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias(
            "hour"
        ),
    )
    return spine.join(hourly, ["event_type", "hour"], "left")


def gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timeseries gap-fill + LOCF — the hypertable interpolation pair.

    Hourly sums per event_type have empty hours; a per-type time spine
    (``sequence(min_hour, max_hour, 1 hour)``) reinstates them with
    n_events = 0, and last-observation-carried-forward fills the value
    from the most recent non-empty hour. Spine generation is a per-group
    explode off a 5-row bounds table — at 100 TB the spine is dimension-
    sized (groups × hours), never corpus-sized, and the LOCF window
    shuffles once on the group key.
    """
    ev = load_table(spark, sf_dir, "events")
    filled = _hourly_spine_filled(ev, with_counts=True)
    w = W.partitionBy("event_type").orderBy("hour")
    return filled.select(
        "event_type",
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.last("sum_value", ignorenulls=True).over(w).alias("locf_value"),
    )


#: EWMA smoothing factor and truncation depth. Weights beyond 8 lags
#: contribute < 0.3·0.7⁸ ≈ 1.7% and are cut — which turns the
#: recursive EWMA into a fixed closed-form expression both engines
#: evaluate identically (a true recursion isn't expressible without
#: recursive CTEs and wouldn't be cross-engine bit-stable anyway).
EWMA_ALPHA = 0.3
EWMA_LAGS = 8
_EWMA_W = [EWMA_ALPHA * (1.0 - EWMA_ALPHA) ** i for i in range(EWMA_LAGS)]


def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user — the time-series
    smoothing primitive (NS3), as a truncated closed form.

    ewma_t = Σᵢ wᵢ·v_{t-i} / Σᵢ wᵢ·[v_{t-i} exists], wᵢ = α(1-α)ⁱ —
    renormalized over the lags actually present so early rows aren't
    biased low. One shuffle on user_id + one in-partition sort serves
    all 8 lag expressions (a single Window operator). Bit-exact vs the
    oracle: the weights are emitted as Python-repr double literals and
    the ±/× tree is generated left-associative from the same loop on
    both sides, so every fp op is IEEE-identical.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = W.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    num = F.lit(_EWMA_W[0]) * F.col("value")
    den = F.lit(_EWMA_W[0])
    for i in range(1, EWMA_LAGS):
        lg = F.lag("value", i).over(w)
        num = num + F.when(
            lg.isNotNull(), F.lit(_EWMA_W[i]) * lg
        ).otherwise(F.lit(0.0))
        den = den + F.when(
            lg.isNotNull(), F.lit(_EWMA_W[i])
        ).otherwise(F.lit(0.0))
    return ev.select(
        "user_id", "event_id", "ts", "value", (num / den).alias("ewma")
    )


def _ewma_oracle() -> str:
    num = [f"CAST({_EWMA_W[0]!r} AS DOUBLE) * value"]
    den = [f"CAST({_EWMA_W[0]!r} AS DOUBLE)"]
    for i in range(1, EWMA_LAGS):
        lg = f"LAG(value, {i}) OVER w"
        wt = f"CAST({_EWMA_W[i]!r} AS DOUBLE)"
        num.append(
            f"CASE WHEN {lg} IS NOT NULL THEN {wt} * {lg} ELSE 0.0 END"
        )
        den.append(f"CASE WHEN {lg} IS NOT NULL THEN {wt} ELSE 0.0 END")
    return f"""
        SELECT user_id, event_id, ts, value,
               ({' + '.join(num)}) / ({' + '.join(den)}) AS ewma
        FROM events WHERE value IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


#: interval half-width for interval_merge: each event claims
#: [ts, ts + 30 min); touching-or-overlapping claims coalesce.
MERGE_GAP_MINUTES = 30


def interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-user time intervals (gaps-and-islands).

    Each event claims [ts, ts + 30 min); overlapping claims per user
    coalesce into islands — the availability-window / downtime-merge
    primitive the reference's per-row pandas view can't express at all.
    Classic two-window island numbering: a row starts a new island iff
    its start exceeds the running max of all previous ends; the running
    sum of that flag is the island id. Both windows share one
    partitionBy(user_id) sort, so the whole operator is ONE shuffle +
    one in-partition sort + a groupBy on the same key (no second
    exchange: the island key is user_id-prefixed). Timestamps and
    integer counts only — bit-exact vs the oracle.
    """
    # ts IS NOT NULL on both sides (r11 adversarial finding): a NULL
    # ts claims no interval — and the engines would otherwise disagree
    # on where the NULL island lands (Spark sorts it first as its own
    # island, DuckDB sorts it last and absorbs it into the final one)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr(f"interval {MERGE_GAP_MINUTES} minutes")).alias(
            "stop"
        ),
    )
    w = W.partitionBy("user_id").orderBy("start", "event_id")
    prev_max = F.max("stop").over(w.rowsBetween(W.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "ni",
        F.when(prev_max.isNull() | (F.col("start") > prev_max), 1).otherwise(0),
    )
    isl = flagged.withColumn(
        "island",
        F.sum("ni").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return isl.groupBy("user_id", "island").agg(
        F.min("start").alias("island_start"),
        F.max("stop").alias("island_end"),
        F.count("*").alias("n_events"),
    )


def gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timeseries gap-fill with LINEAR interpolation — the companion to
    gapfill_locf for numeric series where carry-forward biases flat.

    Same spine as gapfill_locf (dimension-sized, never corpus-sized);
    empty hours get prev + (next - prev) * elapsed/gap over the nearest
    non-empty neighbors, edges clamp to the one existing side. The
    bracketing values come from two frames over ONE partitionBy sort
    (preceding-last / following-first with ignorenulls), so the fill
    costs a single shuffle on event_type. The fraction arithmetic is
    the same double expression tree on both engines (hour-granular
    epochs are integral, so unix_timestamp vs fractional epoch() agree
    exactly).
    """
    ev = load_table(spark, sf_dir, "events")
    filled = _hourly_spine_filled(ev, with_counts=False)
    base = W.partitionBy("event_type").orderBy("hour")
    wp = base.rowsBetween(W.unboundedPreceding, 0)
    wn = base.rowsBetween(0, W.unboundedFollowing)
    obs_hour = F.when(F.col("sum_value").isNotNull(), F.col("hour"))
    prev_v = F.last("sum_value", ignorenulls=True).over(wp)
    next_v = F.first("sum_value", ignorenulls=True).over(wn)
    prev_h = F.last(obs_hour, ignorenulls=True).over(wp)
    next_h = F.first(obs_hour, ignorenulls=True).over(wn)
    frac = (
        F.unix_timestamp("hour") - F.unix_timestamp(prev_h)
    ).cast("double") / (
        F.unix_timestamp(next_h) - F.unix_timestamp(prev_h)
    ).cast("double")
    return filled.select(
        "event_type",
        "hour",
        F.when(F.col("sum_value").isNotNull(), F.col("sum_value"))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
        .alias("interp_value"),
    )


def running_count_distinct_frame(ev: DataFrame) -> DataFrame:
    """The two-window DISTINCT rewrite as a frame-in/frame-out helper —
    single source of truth for window_count_distinct AND the scaling
    probe (tools/scalecheck.py), so SCALING.md always measures the
    plan that actually ships."""
    w_first = W.partitionBy("event_type", "user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id")
    )
    w_run = (
        W.partitionBy("event_type")
        .orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = ev.select(
        "event_id",
        "event_type",
        "user_id",
        "ts",
        # NULL user_id must not count as a distinct user: the oracle's
        # COUNT(DISTINCT user_id) OVER excludes NULLs, and the two-
        # window rewrite would otherwise flag the NULL partition's
        # first row and run permanently +1 (r10 review finding —
        # latent, the fixtures carry no NULL user_id)
        F.when(
            F.col("user_id").isNotNull()
            & (F.row_number().over(w_first) == 1),
            1,
        )
        .otherwise(0)
        .alias("is_first"),
    )
    return flagged.select(
        "event_id",
        "event_type",
        "user_id",
        "ts",
        F.sum("is_first").over(w_run).alias("distinct_users_so_far"),
    )


def window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT user_id) per event_type over event time —
    the cumulative-unique-reach curve marketing/abuse dashboards plot.

    Spark's window functions reject DISTINCT aggregates outright, so
    this is the standard two-window rewrite every warehouse migration
    hits: (1) flag each (event_type, user_id)'s FIRST occurrence via
    row_number over the per-user window; (2) running SUM of the flag
    over the per-type event-time window. The oracle runs DuckDB's
    native COUNT(DISTINCT ...) OVER — two different algorithms, one
    hash-exact answer. Two shuffles (user grain, then type grain); at
    100 TB both are ordinary keyed windows, no global sort.
    """
    return running_count_distinct_frame(load_table(spark, sf_dir, "events"))


def events_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ops-dashboard heatmap: event counts per (ISO day-of-week ×
    hour-of-day) cell plus each cell's share of its day — one
    dimension-sized (7×24) aggregation off a map-side projection.

    ISO dow via ``weekday()+1`` (Mon=1..Sun=7), the date_dim_build
    convention that matches DuckDB's ``isodow`` exactly; shares divide
    exact longs per day.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.weekday("ts") + F.lit(1)).cast("int").alias("iso_dow"),
        F.hour("ts").cast("int").alias("hour_of_day"),
    ).agg(F.count("*").alias("n_events"))
    days = cells.groupBy("iso_dow").agg(F.sum("n_events").alias("n_day"))
    return cells.join(F.broadcast(days), "iso_dow").select(
        "iso_dow",
        "hour_of_day",
        "n_events",
        (F.col("n_events").cast("double") / F.col("n_day").cast("double"))
        .alias("day_share"),
    )


QUERIES = {
    "events_hourly_heatmap": events_hourly_heatmap,
    "window_rank": window_rank,
    "window_running_sum": window_running_sum,
    "window_lag": window_lag,
    "topk_per_group": topk_per_group,
    "window_range_frame": window_range_frame,
    "window_distribution": window_distribution,
    "gapfill_locf": gapfill_locf,
    "ewma_smooth": ewma_smooth,
    "interval_merge": interval_merge,
    "gapfill_interp": gapfill_interp,
    "window_count_distinct": window_count_distinct,
}

ORACLE = {
    "events_hourly_heatmap": """
        WITH cells AS (
            SELECT CAST(isodow(ts) AS INT) AS iso_dow,
                   CAST(hour(ts) AS INT) AS hour_of_day,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        ),
        days AS (
            SELECT iso_dow, CAST(SUM(n_events) AS BIGINT) AS n_day
            FROM cells GROUP BY iso_dow
        )
        SELECT c.iso_dow, c.hour_of_day, c.n_events,
               CAST(c.n_events AS DOUBLE) / CAST(d.n_day AS DOUBLE)
                   AS day_share
        FROM cells c JOIN days d USING (iso_dow)
    """,
    "window_count_distinct": """
        SELECT event_id, event_type, user_id, ts,
               COUNT(DISTINCT user_id) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS distinct_users_so_far
        FROM events
    """,
    "ewma_smooth": _ewma_oracle(),
    "interval_merge": f"""
        WITH iv AS (
            SELECT user_id, event_id, ts AS start,
                   ts + INTERVAL {MERGE_GAP_MINUTES} MINUTE AS stop
            FROM events WHERE ts IS NOT NULL
        ),
        flag AS (
            SELECT user_id, event_id, start, stop,
                   CASE WHEN MAX(stop) OVER wprev IS NULL
                             OR start > MAX(stop) OVER wprev
                        THEN 1 ELSE 0 END AS ni
            FROM iv
            WINDOW wprev AS (
                PARTITION BY user_id ORDER BY start, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            )
        ),
        isl AS (
            SELECT user_id, start, stop,
                   SUM(ni) OVER (
                       PARTITION BY user_id ORDER BY start, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS island
            FROM flag
        )
        SELECT user_id, CAST(island AS BIGINT) AS island,
               MIN(start) AS island_start, MAX(stop) AS island_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM isl GROUP BY user_id, island
    """,
    "gapfill_interp": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE)
                       AS sum_value
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, min(hour) AS lo, max(hour) AS hi
            FROM hourly GROUP BY 1
        ),
        spine AS (
            SELECT event_type,
                   unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
            FROM bounds
        ),
        filled AS (
            SELECT s.event_type, s.hour, h.sum_value
            FROM spine s LEFT JOIN hourly h USING (event_type, hour)
        ),
        brk AS (
            SELECT event_type, hour, sum_value,
                   LAST_VALUE(sum_value IGNORE NULLS) OVER wp AS prev_v,
                   FIRST_VALUE(sum_value IGNORE NULLS) OVER wn AS next_v,
                   LAST_VALUE(CASE WHEN sum_value IS NOT NULL THEN hour END
                              IGNORE NULLS) OVER wp AS prev_h,
                   FIRST_VALUE(CASE WHEN sum_value IS NOT NULL THEN hour END
                               IGNORE NULLS) OVER wn AS next_h
            FROM filled
            WINDOW wp AS (
                PARTITION BY event_type ORDER BY hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ),
            wn AS (
                PARTITION BY event_type ORDER BY hour
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
            )
        )
        SELECT event_type, hour,
               CASE WHEN sum_value IS NOT NULL THEN sum_value
                    WHEN prev_v IS NULL THEN next_v
                    WHEN next_v IS NULL THEN prev_v
                    ELSE prev_v + (next_v - prev_v) *
                         (CAST(epoch(hour) - epoch(prev_h) AS DOUBLE) /
                          CAST(epoch(next_h) - epoch(prev_h) AS DOUBLE))
               END AS interp_value
        FROM brk
    """,
    "window_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER w AS INT) AS rn,
               CAST(RANK() OVER w AS INT) AS rnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    "window_running_sum": """
        SELECT user_id, event_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(30,4))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_value
        FROM events
    """,
    "window_lag": """
        SELECT user_id, event_id,
               LAG(value) OVER w AS prev_value,
               LEAD(value) OVER w AS next_value,
               epoch(ts) - LAG(epoch(ts)) OVER w AS gap_seconds
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "window_range_frame": """
        SELECT user_id, event_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(30,4))) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS trailing_1h_value
        FROM events
    """,
    "window_distribution": """
        -- DuckDB defaults to NULLS LAST on ASC; Spark to NULLS FIRST
        SELECT event_type, event_id, value,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume,
               FIRST_VALUE(event_id) OVER w AS first_event_id
        FROM events
        WINDOW w AS (PARTITION BY event_type
                     ORDER BY value ASC NULLS FIRST, event_id)
    """,
    "gapfill_locf": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE)
                       AS sum_value
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, min(hour) AS lo, max(hour) AS hi
            FROM hourly GROUP BY 1
        ),
        spine AS (
            SELECT event_type,
                   unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
            FROM bounds
        ),
        filled AS (
            SELECT s.event_type, s.hour, h.n, h.sum_value
            FROM spine s LEFT JOIN hourly h USING (event_type, hour)
        ),
        grp AS (
            -- LOCF the portable way: count of non-nulls so far defines
            -- a carry group holding exactly one observation
            SELECT *, COUNT(sum_value) OVER (
                PARTITION BY event_type ORDER BY hour) AS g
            FROM filled
        )
        SELECT event_type, hour,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
               MAX(sum_value) OVER (PARTITION BY event_type, g) AS locf_value
        FROM grp
    """,
    "topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
}
