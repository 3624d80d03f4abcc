"""Batch time-series operators (SURVEY.md §2.11 batch twins).

`ts_tumbling_batch` and `ts_sessionize` are the oracle-checkable batch
twins of the streaming queries in :mod:`..streaming.stream_queries` —
same logic, bounded input, full DuckDB oracles.

Scale posture: tumbling aggregation is groupBy on (bucket, key) with
map-side partial agg; sessionization is lag+cumsum — one shuffle by
user, two streaming-evaluable window passes, no per-session
materialization until the final groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_analytics_library_spark.functions.coercion import ensure_columns
from pyspark_analytics_library_spark.registry import query
from pyspark_analytics_library_spark.sources.io import load_tables


def tumbling_agg(
    df: DataFrame,
    ts: str,
    keys: str | Column | list[str | Column],
    window: str = "1 hour",
) -> DataFrame:
    """Tumbling-window aggregation via F.window (epoch-aligned buckets,
    identical alignment to DuckDB's time_bucket).  ``keys`` accepts a
    single name or a sequence (coercion guards the string-iteration
    foot-gun); plain column references only — the grouped SELECT
    re-emits the keys against the aggregated schema, where a computed
    expression's inputs no longer exist."""
    key_cols = ensure_columns(keys)
    return (
        df.groupBy(F.window(ts, window).alias("w"), *key_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), *key_cols, "n_events", "total_value")
    )


def sessionize(
    df: DataFrame, user: str, ts: str, unique: str, gap_seconds: int = 1800
) -> DataFrame:
    """Gap-based sessionization: lag → new-session flag → running sum.

    Session ids are per-user ordinals (1-based).  Both window passes
    share one (user)-shuffle; the cumsum frame is running, so memory is
    O(1) per row regardless of session length.
    """
    w = Window.partitionBy(user).orderBy(ts, unique)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_s = F.col(ts).cast("long")
    is_new = F.when(
        F.lag(ts_s).over(w).isNull() | ((ts_s - F.lag(ts_s).over(w)) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn("_is_new", is_new).withColumn(
        "session_id", F.sum("_is_new").over(w_run)
    )


@query(
    "ts_tumbling_batch",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def q_ts_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return tumbling_agg(t["events"], "ts", ["event_type"], "1 hour")


@query(
    "ts_sessionize",
    oracle="""
    WITH d AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM d
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM s
    GROUP BY user_id, session_id
    """,
)
def q_ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user, one row per session."""
    t = load_tables(spark, sf_dir)
    s = sessionize(t["events"], "user_id", "ts", "event_id", gap_seconds=1800)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "ts_gapfill",
    oracle="""
    WITH b AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ), g AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b
    ), ty AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT hour, event_type FROM g CROSS JOIN ty),
    c AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 4) AS tv
        FROM events GROUP BY 1, 2
    )
    SELECT grid.hour, grid.event_type,
           COALESCE(c.n, 0) AS n_events,
           last_value(c.tv IGNORE NULLS) OVER (
               PARTITION BY grid.event_type ORDER BY grid.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS total_value_ffill
    FROM grid LEFT JOIN c
      ON grid.hour = c.hour AND grid.event_type = c.event_type
    """,
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to a dense hourly grid: zero-fill missing buckets and
    forward-fill the last observed hourly value per event_type.

    Scale: the hourly aggregate is the only data-sized shuffle; the
    grid (hours × types) is generated rows, tiny at any input scale, so
    the left join broadcasts the aggregate side or the grid side under
    AQE. Forward-fill is a running `last(ignorenulls)` frame — O(1)
    state per row, one shuffle by event_type.
    """
    ev = load_tables(spark, sf_dir)["events"]
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("tv"))
    hours = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    ).select(F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"))
    grid = hours.crossJoin(ev.select("event_type").distinct())
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["hour", "event_type"], "left")
        .withColumn("n_events", F.coalesce("n", F.lit(0)))
        .withColumn("total_value_ffill", F.last("tv", ignorenulls=True).over(w))
        .select("hour", "event_type", "n_events", "total_value_ffill")
    )


@query(
    "ts_session_stats",
    oracle="""
    WITH d AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM d
    ), per_session AS (
        SELECT user_id, session_id, COUNT(*) AS n_events
        FROM s GROUP BY user_id, session_id
    )
    SELECT COUNT(*) AS n_sessions,
           ROUND(AVG(n_events), 4) AS avg_session_events,
           MAX(n_events) AS max_session_events
    FROM per_session
    """,
)
def q_ts_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row summary over the full sessionization (same compute as
    ts_sessionize, aggregate output — the headline bench shape, where
    collect cost must not mask execution cost)."""
    t = load_tables(spark, sf_dir)
    s = sessionize(t["events"], "user_id", "ts", "event_id", gap_seconds=1800)
    per_session = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_session_events"),
        F.max("n_events").alias("max_session_events"),
    )


@query(
    "ts_ohlc",
    oracle="""
    WITH v AS (
        SELECT date_trunc('hour', ts) AS bar_hour, event_type, value,
               FIRST_VALUE(value) OVER w AS open,
               LAST_VALUE(value)  OVER w AS close
        FROM events
        WINDOW w AS (
            PARTITION BY date_trunc('hour', ts), event_type
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    )
    SELECT bar_hour, event_type,
           MAX(open)  AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(close) AS close,
           COUNT(*)   AS n_ticks,
           ROUND(SUM(value), 4) AS volume
    FROM v
    GROUP BY bar_hour, event_type
    """,
)
def q_ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event_type — the resample-to-bars operator
    of a market-data / metrics pipeline.

    open/close need the first and last tick by (ts, event_id) within
    the bar, which no commutative aggregate expresses, so one window
    pass (single shuffle on the bar key, one partition-local sort)
    pins them as constants per bar and the follow-up groupBy collapses
    with plain max/min/count/sum.  The bar key is PROJECTED FIRST and
    the window partitions by that attribute (not by the date_trunc
    expression inline): that way the groupBy's required clustering is
    satisfied by the window's existing hashpartitioning and the whole
    query runs on ONE exchange — partitioning by the expression
    instead costs a verified second shuffle (Catalyst does not unify
    an expression with its later projection).  high/low/volume are
    map-side-combinable; the sort is O(bar) not O(partition).  The
    unique event_id suffix makes first/last a total order (§5.3.3).
    """
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("bar_hour", "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t["events"]
        .withColumn("bar_hour", F.date_trunc("hour", F.col("ts")))
        .select(
            "bar_hour",
            "event_type",
            "value",
            F.first("value").over(w).alias("open"),
            F.last("value").over(w).alias("close"),
        )
        .groupBy("bar_hour", "event_type")
        .agg(
            F.max("open").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max("close").alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.round(F.sum("value"), 4).alias("volume"),
        )
    )


@query(
    "ts_rolling_zscore",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, event_type,
               ROUND(SUM(value), 4) AS tv
        FROM events GROUP BY 1, 2
    )
    SELECT day, event_type, tv,
           ROUND(AVG(tv) OVER w, 4) AS mean_7d,
           ROUND(COALESCE(STDDEV_SAMP(tv) OVER w, 0.0), 4) AS sd_7d,
           CASE WHEN COALESCE(STDDEV_SAMP(tv) OVER w, 0.0) = 0.0 THEN 0.0
                ELSE ROUND((tv - AVG(tv) OVER w) / (STDDEV_SAMP(tv) OVER w), 4)
           END AS zscore
    FROM daily
    WINDOW w AS (
        PARTITION BY event_type ORDER BY day
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
    )
    """,
)
def q_ts_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day z-score per event_type over daily volume — the
    standard streaming anomaly detector, as pure window algebra.

    The daily pre-aggregate collapses raw events BEFORE the window, so
    the windowed series is days × types rows no matter the event
    volume — the window state is O(7) and the expensive shuffle is the
    map-side-combinable groupBy.  Day 1 of each series has a NULL
    sample stddev (frame of one) → z pinned to 0.0 on both engines.
    """
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.round(F.sum("value"), 4).alias("tv"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    mean7 = F.avg("tv").over(w)
    sd7 = F.coalesce(F.stddev_samp("tv").over(w), F.lit(0.0))
    return daily.select(
        "day",
        "event_type",
        "tv",
        F.round(mean7, 4).alias("mean_7d"),
        F.round(sd7, 4).alias("sd_7d"),
        F.when(sd7 == 0.0, F.lit(0.0))
        .otherwise(F.round((F.col("tv") - mean7) / F.stddev_samp("tv").over(w), 4))
        .alias("zscore"),
    )


@query(
    "ts_ewma",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, event_type,
               ROUND(SUM(value), 4) AS tv
        FROM events GROUP BY 1, 2
    ), idx AS (
        SELECT day, event_type, tv,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY day
               ) - 1 AS DOUBLE) AS i
        FROM daily
    )
    SELECT day, event_type, tv,
           ROUND(
               SUM(tv * POW(1.0 / 0.7, i)) OVER w
               / SUM(POW(1.0 / 0.7, i)) OVER w, 4) AS ewma
    FROM idx
    WINDOW w AS (
        PARTITION BY event_type ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
    """,
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α=0.3, adjust-style
    normalization) per event_type — WITHOUT a UDF or recursion.

    EWMA looks inherently sequential (ewma_t = α·x_t + (1-α)·ewma_t-1)
    but the adjusted form is a ratio of two running sums:
    ewma_t = Σᵢ xᵢ·rⁱ / Σᵢ rⁱ with r = 1/(1-α) — the (1-α)^t factor
    cancels between numerator and denominator.  Two running-SUM frames
    over one shuffle, fully JVM-side, streaming-evaluable.

    Scale note: rⁱ grows exponentially in the series ORDINAL (not the
    data volume) — fine up to ~2000 points per key in float64
    (r=1.43 → 10³¹⁰ at i≈2000); longer series need segmented
    renormalization (restart i per segment, carry the segment-boundary
    EWMA forward), which keeps the same two-sums shape.  The daily
    pre-aggregate bounds the ordinal to days-since-epoch regardless of
    raw event volume.
    """
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.round(F.sum("value"), 4).alias("tv"))
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    i = (F.row_number().over(w_ord) - 1).cast("double")
    rpow = F.pow(F.lit(1.0 / 0.7), i)
    return (
        daily.withColumn("_rpow", rpow)
        .select(
            "day",
            "event_type",
            "tv",
            F.round(
                F.sum(F.col("tv") * F.col("_rpow")).over(w_run)
                / F.sum("_rpow").over(w_run),
                4,
            ).alias("ewma"),
        )
    )


@query(
    "ts_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1
        FROM events WHERE event_type = 'click' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s1.t1
        GROUP BY e.user_id
    )
    SELECT '1_click' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
    UNION ALL
    SELECT '2_purchase_after_click' AS step,
           CAST(COUNT(*) AS BIGINT) AS n_users FROM s2
    ORDER BY step
    """,
)
def q_ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered two-step event funnel: users who clicked, then users
    whose first purchase happened strictly AFTER their first click.

    Shape: two per-user min-aggregations (one shuffle each on
    user_id) joined on the same key — the second agg reuses the first
    shuffle's partitioning, so AQE plans the join exchange-free on
    the build side.  Counts collapse to one row per step (no per-user
    output survives the funnel), so driver traffic is O(steps) at any
    scale.
    """
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    s1 = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    step1 = s1.agg(F.count(F.lit(1)).alias("n_users")).select(
        F.lit("1_click").alias("step"), "n_users"
    )
    step2 = s2.agg(F.count(F.lit(1)).alias("n_users")).select(
        F.lit("2_purchase_after_click").alias("step"), "n_users"
    )
    return step1.union(step2).orderBy("step")


@query(
    "ts_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day
        FROM events
    )
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, active_day) AS INTEGER)
               AS day_offset,
           COUNT(*) AS n_users
    FROM activity JOIN first_seen USING (user_id)
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def q_ts_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day,
    counted on each later active day (offset in days).

    Both inputs aggregate on user_id first (events collapse to at
    most users x days rows BEFORE the join), so the join is between
    two already-tiny sides regardless of raw event volume — the
    standard retention rollup that stays cheap at 100 TB of events.
    Day boundaries via date_trunc on both engines; offsets via
    calendar-day difference on the truncated values (identical
    semantics, no timezone skew — sessions pin UTC).
    """
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    day = F.date_trunc("day", F.col("ts"))
    first_seen = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = ev.select("user_id", day.alias("active_day")).distinct()
    return (
        activity.join(first_seen, "user_id")
        .select(
            "cohort_day",
            F.datediff("active_day", "cohort_day").cast("int").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "ts_session_native",
    oracle="""
    WITH d AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts >= LAG(ts) OVER w + INTERVAL 30 MINUTES
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sid
        FROM d
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTES AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def q_ts_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via Spark's NATIVE session_window aggregation
    — the engine-managed twin of the hand-rolled lag+cumsum
    `ts_sessionize` (and of the streaming state-store version).

    session_window merges an event into the current session while it
    falls INSIDE the half-open window [start, last_ts + gap); an event
    at exactly last_ts + gap starts a NEW session, so the oracle's
    split condition is `>=` where the lag-based sessionizer uses `>`
    (the fixture has no exact-boundary gaps — verified — but the
    semantics are pinned here on purpose).  The window end Spark
    reports is max(ts) + gap, not max(ts).  Scale: one shuffle on
    user_id and per-key ordered merge — the same cost envelope as the
    window formulation, but with engine-side session merging that also
    works under streaming state eviction.
    """
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "ts_activity_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), isl AS (
        SELECT user_id, d,
               d - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY d) AS INTEGER) AS g
        FROM days
    ), streaks AS (
        SELECT user_id, g, COUNT(*) AS n_days FROM isl GROUP BY user_id, g
    )
    SELECT user_id,
           CAST(SUM(n_days) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(n_days) AS BIGINT) AS longest_streak
    FROM streaks GROUP BY user_id ORDER BY user_id
    """,
)
def q_ts_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-day activity streaks —
    the classic retention analytic (DAU streak length) and the
    canonical islands formulation: day minus its per-user row_number
    is constant exactly along a run of consecutive days, so one window
    plus two aggregates finds every streak without self-joins.

    Scale: the distinct collapses (user, day) first (map-side partial),
    then the window and both aggregates share the user_id shuffle key
    — one data-proportional exchange, no join.  DuckDB twin uses
    DATE − INTEGER arithmetic; Spark's date_sub — identical day math,
    and the island key is only a GROUP BY key, never output.
    """
    t = load_tables(spark, sf_dir)
    days = t["events"].select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("g", F.date_sub(F.col("d"), F.row_number().over(w)))
    streaks = isl.groupBy("user_id", "g").agg(F.count(F.lit(1)).alias("n_days"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("n_days").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("n_days").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


@query(
    "ts_resample_interp",
    oracle="""
    WITH b AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ), g AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b
    ), ty AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT hour, event_type FROM g CROSS JOIN ty),
    c AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS BIGINT)
                   AS v
        FROM events GROUP BY 1, 2
    ), j AS (
        SELECT grid.hour, grid.event_type, c.v,
               CAST(FLOOR(epoch(grid.hour)) AS BIGINT) AS h
        FROM grid LEFT JOIN c
          ON grid.hour = c.hour AND grid.event_type = c.event_type
    ), f AS (
        SELECT hour, event_type, v, h,
               last_value(v IGNORE NULLS) OVER wp AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                   OVER wp AS ph,
               first_value(v IGNORE NULLS) OVER wn AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                   OVER wn AS nh
        FROM j
        WINDOW wp AS (PARTITION BY event_type ORDER BY hour
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY event_type ORDER BY hour
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT hour, event_type,
           (v IS NOT NULL) AS observed,
           FLOOR(CASE
               WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
               WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                   CAST(pv AS DOUBLE)
                   + CAST(nv - pv AS DOUBLE) * (h - ph) / (nh - ph)
               WHEN pv IS NOT NULL THEN CAST(pv AS DOUBLE)
               ELSE CAST(nv AS DOUBLE)
           END + 0.5) / 10000 AS value_interp
    FROM f
    """,
)
def q_ts_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to a dense hourly grid with LINEAR interpolation of the
    per-hour total value — the companion to ts_gapfill's zero/forward
    fill, and what a sensor/metrics pipeline actually wants between
    sparse observations.  Edge hours with no neighbor on one side
    extend the nearest observation.

    Shape mirrors ts_gapfill: the hourly aggregate is the only
    data-sized shuffle; the generated grid is (hours × types) rows at
    any input scale; prev/next observation carry is a pair of
    unbounded last/first(ignorenulls) frames sharing the event_type
    shuffle — O(1) state per row.

    Parity discipline (§5.3 rules 7+8, learned here the hard way): an
    AVG-based metric put interpolated midpoints EXACTLY on 4-dp
    rounding boundaries, where even same-ulp inputs round apart.  So
    everything is integer until one final deterministic step: `value`
    is 4-dp exact → scale to int ten-thousandths (FLOOR(v·1e4+0.5)),
    SUM as BIGINT (exact, order-independent), interpolate with the
    value delta cast to double BEFORE the slope multiply — an int64
    (nv−pv)·(h−ph) product could silently wrap on Spark (non-ANSI)
    while DuckDB raises, the worst kind of divergence; the double
    product rounds identically on both engines and stays exact below
    2^53 — and FLOOR(x+0.5)/1e4 back to value units.
    """
    ev = load_tables(spark, sf_dir)["events"]
    v_scaled = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.sum(v_scaled).alias("v"))
    hours = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    ).select(F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"))
    grid = hours.crossJoin(ev.select("event_type").distinct())
    j = grid.join(hourly, ["hour", "event_type"], "left").withColumn(
        "h", F.col("hour").cast("long")
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    h_obs = F.when(F.col("v").isNotNull(), F.col("h"))
    f = (
        j.withColumn("pv", F.last("v", ignorenulls=True).over(wp))
        .withColumn("ph", F.last(h_obs, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wn))
        .withColumn("nh", F.first(h_obs, ignorenulls=True).over(wn))
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v").cast("double"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv").cast("double")
            + (F.col("nv") - F.col("pv")).cast("double")
            * (F.col("h") - F.col("ph"))
            / (F.col("nh") - F.col("ph")),
        )
        .when(F.col("pv").isNotNull(), F.col("pv").cast("double"))
        .otherwise(F.col("nv").cast("double"))
    )
    return f.select(
        "hour",
        "event_type",
        F.col("v").isNotNull().alias("observed"),
        (F.floor(interp + F.lit(0.5)) / 10000).alias("value_interp"),
    )
