"""Window functions (SURVEY.md §2.5): top-k per group, ranking, lag/lead,
running/moving frames, first/last.

Capability parity: reference window surface (snapshot empty — SURVEY.md
§0.1).  Scale posture: a window = ONE shuffle on partitionBy keys + a
partition-local sort; all frames here are streaming-evaluable (running
or bounded), so executor memory stays O(frame), not O(partition).  The
tie-break discipline of §5.3.3 applies throughout: every ordering that
feeds row_number/ntile/limit carries a unique key suffix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_analytics_library_spark.functions.coercion import (
    ensure_column,
    ensure_columns,
)
from pyspark_analytics_library_spark.registry import query
from pyspark_analytics_library_spark.sources.io import load_tables


def topk_per_group(
    df: DataFrame,
    keys: str | Column | list[str | Column],
    order: Column | list[Column],
    k: int,
) -> DataFrame:
    """Top-k rows per group via row_number ≤ k.  ``order`` must be a
    total order (append a unique key) for cross-engine determinism.
    ``keys``/``order`` accept a single name/Column or a sequence
    (ensure_columns guards the string-iteration foot-gun)."""
    w = Window.partitionBy(*ensure_columns(keys)).orderBy(*ensure_columns(order))
    return df.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= k
    )


def lag_lead(
    df: DataFrame,
    keys: str | Column | list[str | Column],
    order: str | Column | list[str | Column],
    value: str | Column,
) -> DataFrame:
    w = Window.partitionBy(*ensure_columns(keys)).orderBy(*ensure_columns(order))
    v = ensure_column(value)
    return df.withColumn("lag_value", F.lag(v).over(w)).withColumn(
        "lead_value", F.lead(v).over(w)
    )


@query(
    "win_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer.  Unlike global top-k (limit_topk),
    per-group top-k keeps all groups — shuffle by customer, heap-free
    rank within partition."""
    t = load_tables(spark, sf_dir)
    df = t["orders"].select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    return topk_per_group(
        df,
        keys=["c_custkey"],
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )


@query(
    "win_rank_dense_ntile",
    oracle="""
    SELECT p_partkey, p_type, p_size,
           RANK()         OVER (PARTITION BY p_type ORDER BY p_size) AS rnk,
           DENSE_RANK()   OVER (PARTITION BY p_type ORDER BY p_size) AS drnk,
           FLOOR(PERCENT_RANK() OVER (PARTITION BY p_type ORDER BY p_size)
               * 1000000 + 0.5) / 1000000.0 AS prnk,
           NTILE(4)       OVER (PARTITION BY p_type ORDER BY p_size, p_partkey) AS nt
    FROM part
    """,
)
def q_win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/percent_rank are tie-stable (equal inputs →
    equal outputs), so they order by p_size alone; ntile assigns tied
    rows to different buckets, so its ordering appends the unique
    p_partkey (§5.3.3)."""
    t = load_tables(spark, sf_dir)
    w_ties = Window.partitionBy("p_type").orderBy("p_size")
    w_total = Window.partitionBy("p_type").orderBy("p_size", "p_partkey")
    return t["part"].select(
        "p_partkey",
        "p_type",
        "p_size",
        F.rank().over(w_ties).cast("long").alias("rnk"),
        F.dense_rank().over(w_ties).cast("long").alias("drnk"),
        (F.floor(F.percent_rank().over(w_ties) * 1e6 + F.lit(0.5)) / 1e6).alias("prnk"),
        F.ntile(4).over(w_total).cast("long").alias("nt"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           COALESCE(LAG(value)  OVER w, -1.0) AS lag_value,
           COALESCE(LEAD(value) OVER w, -1.0) AS lead_value,
           COALESCE(date_diff('second', LAG(ts) OVER w, ts), -1) AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user deltas vs neighboring events.  Spark's
    cast(ts AS long) floors to epoch seconds; DuckDB's
    date_diff('second', …) counts second boundaries — identical
    arithmetic for ordered timestamps."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.col("ts").cast("long")
    return t["events"].select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.coalesce(F.lag("value").over(w), F.lit(-1.0)).alias("lag_value"),
        F.coalesce(F.lead("value").over(w), F.lit(-1.0)).alias("lead_value"),
        F.coalesce(ts_s - F.lag(ts_s).over(w), F.lit(-1)).alias("secs_since_prev"),
    )


@query(
    "win_running",
    oracle="""
    SELECT event_id, user_id, ts, value,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum,
           ROUND(AVG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS moving_avg_7,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 300 PRECEDING AND CURRENT ROW), 4) AS sum_5min
    FROM events
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum, 7-row moving average (rowsBetween), and a 5-minute
    RANGE frame over epoch seconds (rangeBetween) — the three frame
    kinds.  All are streaming-evaluable: O(frame) executor memory."""
    t = load_tables(spark, sf_dir)
    w_total = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_total.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mov = w_total.rowsBetween(-6, Window.currentRow)
    w_rng = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-300, Window.currentRow)
    )
    return t["events"].select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(F.sum("value").over(w_run), 4).alias("running_sum"),
        F.round(F.avg("value").over(w_mov), 4).alias("moving_avg_7"),
        F.round(F.sum("value").over(w_rng), 4).alias("sum_5min"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS first_price,
           LAST_VALUE(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_price
    FROM orders
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
    )


@query(
    "win_cume_dist",
    oracle="""
    SELECT c_custkey, c_nationkey,
           FLOOR(CUME_DIST() OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
           ) * 1000000 + 0.5) / 1000000.0 AS cd
    FROM customer
    """,
)
def q_win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distribution per nation (total order via the unique
    customer key so both engines rank identically)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return t["customer"].select(
        "c_custkey",
        "c_nationkey",
        (F.floor(F.cume_dist().over(w) * 1e6 + F.lit(0.5)) / 1e6).alias("cd"),
    )


@query(
    "win_nth_value",
    oracle="""
    SELECT o_orderkey, o_custkey,
           nth_value(o_totalprice, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_price,
           COALESCE(nth_value(o_totalprice, 3) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ), -1.0) AS third_price
    FROM orders
    """,
)
def q_win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full partition frame (each customer's 2nd and
    3rd order price by date).  The frame must be UNBOUNDED FOLLOWING on
    both engines — the default running frame would return NULL until
    row n arrives.  NULL for customers with fewer orders (3rd price
    coalesced to -1 for hash-stable compare)."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.coalesce(F.nth_value("o_totalprice", 3).over(w), F.lit(-1.0)).alias(
            "third_price"
        ),
    )


@query(
    "win_distinct_range",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(COUNT(DISTINCT event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 600 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_10min
    FROM events
    """,
)
def q_win_distinct_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct event types per user within a trailing 10-minute
    RANGE frame — behavioral-diversity windowing (sessions that touch
    many event types in a short span), a frame kind the plain
    running/moving aggregates in win_running don't cover: DISTINCT
    inside a window.

    Spark has no COUNT(DISTINCT) window function; the same semantics
    compile to size(collect_set() OVER range-frame) — executor-side
    per-frame sets bounded by |event_type| (4 here; small enums in
    general), evaluated inside the one (user_id)-shuffle the window
    already pays.  Epoch discipline per SURVEY §5.3 rule 9: Spark's
    cast(ts AS long) floors, so the oracle orders by FLOOR(epoch(ts)).
    """
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-600, Window.currentRow)
    )
    return t["events"].select(
        "event_id",
        "user_id",
        "ts",
        F.size(F.collect_set("event_type").over(w))
        .cast("long")
        .alias("distinct_types_10min"),
    )
