"""Skew mitigation and shuffle co-location (the 100 TB hygiene surface).

Three declared queries, each proving a *scale technique* produces
bit-identical results to the plain declarative path (full DuckDB
oracles — the oracle is the unsalted/unbucketed SQL):

- ``agg_salted_skew``: two-phase salted aggregation. A hot grouping
  key funnels its state through one reducer; salting splits it into
  ``buckets`` partials that combine in a second, tiny aggregation.
  Salt is ``pmod(hash(unique_col), buckets)`` — deterministic (reruns
  agree) yet uniform.  Scope (measured at 1 B rows, SCALE.md r12): for
  ALGEBRAIC aggregates Spark's map-side partial aggregation already
  collapses the hot key per task, so plain groupBy is not skew-bound
  and two-phase merely costs nothing extra (decimal-exact agreement on
  all 5,001 keys at 1 B rows); the technique's real targets are
  aggregates whose partial state does not collapse (exact
  count-distinct sets, collect_list) — and the JOIN case below, where
  no combiner exists.
- ``join_salted_skew``: skewed equi-join — replicate the build side
  across ``buckets`` salt replicas (explode — no driver loop), salt the
  probe side by hash of a unique column, join on (key, salt). AQE's
  skew-join split handles moderate skew automatically WHEN its
  engagement conditions hold; explicit salting is the dependable lever
  because those conditions are environmental, invisible to the query
  author, and AQE declines SILENTLY.  Root-caused in round 12 (SCALE.md
  "AQE skew-split root cause"; PySpark 4.1.2 OptimizeSkewedJoin /
  ShufflePartitionsUtil, bytecode-verified + DEBUG-log bisect), the
  rule requires ALL of:
  (1) size: hot partition's COMPRESSED map-output bytes >
      max(skewedPartitionThresholdInBytes [256 MB],
      skewedPartitionFactor [5.0] x median).  A single-key partition
      compresses far better than mixed-key neighbors — measured 36x
      row-skew showing only 3x byte-skew (2.9 MB vs 0.83 MB median at
      10 M rows), and the SAME rows at 42.6 MB once shuffled out of
      clustered order (14x compression swing) — so row-skew reasoning
      over-predicts engagement;
  (2) splittability: the split happens only at MAP-output-block
      boundaries (createSkewPartitionSpecs returns None at <= 1 chunk,
      with NO log line).  Few effective upstream maps — e.g. a parquet
      scan whose files hold one giant row group, where only splits
      containing a row-group midpoint emit rows — make the hot
      partition one unsplittable block (the r11 probe's fixture:
      1 file, 1 row group, 100 % of rows from ONE map);
  (3) shape: BOTH join children must be Sort over a BARE
      ENSURE_REQUIREMENTS ShuffleQueryStageExec — reusing an upstream
      aggregation's partitioning on the join key (distinct/groupBy
      feeding the join) removes the Exchange and disqualifies the join
      entirely.  ``forceOptimizeSkewedJoin`` waives only the
      extra-shuffle cost veto, none of the above.
  The completing measurement (SCALE.md round-12 follow-up): with the
  LAYOUT fixed — 64 map blocks, shuffled row order — the split engages
  at STOCK thresholds on the same 100 M-row join and fixes the
  straggler (15.1 s vs 46.4 s warm), while ``salted_join`` still
  matched or beat it (9.9 s) and needs no layout cooperation.
- ``join_bucketed_colocated``: both fact sides written bucketed by the
  join key, then joined — the join runs shuffle-free (no Exchange in
  the plan, pinned by tests/test_plans.py). At 100 TB this is THE
  pattern for repeated fact⋈fact joins: pay the shuffle once at write
  time, amortize it over every downstream join.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_analytics_library_spark.functions.coercion import ensure_columns
from pyspark_analytics_library_spark.registry import query
from pyspark_analytics_library_spark.sources.io import load_tables

DEFAULT_BUCKETS = 16


def salt_column(unique_col: str | Column, buckets: int = DEFAULT_BUCKETS) -> Column:
    """Deterministic uniform salt in [0, buckets): hash of a unique
    column, not rand() — reruns and retried tasks agree."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.hash(c), F.lit(buckets))


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: str,
    unique_col: str,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Two-phase salted SUM/COUNT: partials on (keys, salt), final on
    keys. Works for any algebraic aggregate (sum/count/min/max); holistic
    aggregates (median) need the sketch path instead (SCALE.md)."""
    partial = (
        df.withColumn("_salt", salt_column(unique_col, buckets))
        .groupBy(*ensure_columns(keys), "_salt")
        .agg(F.sum(value).alias("_s"), F.count(F.lit(1)).alias("_c"))
    )
    return partial.groupBy(*ensure_columns(keys)).agg(
        F.sum("_s").alias(f"sum_{value}"), F.sum("_c").alias("n_rows")
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_unique: str | Column,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Skew-proof inner equi-join: build side replicated `buckets`×,
    probe side salted deterministically, join on (key, salt).

    Cost model: build side grows buckets×(use only when build ≪ probe
    and a probe key is pathologically hot); probe rows are never
    replicated. The replicate is `explode(sequence(...))` — pure
    expression, no driver involvement.
    """
    build_rep = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    probe_salted = probe.withColumn("_salt", salt_column(probe_unique, buckets))
    return probe_salted.join(build_rep, [key, "_salt"]).drop("_salt")


@query(
    "agg_salted_skew",
    oracle="""
    SELECT event_type,
           ROUND(SUM(value), 4) AS sum_value,
           COUNT(*) AS n_rows
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation ≡ plain GROUP BY (the oracle IS the
    unsalted SQL — the technique must be invisible in the result)."""
    ev = load_tables(spark, sf_dir)["events"]
    out = salted_sum_count(ev, ["event_type"], "value", "event_id")
    return out.select(
        "event_type", F.round("sum_value", 4).alias("sum_value"), "n_rows"
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice) / 1000000.0, 4) AS total_price_m
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈fact join ≡ plain join (oracle is the unsalted SQL).
    lineitem is the probe (never replicated); orders replicate 16×."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        F.col("l_orderkey").alias("k"), "l_linenumber", "l_extendedprice"
    )
    orders = t["orders"].select(F.col("o_orderkey").alias("k"), "o_orderpriority")
    joined = salted_join(
        li,
        orders,
        key="k",
        # (orderkey, linenumber) is the lineitem PK; salting on its
        # concat spreads even a single hot order across buckets.
        probe_unique=F.concat_ws(":", F.col("k"), F.col("l_linenumber")),
        buckets=DEFAULT_BUCKETS,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        # Reported in millions: a raw ~1e9 sum rounded at 4 dp sits inside
        # cross-engine summation-order noise (~1e-4) — the sf0.1 sweep
        # caught the resulting off-by-one-ulp rounding flips.  Rescaling
        # puts 6 orders of magnitude between the noise and the rounding
        # threshold.
        F.round(F.sum("l_extendedprice") / 1e6, 4).alias("total_price_m"),
    )


#: Bucketed tables are written once per (application, sf_dir) and reused.
#: Keyed by applicationId, not id(spark) — id() values are recycled after a
#: session is garbage-collected, which would let a fresh session skip the
#: write and read another session's (or nobody's) tables.
_BUCKETED: set[tuple[str, str]] = set()


def _sf_suffix(sf_dir: str) -> str:
    """Stable digest of sf_dir for table names — NOT builtin hash(), which
    collapses to one value across processes when PYTHONHASHSEED is fixed
    (common in Spark deployments) and varies per-process otherwise."""
    return hashlib.sha256(sf_dir.encode()).hexdigest()[:8]


def write_bucketed(
    df: DataFrame,
    spark: SparkSession,
    name: str,
    key: str,
    buckets: int = 8,
    base_dir: str | None = None,
) -> None:
    """Persist `df` bucketed+sorted by `key` as an external table.

    Bucketing is Spark's pay-once co-location: both sides of a future
    equi-join on `key` with the same bucket count scan pre-partitioned,
    pre-sorted files and sort-merge-join with NO Exchange.
    """
    # pid-scoped (like sources/scan_queries._SCRATCH): two concurrent
    # processes writing the same table name must not clobber each other's
    # files mid-read.
    base = base_dir or os.path.join(
        tempfile.gettempdir(), f"sparkalytics_bucketed_{os.getpid()}"
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.mode("overwrite")
        .option("path", os.path.join(base, name))
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )


def _ensure_bucketed_orders_lineitem(spark: SparkSession, sf_dir: str) -> None:
    suffix = _sf_suffix(sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    # Belt and braces: even on a cache hit, verify the tables still exist
    # in this session's catalog before skipping the write.
    if key in _BUCKETED and spark.catalog.tableExists(f"lineitem_b{suffix}"):
        return
    t = load_tables(spark, sf_dir)
    write_bucketed(
        t["lineitem"].select("l_orderkey", "l_extendedprice"),
        spark,
        f"lineitem_b{suffix}",
        "l_orderkey",
    )
    write_bucketed(
        t["orders"].select("o_orderkey", "o_orderpriority"),
        spark,
        f"orders_b{suffix}",
        "o_orderkey",
    )
    _BUCKETED.add(key)


def bucketed_join_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw bucketed join (pre-aggregation) — used by the plan test
    to assert there is no Exchange under the SortMergeJoin."""
    _ensure_bucketed_orders_lineitem(spark, sf_dir)
    suffix = _sf_suffix(sf_dir)
    li = spark.table(f"lineitem_b{suffix}")
    orders = spark.table(f"orders_b{suffix}")
    # merge hint: at fixture scale the planner would broadcast the tiny
    # side (and skip bucketing entirely); the shape under test is the
    # 100 TB one — two fact tables, neither broadcastable.
    return li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey)


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice) / 1000000.0, 4) AS total_price_m
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free join over bucketed tables ≡ plain join (oracle is
    the same SQL as join_salted_skew — three physical strategies, one
    result)."""
    return (
        bucketed_join_pair(spark, sf_dir)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # Reported in millions: a raw ~1e9 sum rounded at 4 dp sits inside
        # cross-engine summation-order noise (~1e-4) — the sf0.1 sweep
        # caught the resulting off-by-one-ulp rounding flips.  Rescaling
        # puts 6 orders of magnitude between the noise and the rounding
        # threshold.
        F.round(F.sum("l_extendedprice") / 1e6, 4).alias("total_price_m"),
        )
    )


@query(
    "agg_distinct_skew",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_agg_distinct_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe exact count-distinct: spelled distinct-then-count —
    `select(key, value).distinct()` (the shuffle keys on BOTH columns,
    so a hot grouping key spreads across every reducer) followed by a
    count of pre-collapsed singletons.  Same result as `agg_distinct`'s
    plain `countDistinct` (the oracle is identical SQL); the point is
    the PLAN: the r12 probe measured the plain spelling at 143.7 s vs
    this one at 45.1 s (3.2×) on a 50 %-hot key at 200 M rows, because
    countDistinct's partial state — the per-task distinct SET of the
    hot key — is the one aggregation state map-side combine cannot
    collapse (SCALE.md round-12 follow-up).  At 100 TB this spelling
    (or `approx_count_distinct` when ±2 % is acceptable —
    `agg_approx_distinct`) is the difference between a straggler-bound
    job and a uniform one.

    NULL semantics (ADVICE r12): a bare ``distinct()`` keeps one row
    for a NULL value, while ``COUNT(DISTINCT user_id)`` ignores NULLs —
    so the NULL filter below is what makes the two spellings equivalent
    on data with NULL user_ids (the fixture has none, but the spelling
    is the prescription and must not silently off-by-one elsewhere)."""
    t = load_tables(spark, sf_dir)
    pairs = (
        t["events"]
        .select("event_type", "user_id")
        .filter(F.col("user_id").isNotNull())
        .distinct()
    )
    return (
        pairs.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("event_type")
    )
