"""Set operations (SURVEY.md §2.7).

Shape: customers-with-orders vs users-with-events on key columns.  All
six variants map 1:1 onto Spark DataFrame set ops, which execute as
hash aggregations / joins under the hood — fully distributed, no
driver materialization.  At 100 TB, `union` is free (plan-level
concatenation); distinct/intersect/except shuffle once on the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_analytics_library_spark.registry import query
from pyspark_analytics_library_spark.sources.io import load_tables


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    t = load_tables(spark, sf_dir)
    order_cust = t["orders"].select(F.col("o_custkey").alias("custkey"))
    event_users = t["events"].select(F.col("user_id").alias("custkey"))
    return order_cust, event_users


_ORDERS_SIDE = "SELECT o_custkey AS custkey FROM orders"
_EVENTS_SIDE = "SELECT user_id AS custkey FROM events"


@query("set_union_all", oracle=f"{_ORDERS_SIDE} UNION ALL {_EVENTS_SIDE}")
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _sides(spark, sf_dir)
    return a.unionByName(b)


@query("set_union_distinct", oracle=f"{_ORDERS_SIDE} UNION {_EVENTS_SIDE}")
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _sides(spark, sf_dir)
    return a.unionByName(b).distinct()


@query("set_intersect", oracle=f"{_ORDERS_SIDE} INTERSECT {_EVENTS_SIDE}")
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _sides(spark, sf_dir)
    return a.intersect(b)


@query("set_intersect_all", oracle=f"{_ORDERS_SIDE} INTERSECT ALL {_EVENTS_SIDE}")
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (min of multiplicities per key)."""
    a, b = _sides(spark, sf_dir)
    return a.intersectAll(b)


@query("set_except", oracle=f"{_ORDERS_SIDE} EXCEPT {_EVENTS_SIDE}")
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _sides(spark, sf_dir)
    return a.subtract(b)


@query("set_except_all", oracle=f"{_ORDERS_SIDE} EXCEPT ALL {_EVENTS_SIDE}")
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (multiplicities subtract)."""
    a, b = _sides(spark, sf_dir)
    return a.exceptAll(b)


@query(
    "set_union_byname",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'finished' AS src
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL BY NAME
    SELECT 'open' AS src, o_totalprice, o_orderkey
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_set_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-independent union (unionByName): the two branches
    project the same columns in DIFFERENT order — a positional UNION
    would silently mis-zip them; by-name matching is the safe default
    when schemas evolve independently (DuckDB: UNION ALL BY NAME)."""
    t = load_tables(spark, sf_dir)
    finished = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice", F.lit("finished").alias("src"))
    )
    open_ = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "O")
        .select(F.lit("open").alias("src"), "o_totalprice", "o_orderkey")
    )
    return finished.unionByName(open_)
