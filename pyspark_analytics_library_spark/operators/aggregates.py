"""Aggregation operators (SURVEY.md §2.4).

Capability parity: the reference's aggregation surface (snapshot empty —
SURVEY.md §0.1; §2.4 is the contract).  All aggregates are expressed as
native ``pyspark.sql.functions`` so they execute as Tungsten hash
aggregates with map-side partial aggregation — at 100 TB each groupBy
here shuffles only the partially-aggregated per-key state, not rows.

Oracle-parity discipline (SURVEY.md §5.3): every double aggregate is
ROUND()ed identically on both engines; integer sums are cast to BIGINT
on the DuckDB side (DuckDB widens SUM(int) to HUGEINT, which its pandas
bridge then renders as float64).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_analytics_library_spark.registry import query
from pyspark_analytics_library_spark.sources.io import load_tables


def _r(col: Column | str, scale: int = 4) -> Column:
    """Round a double column for cross-engine comparison (SURVEY.md §5.3.2)."""
    return F.round(col, scale)


# ---------------------------------------------------------------------------
# agg_pricing_summary — TPC-H Q1 shape; the flagship `entry()` query.
# ---------------------------------------------------------------------------


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """Filter → groupBy(returnflag, linestatus) → 8 aggregates → sort.

    The filter lands in the Parquet scan (PushedFilters) and the two
    low-cardinality group keys make the shuffle tiny after map-side
    partial aggregation — this shape scales linearly with input size.
    """
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity")).alias("sum_qty"),
            _r(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_price"
            ),
            _r(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            _r(F.avg("l_quantity")).alias("avg_qty"),
            _r(F.avg("l_extendedprice")).alias("avg_price"),
            _r(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        ROUND(SUM(l_quantity), 4)                                          AS sum_qty,
        ROUND(SUM(l_extendedprice), 4)                                     AS sum_base_price,
        ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)                  AS sum_disc_price,
        ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)    AS sum_charge,
        ROUND(AVG(l_quantity), 4)                                          AS avg_qty,
        ROUND(AVG(l_extendedprice), 4)                                     AS avg_price,
        ROUND(AVG(l_discount), 4)                                          AS avg_disc,
        COUNT(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return pricing_summary(t["lineitem"])
