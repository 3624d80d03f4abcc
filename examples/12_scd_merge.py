"""Parquet-native MERGE patterns without a lakehouse format: SCD-1
(updates win) via priority-union + keeper-window, and SCD-2 (history
preserved) via a close-out window — both ONE shuffle on the merge key,
no join.  At scale, pair with key-bucketed partitioning + dynamic
partition overwrite so a small batch rewrites only touched partitions
(measured in SCALE.md round-13: 3 of 64 buckets → ~5× faster than the
full-table merge, untouched partitions byte-stable).

Run:  python examples/12_scd_merge.py [sf_dir]
"""
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_analytics_library_spark import load_tables


def main(spark, sf_dir):
    orders = load_tables(spark, sf_dir)["orders"]
    eff = F.lit("1998-12-01").cast("date")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice").withColumn(
        "valid_from", F.lit("1990-01-01").cast("date")
    )
    updates = base.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        eff.alias("valid_from"),
    )

    # SCD-2: keep BOTH rows for an updated key — the old version closed
    # out, the new one open-ended.  max(is_update) over the key marks
    # superseded base rows; everything else is CASE expressions.
    tagged = base.withColumn("_src", F.lit("b")).unionByName(
        updates.withColumn("_src", F.lit("u"))
    )
    has_upd = F.max((F.col("_src") == "u").cast("int")).over(
        Window.partitionBy("o_orderkey")
    )
    superseded = (F.col("_src") == "b") & (has_upd == 1)
    history = tagged.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "valid_from",
        F.when(superseded, eff).alias("valid_to"),
        (~superseded).alias("is_current"),
    )
    return (
        history.groupBy("is_current")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("valid_to").isNotNull().cast("int")).alias("n_closed"),
        )
        .orderBy("is_current")
    )


if __name__ == "__main__":
    from pyspark_analytics_library_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(get_spark(cores=4), sf).show()
