"""Quickstart: load the TPC-H-ish tables, run one aggregate, write a
partitioned parquet sink.

Run:  python examples/01_quickstart.py [sf_dir]   (default sf0.001)
"""
import sys
import tempfile

from pyspark.sql import functions as F

from pyspark_analytics_library_spark import load_tables
from pyspark_analytics_library_spark.sources.io import sink_parquet


def main(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    summary = (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )
    # Hive-style layout -> partition pruning on re-read.
    out = tempfile.mkdtemp(prefix="quickstart_") + "/summary"
    sink_parquet(summary, out, partition_by=["l_returnflag"])
    return spark.read.parquet(out)


if __name__ == "__main__":
    from pyspark_analytics_library_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(get_spark(cores=4), sf).show()
