"""Window helpers: top-k rows per group and lag/lead neighbors.

Run:  python examples/02_windows.py [sf_dir]
"""
import sys

from pyspark.sql import functions as F

from pyspark_analytics_library_spark import lag_lead, load_tables, topk_per_group


def main(spark, sf_dir):
    orders = load_tables(spark, sf_dir)["orders"]
    # Top 3 orders by price per priority; unique key appended for a
    # total order (deterministic across engines).
    top3 = topk_per_group(
        orders,
        keys="o_orderpriority",
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    # Each customer's previous/next order value in date order.
    return lag_lead(
        top3, keys="o_custkey", order=["o_orderdate", "o_orderkey"], value="o_totalprice"
    ).select("o_orderpriority", "rn", "o_orderkey", "o_totalprice", "lag_value", "lead_value")


if __name__ == "__main__":
    from pyspark_analytics_library_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(get_spark(cores=4), sf).show()
