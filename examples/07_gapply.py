"""gapply: per-group pandas transforms (Arrow-batched applyInPandas).

Each group streams through a Python worker as one pandas DataFrame —
the escape hatch for logic built-in expressions can't express.  At
scale the largest single group must fit one worker's memory.

Run:  python examples/07_gapply.py [sf_dir]
"""
import sys

import pandas as pd

from pyspark_analytics_library_spark import gapply, load_tables


def demean(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[["o_orderpriority", "o_orderkey"]].copy()
    out["price_vs_group_mean"] = (
        pdf["o_totalprice"] - pdf["o_totalprice"].mean()
    ).round(4)
    return out


def main(spark, sf_dir):
    orders = load_tables(spark, sf_dir)["orders"]
    return gapply(
        orders,
        keys="o_orderpriority",
        func=demean,
        schema="o_orderpriority string, o_orderkey long, price_vs_group_mean double",
    )


if __name__ == "__main__":
    from pyspark_analytics_library_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(get_spark(cores=4), sf).show()
