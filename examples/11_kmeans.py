"""Distributed Lloyd k-means over the embeddings table: Arrow-batched
nearest-centroid assignment + distributed centroid update, with only
the k x dim centroid matrix on the driver per iteration — the pattern
for clustering a table too large to sample-train on one machine.

Run:  python examples/11_kmeans.py [sf_dir]
"""
import sys

from pyspark.sql import functions as F

from pyspark_analytics_library_spark import load_tables
from pyspark_analytics_library_spark.operators.similarity import (
    distributed_kmeans_assign,
)


def main(spark, sf_dir):
    e = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
    assigned = distributed_kmeans_assign(e, k=8, iters=5)
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("cluster")
    )


if __name__ == "__main__":
    from pyspark_analytics_library_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(get_spark(cores=4), sf).show()
