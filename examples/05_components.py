"""Connected components: turn near-dup PAIRS into dedup GROUPS, then
reclaim the loop's scratch storage.

Run:  python examples/05_components.py [sf_dir]
"""
import sys

from pyspark.sql import functions as F

from pyspark_analytics_library_spark import (
    load_tables,
    minhash_lsh_pairs,
    reclaim_iteration_scratch,
)
from pyspark_analytics_library_spark.operators.dedup import connected_components


def main(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    edges = minhash_lsh_pairs(docs, verify_threshold=0.2).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    verts = docs.select(F.col("doc_id").alias("v"))
    # O(log d) group-min rounds; per-round parquet checkpoints.
    labels = connected_components(edges, verts)
    groups = labels.groupBy("label").agg(F.count("*").alias("group_size"))
    result = groups.agg(
        F.count("*").alias("n_components"),
        F.max("group_size").alias("largest_group"),
    )
    result.collect()  # materialize before reclaiming the backing scratch
    reclaim_iteration_scratch(spark, keep_latest=True)
    return result


if __name__ == "__main__":
    from pyspark_analytics_library_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(get_spark(cores=4), sf).show()
