"""Dedup: exact duplicate removal with a deterministic keeper, then
MinHash-LSH near-duplicate pairs on the same corpus.

Run:  python examples/04_dedup.py [sf_dir]
"""
import sys

from pyspark.sql import functions as F

from pyspark_analytics_library_spark import (
    dedup_exact_keep_min,
    load_tables,
    minhash_lsh_pairs,
)


def main(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    # Exact: one hash aggregate (map-side combinable), keeper = min doc_id.
    exact = dedup_exact_keep_min(
        docs.withColumn("content_hash", F.sha2("text", 256)),
        group_cols=["content_hash"],
        order_col="doc_id",
    )
    # Fuzzy: shingle -> minhash -> band -> bucket-join; never all-pairs.
    pairs = minhash_lsh_pairs(docs, id_col="doc_id", text_col="text")
    return exact.agg(F.count("*").alias("n_unique_docs")).crossJoin(
        pairs.agg(F.count("*").alias("n_near_dup_pairs"))
    )


if __name__ == "__main__":
    from pyspark_analytics_library_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(get_spark(cores=4), sf).show()
