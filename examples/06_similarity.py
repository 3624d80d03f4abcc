"""Similarity search: broadcast-index exact top-k over the embeddings
table (the guarded small-n path; IVF/LSH are the sharded scale paths).

Run:  python examples/06_similarity.py [sf_dir]
"""
import sys

from pyspark.sql import functions as F

from pyspark_analytics_library_spark import brute_topk, build_index, load_tables


def main(spark, sf_dir):
    e = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
    # Eagerly size-guarded: raises IndexTooLargeError (pointing at the
    # sharded paths) BEFORE collecting if rows x dims x 8B > 2 GiB.
    index = build_index(spark, e)
    top5 = brute_topk(e, index, k=5)
    return top5.groupBy("rn").agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg("cos"), 4).alias("avg_cos_at_rank"),
    )


if __name__ == "__main__":
    from pyspark_analytics_library_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(get_spark(cores=4), sf).show()
