"""End-to-end fuzzy dedup as ONE plan: MinHash-LSH candidate pairs ->
connected components (transitivity merges pair chains into groups) ->
min-id keeper per component -> per-language yield accounting.

This is the seam a real corpus-dedup run exercises; the declared query
`pipeline_fuzzy_dedup` (operators/pipeline.py) wraps the same chain.

Run:  python examples/10_fuzzy_dedup_pipeline.py [sf_dir]
"""
import sys

from pyspark.sql import functions as F

from pyspark_analytics_library_spark import (
    connected_components,
    load_tables,
    minhash_lsh_pairs,
)


def main(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text", "lang")
    pairs = minhash_lsh_pairs(docs)  # bucketed equi-join, never all-pairs
    lab = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        docs.select(F.col("doc_id").alias("v")),
    )
    labeled = docs.select("doc_id", "lang").join(lab, F.col("doc_id") == F.col("v"))
    kept = F.sum(F.when(F.col("doc_id") == F.col("label"), 1).otherwise(0))
    return (
        labeled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            kept.alias("n_kept"),
            (F.count(F.lit(1)) - kept).alias("n_removed"),
        )
        .orderBy("lang")
    )


if __name__ == "__main__":
    from pyspark_analytics_library_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(get_spark(cores=4), sf).show()
