"""Text analysis: tokenization + corpus word counts, all JVM-side
expressions (split/explode) — no Python UDF in the hot path.

Run:  python examples/08_text.py [sf_dir]
"""
import sys

from pyspark.sql import functions as F

from pyspark_analytics_library_spark import load_tables, tokenize


def main(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select(F.explode(tokenize("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(10)
    )


if __name__ == "__main__":
    from pyspark_analytics_library_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(get_spark(cores=4), sf).show()
