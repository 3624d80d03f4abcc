#!/usr/bin/env python
"""Round-20 probe: (a) fuzzy-minhash plan — is the shingle-side
exchange reused between the two verify joins?  (b) triangles_sparse
phase breakdown.  (c) dedup_connected_components plan+timing with and
without the explicit broadcast hint (ADVICE r19 #3).  Read-only."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from pyspark_analytics_library_spark.registry import REGISTRY, load_all_query_modules
from pyspark_analytics_library_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
load_all_query_modules()
spark = get_spark(app_name="probe_misc")
spark.sparkContext.setLogLevel("ERROR")


def explain(df, path):
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df.queryExecution(), "formatted"
    ) if hasattr(df, "queryExecution") else None
    if s is None:
        s = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    with open(path, "w") as f:
        f.write(s)
    return s


def noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# (a) fuzzy minhash pairs plan
pairs = REGISTRY["dedup_fuzzy_minhash"].fn(spark, sf_dir)
s = explain(pairs, "/root/repo/plans/r20/dedup_fuzzy_minhash_before.txt")
print("minhash plan: Exchange:", s.count("Exchange"),
      "ReusedExchange:", s.count("ReusedExchange"),
      "HashAggregate:", s.count("HashAggregate"), flush=True)
for _ in range(2):
    print("pairs noop:", round(noop(pairs), 3), flush=True)

# shingle-build-only cost for reference
from pyspark_analytics_library_spark.operators.dedup import word_shingles
from pyspark_analytics_library_spark.sources.io import load_tables
docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text", "lang")
shingled = docs.select(
    F.col("doc_id"), word_shingles(F.col("text")).alias("shingles")
).filter(F.size("shingles") > 0)
for _ in range(2):
    print("shingled noop:", round(noop(shingled), 3), flush=True)

# (c) dedup_connected_components with/without broadcast hint
q = REGISTRY["dedup_connected_components"].fn(spark, sf_dir)
explain(q, "/root/repo/plans/r20/dedup_connected_components_before.txt")
for _ in range(3):
    t0 = time.perf_counter(); q.collect(); print("dcc broadcast-hint:", round(time.perf_counter() - t0, 4), flush=True)

# variant without the hint (AQE should still broadcast at runtime)
d = load_tables(spark, sf_dir)["documents"].select("doc_id", "lang", "n_chars")
from pyspark.sql import Window
clean = d.filter(F.col("lang").isNotNull() & F.col("n_chars").isNotNull())
per_val = clean.groupBy("lang", "n_chars").agg(F.min("doc_id").alias("val_min"))
w = Window.partitionBy("lang").orderBy("n_chars")
seg = per_val.withColumn(
    "seg",
    F.sum(F.when(F.col("n_chars") - F.lag("n_chars").over(w) > 2, 1).otherwise(0)).over(w),
)
mapping = seg.withColumn(
    "component", F.min("val_min").over(Window.partitionBy("lang", "seg"))
).select("lang", "n_chars", "component")
q2 = (
    d.join(mapping, ["lang", "n_chars"], "left")
    .select("doc_id", F.coalesce("component", F.col("doc_id")).alias("component"))
    .orderBy("doc_id")
)
for _ in range(3):
    t0 = time.perf_counter(); q2.collect(); print("dcc no-hint:", round(time.perf_counter() - t0, 4), flush=True)
s2 = explain(q2, "/root/repo/plans/r20/dedup_connected_components_nohint.txt")
print("no-hint plan BroadcastHashJoin:", s2.count("BroadcastHashJoin"),
      "SortMergeJoin:", s2.count("SortMergeJoin"), flush=True)
r1 = sorted(map(tuple, q.collect()))
r2 = sorted(map(tuple, q2.collect()))
print("no-hint rows identical:", r1 == r2, flush=True)

spark.stop()
