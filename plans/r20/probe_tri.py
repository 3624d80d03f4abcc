#!/usr/bin/env python
"""Round-20 probe: triangles_sparse phase breakdown at sf0.1 —
replicates triangle_census's sparse branch with per-phase timers.
Read-only: no repo code changed."""
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from pyspark_analytics_library_spark.operators.dedup import (
    _fs_delete,
    _iteration_scratch_root,
)
from pyspark_analytics_library_spark.operators.graph import (
    _sparse_triangle_sum_frame,
    co_occurrence_edges,
)
from pyspark_analytics_library_spark.session import get_spark
from pyspark_analytics_library_spark.sources.io import load_tables

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="probe_tri")
spark.sparkContext.setLogLevel("ERROR")

orders = load_tables(spark, sf_dir)["orders"]


def run(tag):
    t = {}
    t0 = time.perf_counter()
    edges0 = co_occurrence_edges(
        orders, "o_custkey", [F.col("o_orderdate"), F.col("o_orderpriority")]
    )
    scratch = _iteration_scratch_root(spark)
    edges_path = os.path.join(scratch, "edges")
    edges0.write.mode("overwrite").parquet(edges_path)
    edges = spark.read.parquet(edges_path)
    t["edges_write"] = time.perf_counter() - t0

    t1 = time.perf_counter()
    ends = edges.select(F.explode(F.array("u", "v")).alias("node"))
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    deg_pd = deg.toPandas()
    t["degree_toPandas"] = time.perf_counter() - t1

    n_vertices = len(deg_pd)
    m_edges = int(deg_pd["d"].sum()) // 2

    t2 = time.perf_counter()
    deg_local = spark.createDataFrame(deg_pd)
    ed = (
        edges.join(F.broadcast(deg_local.select(F.col("node").alias("u"), F.col("d").alias("du"))), "u")
        .join(F.broadcast(deg_local.select(F.col("node").alias("v"), F.col("d").alias("dv"))), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    e_dir_path = os.path.join(scratch, "e_dir")
    ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).write.mode("overwrite").parquet(e_dir_path)
    t["e_dir_write"] = time.perf_counter() - t2

    t3 = time.perf_counter()
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    e_dir = spark.read.parquet(e_dir_path).repartition(shuffle_n)
    nbrs = e_dir.groupBy("src").agg(F.collect_set("dst").alias("nb"))
    tri = _sparse_triangle_sum_frame(e_dir, nbrs, True, edges.schema["v"].dataType)
    tcount = int(tri.collect()[0]["t"] or 0)
    t["intersection"] = time.perf_counter() - t3
    _fs_delete(spark, scratch)
    t["total"] = time.perf_counter() - t0
    print(f"{tag}: n={n_vertices} m={m_edges} t={tcount}",
          {k: round(v, 3) for k, v in t.items()}, flush=True)


run("warm-up")
run("run1")
run("run2")
spark.stop()
