#!/usr/bin/env python
"""Round-20 probe: per-round breakdown of the distributed CC loop
(cc_distributed bench row) at sf0.1.  Monkeypatches _cc_checkpoint to
time each round's single job, and times the sym materialization and
the dispatch separately.  Read-only: no repo code changed."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from pyspark_analytics_library_spark.operators import dedup
from pyspark_analytics_library_spark.session import get_spark
from pyspark_analytics_library_spark.sources.io import load_tables

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="probe_cc")
spark.sparkContext.setLogLevel("ERROR")

t = load_tables(spark, sf_dir)
d = t["documents"].select("doc_id", "lang", "n_chars")
verts = d.select(F.col("doc_id").alias("v"))
spark.conf.set("spark.analytics.cc.driverUnionFindMaxEdges", "0")

orig_ckpt = dedup._cc_checkpoint
rounds = []


def timed_ckpt(df, scratch_root, round_no):
    t0 = time.perf_counter()
    out = orig_ckpt(df, scratch_root, round_no)
    rounds.append((round_no, time.perf_counter() - t0))
    return out


dedup._cc_checkpoint = timed_ckpt

# warm-up once
edges = dedup.candidate_edges(d)
lab = dedup.connected_components(edges, verts)
n = lab.groupBy().agg(F.count(F.lit(1)).alias("n"),
                      F.countDistinct("label").alias("nc")).collect()
print("warm-up result:", n, flush=True)
print("warm-up rounds:", [(r, round(s, 3)) for r, s in rounds], flush=True)

# timed run
rounds.clear()
t0 = time.perf_counter()
edges = dedup.candidate_edges(d)
lab = dedup.connected_components(edges, verts)
res = lab.groupBy().agg(F.count(F.lit(1)).alias("n"),
                        F.countDistinct("label").alias("nc")).collect()
total = time.perf_counter() - t0
print("result:", res, flush=True)
print("rounds:", [(r, round(s, 3)) for r, s in rounds], flush=True)
print("round-0 (init write):", round(rounds[0][1], 3) if rounds else None)
print("total:", round(total, 3), flush=True)

# capture one round's lazy plan: rebuild sym as the loop does and explain step
scratch_root = dedup._iteration_scratch_root(spark)
sym_path = os.path.join(scratch_root, "sym")
e2 = dedup.candidate_edges(d).select("src", "dst")
sym = e2.union(e2.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
sym.coalesce(8).write.mode("overwrite").parquet(sym_path)
sym = spark.read.parquet(sym_path)
verts_e = sym.select(F.col("src").alias("v")).distinct()
lab0_path = os.path.join(scratch_root, "round_0")
verts_e.select(F.col("v"), F.col("v").alias("label")).coalesce(4).write.mode(
    "overwrite"
).parquet(lab0_path)
lab0 = spark.read.parquet(lab0_path)

start = lab0.select("v", "label", F.col("label").alias("base_label"))
nb = (
    sym.join(start, sym.src == start.v)
    .groupBy(F.col("dst").alias("nv"))
    .agg(F.min("label").alias("nb_min"))
)
stepped = start.join(nb, start.v == F.col("nv"), "left").select(
    "v",
    "base_label",
    F.col("label").alias("round_old"),
    F.least(F.col("label"), F.coalesce("nb_min", "label")).alias("c"),
)
gmin = stepped.groupBy(F.col("round_old").alias("l")).agg(F.min("c").alias("gm"))
once = (
    stepped.join(gmin, stepped.round_old == gmin.l, "left")
    .select("v", "base_label", "c", F.col("gm").alias("gm_old"))
    .join(
        gmin.select(F.col("l").alias("l2"), F.col("gm").alias("gm_c")),
        F.col("c") == F.col("l2"),
        "left",
    )
    .select(
        "v",
        F.least(
            F.col("c"), F.coalesce("gm_old", "c"), F.coalesce("gm_c", "c")
        ).alias("label"),
        "base_label",
    )
)
with open("/root/repo/plans/r20/cc_round_step_before.txt", "w") as f:
    f.write(once._sc._jvm.PythonSQLUtils.explainString(
        once._jdf.queryExecution(), "formatted"))
print("wrote plans/r20/cc_round_step_before.txt", flush=True)
dedup._fs_delete(spark, scratch_root)
spark.stop()
