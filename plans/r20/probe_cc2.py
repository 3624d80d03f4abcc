#!/usr/bin/env python
"""Round-20 probe: CC loop step-variant shootout at sf0.1, cap=0.

Variants (all must produce IDENTICAL per-round labels and round count):
  A: current two-join gmin shape (baseline)
  B: explode(ro,c) + single gmin join + groupBy(v)    [phase-1 x2]
  C: explode(ro,c) + window min over k + groupBy(v)   [phase-1 x1, skew risk]
  E: materialize stepped, then B's phase-2 from parquet [2 writes/round]
Equivalence: label'(v) = least(c, g(ro), g(c)) with g'(k)=min(g(k), k[exists])
proven pointwise equal (see OPTIMIZATION_r20.md).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from pyspark.sql import Observation

from pyspark_analytics_library_spark.operators import dedup
from pyspark_analytics_library_spark.session import get_spark
from pyspark_analytics_library_spark.sources.io import load_tables

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="probe_cc2")
spark.sparkContext.setLogLevel("ERROR")

t = load_tables(spark, sf_dir)
d = t["documents"].select("doc_id", "lang", "n_chars")

prev = spark.conf.get("spark.sql.shuffle.partitions")
spark.conf.set("spark.sql.shuffle.partitions", "8")


def build_sym():
    e2 = dedup.candidate_edges(d).select("src", "dst")
    return e2.union(e2.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def run_loop(variant, max_iters=30):
    scratch_root = dedup._iteration_scratch_root(spark)
    sym0 = build_sym()
    t0 = time.perf_counter()
    sym_path = os.path.join(scratch_root, "sym")
    sym0.coalesce(8).write.mode("overwrite").parquet(sym_path)
    sym = spark.read.parquet(sym_path)
    t_sym = time.perf_counter() - t0
    verts_e = sym.select(F.col("src").alias("v")).distinct()
    lab = dedup._cc_checkpoint(
        verts_e.select(F.col("v"), F.col("v").alias("label")), scratch_root, 0
    )

    def phase1(start):
        nb = (
            sym.join(start, sym.src == start.v)
            .groupBy(F.col("dst").alias("nv"))
            .agg(F.min("label").alias("nb_min"))
        )
        return start.join(nb, start.v == F.col("nv"), "left").select(
            "v",
            "base_label",
            F.col("label").alias("round_old"),
            F.least(F.col("label"), F.coalesce("nb_min", "label")).alias("c"),
        )

    def step_A(start):
        stepped = phase1(start)
        gmin = stepped.groupBy(F.col("round_old").alias("l")).agg(
            F.min("c").alias("gm")
        )
        return (
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

    def phase2_B(stepped):
        ex = stepped.select(
            "v", "base_label", "c",
            F.explode(F.array("round_old", "c")).alias("k"),
        )
        g = ex.groupBy("k").agg(F.min("c").alias("gm"))
        return (
            ex.join(g, "k")
            .groupBy("v")
            .agg(
                F.min(F.least(F.col("c"), F.col("gm"))).alias("label"),
                F.min("base_label").alias("base_label"),
            )
        )

    def step_B(start):
        return phase2_B(phase1(start))

    def step_C(start):
        stepped = phase1(start)
        ex = stepped.select(
            "v", "base_label", "c",
            F.explode(F.array("round_old", "c")).alias("k"),
        )
        wk = Window.partitionBy("k")
        ex = ex.withColumn("gm", F.min("c").over(wk))
        return ex.groupBy("v").agg(
            F.min(F.least(F.col("c"), F.col("gm"))).alias("label"),
            F.min("base_label").alias("base_label"),
        )

    step = {"A": step_A, "B": step_B, "C": step_C}.get(variant)
    rounds = []
    changed = 0
    for round_no in range(1, max_iters + 1):
        tr = time.perf_counter()
        start = lab.select("v", "label", F.col("label").alias("base_label"))
        if variant == "E":
            sp = os.path.join(scratch_root, f"stepped_{round_no}")
            phase1(start).write.mode("overwrite").parquet(sp)
            once = phase2_B(spark.read.parquet(sp))
        else:
            once = step(start)
        obs = Observation()
        observed = once.select(
            "v", F.col("base_label").alias("old_label"), "label"
        ).observe(
            obs,
            F.sum((F.col("label") != F.col("old_label")).cast("long")).alias("changed"),
        )
        chk = dedup._cc_checkpoint(observed, scratch_root, round_no)
        if variant == "E":
            dedup._fs_delete(spark, os.path.join(scratch_root, f"stepped_{round_no}"))
        changed = obs.get["changed"] or 0
        lab = chk.select("v", "label")
        rounds.append(round(time.perf_counter() - tr, 3))
        if changed == 0:
            break
    labels = sorted((r["v"], r["label"]) for r in lab.collect())
    dedup._fs_delete(spark, scratch_root)
    total = time.perf_counter() - t0
    return labels, rounds, round(t_sym, 3), round(total, 3)


ref = None
for variant in ("A", "B", "C", "E", "A", "B", "C", "E"):
    labels, rounds, t_sym, total = run_loop(variant)
    if ref is None:
        ref = labels
    print(f"{variant}: total={total} sym={t_sym} n_rounds={len(rounds)} "
          f"rounds={rounds} labels_match={labels == ref}", flush=True)

spark.conf.set("spark.sql.shuffle.partitions", prev)
spark.stop()
