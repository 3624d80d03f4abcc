#!/usr/bin/env python
"""Round-20 probe: breakdown of the lake rows (append / mor / compact)
at sf0.1 — where does the op time go?  Wraps _file_stats (per-file
footer reads), _write_bucketed (write+stats), _masked_scan,
_man_update/_commit_manifest (manifest JSON) with timers.
Read-only: no repo code changed."""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from pyspark_analytics_library_spark.session import get_spark
from pyspark_analytics_library_spark.sources import commit as cm

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="probe_lake")
spark.sparkContext.setLogLevel("ERROR")

acc = {}


def wrap(name, fn):
    def inner(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        dt = time.perf_counter() - t0
        c, s = acc.get(name, (0, 0.0))
        acc[name] = (c + 1, s + dt)
        return out
    return inner


cm._file_stats = wrap("_file_stats", cm._file_stats)
cm._write_bucketed = wrap("_write_bucketed", cm._write_bucketed)
cm._masked_scan = wrap("_masked_scan", cm._masked_scan)
cm._man_update = wrap("_man_update", cm._man_update)
cm._commit_manifest = wrap("_commit_manifest", cm._commit_manifest)
cm._load_manifest = wrap("_load_manifest", cm._load_manifest)
cm._man_entries = wrap("_man_entries", cm._man_entries)
cm._group_listings = wrap("_group_listings", cm._group_listings)

orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
seed = tempfile.mkdtemp(prefix="probe_lake_seed_")
os.rmdir(seed)
cm.table_init(orders, seed, "o_orderkey", n_buckets=64)


def batch():
    return orders.filter(F.col("o_orderkey") % 997 == 0).withColumn(
        "o_orderpriority", F.lit("9-UPDATED")
    ).select(*orders.columns)


def run(ops, label, reps=3):
    best = {}
    for rep in range(reps):
        tgt = tempfile.mkdtemp(prefix="probe_lake_")
        os.rmdir(tgt)
        shutil.copytree(seed, tgt)
        acc.clear()
        times = {}
        t0 = time.perf_counter()
        for op in ops:
            ta = time.perf_counter()
            if op == "append":
                cm.table_append(spark, tgt, batch())
            elif op == "mor":
                cm.table_merge_mor(spark, tgt, batch())
            elif op == "compact":
                cm.table_compact(spark, tgt)
            times[op] = time.perf_counter() - ta
        t_read = time.perf_counter()
        n = cm.table_read(spark, tgt).count()
        times["read"] = time.perf_counter() - t_read
        times["total"] = time.perf_counter() - t0
        shutil.rmtree(tgt, ignore_errors=True)
        if times["total"] < best.get("total", float("inf")):
            best = dict(times)
            best_acc = {k: (c, round(s, 4)) for k, (c, s) in acc.items()}
        print(f"{label} rep{rep}: "
              + " ".join(f"{k}={v:.3f}" for k, v in times.items()),
              f"rows={n}", flush=True)
    print(f"{label} BEST:", {k: round(v, 4) for k, v in best.items()}, flush=True)
    print(f"{label} wrapped (count, sec):", best_acc, flush=True)
    print(flush=True)


run(["append"], "append")
run(["mor"], "mor")
run(["mor", "compact"], "compact")
spark.stop()
