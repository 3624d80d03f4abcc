#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Method mirrors BASELINE.md: 1 warm-up collect per query, then 3 timed
collects, best-of-3 reported; SparkSession startup excluded.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_analytics_library_spark.registry import REGISTRY, load_all_query_modules
from pyspark_analytics_library_spark.session import get_spark

#: bench name (BASELINE.md row) → registry query
HEADLINE = {
    "pricing_summary": "agg_pricing_summary",
    "star_join_revenue": "join_inner_star",
    "window_topk": "win_topk_per_group",
    "distinct_agg": "agg_distinct",
    "sessionize_batch": "ts_session_stats",
    "text_wordcount": "text_wordcount",
    "dedup_exact": "dedup_exact",
    "similarity_topk": "sim_topk_exact",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    load_all_query_modules()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for bench_name, qname in HEADLINE.items():
        # BASELINE.md method: build the DataFrame once, 1 warm-up
        # collect, then 3 timed collects of the same plan (plan-build
        # py4j chatter excluded on both sides).
        df = REGISTRY[qname].fn(spark, sf_dir)
        rows[bench_name] = len(df.collect())  # warm-up
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.collect()
            best = min(best, time.perf_counter() - t0)
        timings[bench_name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "suite_total_warm_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "rows": rows,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
