"""Structured Streaming: watermarked tumbling-window counts over the
events fixture replayed through a file source (availableNow trigger —
the same incremental plan a production backfill runs).

Run:  python examples/09_streaming.py [sf_dir]
"""
import sys

from pyspark.sql import functions as F

from pyspark_analytics_library_spark.streaming.stream_queries import (
    run_to_memory,
    stream_events,
)


def main(spark, sf_dir):
    ev = stream_events(spark, sf_dir).withWatermark("ts", "10 minutes")
    windowed = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    name, session = run_to_memory(windowed, "complete")
    return session.table(name)


if __name__ == "__main__":
    from pyspark_analytics_library_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(get_spark(cores=4), sf).show()
