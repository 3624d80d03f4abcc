"""Time series: gap-based sessionization + tumbling-window rollup of
the events table.

Run:  python examples/03_sessionize.py [sf_dir]
"""
import sys

from pyspark.sql import functions as F

from pyspark_analytics_library_spark import load_tables, sessionize, tumbling_agg


def main(spark, sf_dir):
    events = load_tables(spark, sf_dir)["events"]
    # 30-minute-gap sessions per user (one shuffle, running-frame cumsum).
    sessions = sessionize(events, user="user_id", ts="ts", unique="event_id")
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )
    # Hourly event volume per event type (epoch-aligned buckets).
    hourly = tumbling_agg(events, ts="ts", keys="event_type", window="1 hour")
    return per_session.agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
    ).crossJoin(hourly.agg(F.count("*").alias("n_hourly_buckets")))


if __name__ == "__main__":
    from pyspark_analytics_library_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(get_spark(cores=4), sf).show()
