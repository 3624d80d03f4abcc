"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All declared queries live in the package registry
(``pyspark_analytics_library_spark.registry``); this file only adapts
that registry to the driver's three-function surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_analytics_library_spark.registry import (
    REGISTRY,
    load_all_query_modules,
    ordered_registry,
)
from pyspark_analytics_library_spark.sources.io import load_tables  # noqa: F401

load_all_query_modules()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return REGISTRY["agg_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered round-robin by operator family so any prefix of this dict
    spans every module (the registration order itself follows import
    order, which cross-module imports distort).
    """
    return {name: spec.fn for name, spec in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return {
        name: spec.oracle
        for name, spec in ordered_registry().items()
        if spec.oracle is not None
    }
