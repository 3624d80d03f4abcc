"""Shared fixtures: one SparkSession per test run + a DuckDB oracle.

The differential harness here mirrors the driver's t2 check
(SURVEY.md §5.1): row-count + schema + order-insensitive value
comparison between each declared Spark query and its DuckDB oracle,
run locally at sf0.001 (override with SPARKALYTICS_TEST_SF) so
failures surface before the driver runs at sf0.01.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_analytics_library_spark.session import get_spark
from pyspark_analytics_library_spark.sources.io import TABLES

TEST_SF_DIR = os.environ.get("SPARKALYTICS_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="sparkalytics-tests", cores=4, shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the fixture tables registered as views."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{TEST_SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def _canon_value(v):
    """Canonicalize one cell for cross-engine multiset comparison."""
    if v is None:
        return None
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v


def canon_rows(df: pd.DataFrame):
    """Sorted multiset of canonicalized rows, columns ordered by name."""
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [
        tuple(_canon_value(v) for v in row) for row in df.itertuples(index=False)
    ]
    return sorted(rows, key=repr)


def assert_query_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    """The t2 mechanism: schema + row-count + order-insensitive values."""
    sdf = spark_df.toPandas()
    odf = con.execute(sql).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"[{name}] schema mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"[{name}] row count: spark={len(sdf)} oracle={len(odf)}"
    srows, orows = canon_rows(sdf), canon_rows(odf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ]
    assert not mismatches, (
        f"[{name}] value mismatch ({len(mismatches)}/{len(srows)} rows); first 3:\n"
        + "\n".join(f"  spark={a}\n  duck ={b}" for _, a, b in mismatches[:3])
    )
