"""Crash-safety and NULL-key semantics for the merge sinks
(VERDICT r13 #4 and #7).

The staged-write tests simulate a mid-write failure with a frame that
raises during execution: the PREVIOUS target must stay byte-readable
and no staging residue may survive the error path.  The NULL-key tests
pin the window-merge semantics the docstrings document — Spark windows
group NULL as one ordinary key, so NULL-key rows collapse into a
single merge group — because at 100 TB a silent NULL-collapse is a
data-loss bug if the caller expected per-row survival.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspark_analytics_library_spark.sources.scan_queries import (
    _insert_key_offset,
    _staged_overwrite,
    scd1_merged,
    scd2_history,
)


def _residue(target: str) -> list[str]:
    parent, leaf = os.path.dirname(target), os.path.basename(target)
    return [
        f
        for f in os.listdir(parent)
        if f.startswith(leaf + ".staging-") or f.startswith(leaf + ".old-")
    ]


def test_staged_overwrite_preserves_target_on_write_failure(spark, tmp_path):
    target = str(tmp_path / "live_table")
    _staged_overwrite(spark.range(5).select(F.col("id").alias("k")), target)
    before = sorted(r["k"] for r in spark.read.parquet(target).collect())
    assert before == [0, 1, 2, 3, 4]

    # assert_true raises DURING the staging write — the data-sized
    # window where a real mid-job crash lands.
    bad = spark.range(5).select(
        F.assert_true(F.col("id") < 0).alias("x"), F.col("id").alias("k")
    )
    with pytest.raises(Exception):
        _staged_overwrite(bad, target)

    after = sorted(r["k"] for r in spark.read.parquet(target).collect())
    assert after == before, "failed write corrupted the live target"
    assert _residue(target) == [], "error path left staging/backup residue"


def test_staged_overwrite_swaps_and_cleans(spark, tmp_path):
    target = str(tmp_path / "live_table")
    _staged_overwrite(spark.range(3).select(F.col("id").alias("k")), target)
    _staged_overwrite(
        spark.range(10, 14).select(F.col("id").alias("k")), target
    )
    got = sorted(r["k"] for r in spark.read.parquet(target).collect())
    assert got == [10, 11, 12, 13], "swap did not install the new table"
    assert _residue(target) == [], "successful swap left staging/backup residue"


def test_staged_overwrite_simulated_stale_staging_is_ignored(spark, tmp_path):
    """A staging dir orphaned by a hard crash (no error path ran) must
    not shadow or corrupt the target: later overwrites use fresh uuid
    leaves and the janitor reclaims the orphan with the pid dir."""
    target = str(tmp_path / "live_table")
    _staged_overwrite(spark.range(2).select(F.col("id").alias("k")), target)
    orphan = target + ".staging-deadbeef"
    os.makedirs(orphan)
    (tmp_path / "live_table.staging-deadbeef" / "part-junk").write_bytes(b"\x00")
    _staged_overwrite(spark.range(7, 9).select(F.col("id").alias("k")), target)
    got = sorted(r["k"] for r in spark.read.parquet(target).collect())
    assert got == [7, 8]
    assert os.path.isdir(orphan), "unrelated orphan must be left to the janitor"


def test_merge_target_never_clears_existing_content():
    """_merge_target is the crash-safety PRECONDITION: unlike _scratch
    it must NOT rmtree an existing target — a revert to _scratch would
    clear the live table before the staged write even starts,
    silently reopening exactly the window _staged_overwrite closes."""
    from pyspark_analytics_library_spark.sources.scan_queries import _merge_target

    path = _merge_target("pin_merge_target")
    os.makedirs(path, exist_ok=True)
    marker = os.path.join(path, "live-file")
    with open(marker, "w") as f:
        f.write("x")
    try:
        again = _merge_target("pin_merge_target")
        assert again == path
        assert os.path.exists(marker), "_merge_target cleared the live target"
    finally:
        import shutil

        shutil.rmtree(path, ignore_errors=True)


def test_scd1_null_keys_collapse_to_single_survivor(spark):
    """Window.partitionBy groups NULL as ONE key: all NULL-key rows form
    a single merge group and exactly one row survives — the update row,
    by priority.  Documented on scd1_merged; a production merge filters
    or surrogates NULL keys upstream."""
    base = spark.createDataFrame(
        [(1, "a"), (None, "b"), (None, "c")], "o_orderkey long, payload string"
    )
    updates = spark.createDataFrame(
        [(None, "u")], "o_orderkey long, payload string"
    )
    got = {
        (r["o_orderkey"], r["payload"]) for r in scd1_merged(base, updates).collect()
    }
    assert got == {(1, "a"), (None, "u")}


def test_scd2_null_key_base_rows_stay_open(spark):
    """NULL % k is NULL, so the derived update batch never contains a
    NULL key — the NULL base row passes through open (is_current true,
    valid_to NULL), mirroring SQL MERGE where NULL never equi-matches."""
    orders = spark.createDataFrame(
        [(97, "O", 10.0), (None, "O", 20.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    rows = {r["o_orderkey"]: r for r in scd2_history(orders).collect()
            if r["o_orderkey"] is None or r["o_orderkey"] == 97}
    null_row = rows[None]
    assert null_row["is_current"] is True and null_row["valid_to"] is None
    k97 = [r for r in scd2_history(orders).collect() if r["o_orderkey"] == 97]
    assert {r["is_current"] for r in k97} == {True, False}, "sanity: 97 was merged"


def test_insert_key_offset_floors_at_fixture_scale_and_grows_past_it(spark):
    """Fixture SFs (max key ≪ 1e8) keep the historical 1e8 offset —
    committed attestations stay bit-identical — while a key domain at
    or above 1e8 gets the next power of 10 (collision-free at any SF,
    ADVICE r13)."""
    small = spark.createDataFrame([(60_000,)], "o_orderkey long")
    assert _insert_key_offset(small) == 100_000_000
    big = spark.createDataFrame([(2_340_000_000,)], "o_orderkey long")
    assert _insert_key_offset(big) == 10_000_000_000
    edge = spark.createDataFrame([(99_999_999,)], "o_orderkey long")
    assert _insert_key_offset(edge) == 100_000_000
