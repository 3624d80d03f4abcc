"""Batch-parity self-checks for the streaming queries (SURVEY.md §2.11):
each streaming result is compared against the same logic run in batch
mode — the strongest check available without a streaming oracle.
"""

from __future__ import annotations

from hypothesis import given as hyp_given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyspark_analytics_library_spark.registry import REGISTRY, load_all_query_modules
from pyspark_analytics_library_spark.sources.io import load_tables
from tests.conftest import TEST_SF_DIR

load_all_query_modules()


def _split_parity(stream, expect="full-parity"):
    """Every rows-only streaming query carries the attestation column
    (VERDICT r13 #6); since ADVICE r14 its VALUE names the check kind,
    so a green row can't overclaim full parity when only a weaker
    watermark-drop/event-count check ran.  Peel it off for the tuple
    compare and assert the expected kind was stamped uniformly."""
    vals = {r["selfcheck"] for r in stream.select("selfcheck").distinct().collect()}
    assert vals == {expect}, f"selfcheck not uniformly {expect!r}: {vals}"
    return stream.drop("selfcheck")


def test_stream_tumbling_matches_batch(spark):
    stream = _split_parity(REGISTRY["stream_tumbling"].fn(spark, TEST_SF_DIR))
    batch = (
        load_tables(spark, TEST_SF_DIR)["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    assert sorted(map(tuple, stream.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_sliding_matches_batch(spark):
    stream = _split_parity(REGISTRY["stream_sliding"].fn(spark, TEST_SF_DIR))
    batch = (
        load_tables(spark, TEST_SF_DIR)["events"]
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )
    assert sorted(map(tuple, stream.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_session_total_events_preserved(spark):
    stream = _split_parity(REGISTRY["stream_session"].fn(spark, TEST_SF_DIR))
    n_events = load_tables(spark, TEST_SF_DIR)["events"].count()
    assert stream.agg(F.sum("n_events")).collect()[0][0] == n_events


def test_stream_late_data_drops_rows(spark):
    """APPEND mode + advanced watermark must drop the late file's rows."""
    stream = _split_parity(
        REGISTRY["stream_late_data"].fn(spark, TEST_SF_DIR), expect="watermark-drop"
    )
    counted = stream.agg(F.sum("n_events")).collect()[0][0] or 0
    total = load_tables(spark, TEST_SF_DIR)["events"].count()
    assert counted < total, f"late rows were not dropped ({counted} vs {total})"
    assert counted > 0


def test_stream_dedup_collapses_duplicates(spark):
    stream = _split_parity(REGISTRY["stream_dedup"].fn(spark, TEST_SF_DIR))
    batch = (
        load_tables(spark, TEST_SF_DIR)["events"]
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert sorted(map(tuple, stream.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_stateful_matches_batch_totals(spark):
    stream = _split_parity(
        REGISTRY["stream_stateful"].fn(spark, TEST_SF_DIR), expect="event-count"
    )
    batch = (
        load_tables(spark, TEST_SF_DIR)["events"]
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    s = {r["user_id"]: (r["n_events"], r["total_value"]) for r in stream.collect()}
    b = {r["user_id"]: (r["n_events"], r["total_value"]) for r in batch.collect()}
    assert set(s) == set(b)
    for uid, (n, _) in b.items():
        assert s[uid][0] == n, (uid, s[uid], (n, _))
        # totals accumulate float-sequentially across batches; compare loosely
        assert abs(s[uid][1] - b[uid][1]) < 1e-6


def test_stream_sink_covers_all_events(spark):
    stream = _split_parity(
        REGISTRY["stream_sink"].fn(spark, TEST_SF_DIR), expect="event-count"
    )
    total = stream.agg(F.sum("n")).collect()[0][0]
    assert total == load_tables(spark, TEST_SF_DIR)["events"].count()


def test_stream_static_join_matches_batch(spark):
    stream = _split_parity(REGISTRY["stream_static_join"].fn(spark, TEST_SF_DIR))
    ev = load_tables(spark, TEST_SF_DIR)["events"]
    static = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("lifetime_events"))
    batch = (
        ev.join(static, "user_id")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("lifetime_events").alias("max_lifetime"),
        )
    )
    assert sorted(map(tuple, stream.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_stream_join_matches_batch(spark):
    stream = _split_parity(REGISTRY["stream_stream_join"].fn(spark, TEST_SF_DIR))
    ev = load_tables(spark, TEST_SF_DIR)["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    batch = (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_click_purchase_pairs"))
    )
    assert sorted(map(tuple, stream.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_foreach_batch_matches_batch_totals(spark):
    """foreachBatch appends per-micro-batch aggregates; re-aggregating
    them must reproduce the plain batch totals regardless of how many
    micro-batches the source emitted."""
    stream = _split_parity(
        REGISTRY["stream_foreach_batch"].fn(spark, TEST_SF_DIR), expect="event-count"
    )
    batch = (
        load_tables(spark, TEST_SF_DIR)["events"]
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("event_type")
    )
    got = [(r["event_type"], r["n_events"], round(r["total_value"], 3)) for r in stream.collect()]
    want = [(r["event_type"], r["n_events"], round(r["total_value"], 3)) for r in batch.collect()]
    assert got == want


def test_parity_check_skips_past_the_cap(spark):
    """_assert_stream_matches_batch must SKIP (not collect-and-compare,
    not raise) when the result exceeds _PARITY_CAP — the check attests
    fixture-scale semantics and must never pull an input-scaled result
    through the driver of a production job."""
    from pyspark.sql import functions as F

    from pyspark_analytics_library_spark.streaming.stream_queries import (
        _PARITY_CAP,
        _assert_stream_matches_batch,
    )

    import pytest as _pytest

    # BOTH sides past the cap: skip (fixture-scale attestation only) —
    # even though the ranges differ beyond the cap
    big = spark.range(_PARITY_CAP + 10).select(F.col("id"))
    bigger = spark.range(_PARITY_CAP + 20).select(F.col("id"))
    _assert_stream_matches_batch(big, bigger, "cap-probe-both")

    # exactly ONE side past the cap: the cardinalities provably differ
    # (≤cap vs >cap), so this must RAISE — in both directions — without
    # quoting the truncated collect as a real count
    other = spark.range(5).select(F.col("id"))
    with _pytest.raises(AssertionError, match="exceeds the .*parity cap"):
        _assert_stream_matches_batch(big, other, "cap-probe-stream-over")
    with _pytest.raises(AssertionError, match="exceeds the .*parity cap"):
        _assert_stream_matches_batch(other, big, "cap-probe-batch-over")

    # under the cap the same divergence must raise
    with _pytest.raises(AssertionError, match="diverges"):
        _assert_stream_matches_batch(
            spark.range(5).select(F.col("id")),
            spark.range(6).select(F.col("id")),
            "small-probe",
        )


def test_parity_check_survives_tied_keys_with_ulp_floats(spark):
    """VERDICT r5 #2: rows tied on their non-float key whose float
    cells differ by one ulp between stream and batch must PASS — under
    the old raw-tuple sort the float decided order and misaligned the
    zip compare, failing a genuine parity pass."""
    import math

    from pyspark_analytics_library_spark.streaming.stream_queries import (
        _assert_stream_matches_batch,
    )

    schema = "k string, v double, tag string"
    got = spark.createDataFrame([("a", 1.0, "x"), ("a", 1.0, "y")], schema)
    want = spark.createDataFrame(
        [
            ("a", math.nextafter(1.0, 2.0), "x"),
            ("a", math.nextafter(1.0, 0.0), "y"),
        ],
        schema,
    )
    _assert_stream_matches_batch(got, want, "ulp-probe")


def test_parity_check_is_none_safe(spark):
    """ADVICE r5: None beside a non-None value in the same column made
    the old sorted() comparison raise TypeError mid-check."""
    from pyspark_analytics_library_spark.streaming.stream_queries import (
        _assert_stream_matches_batch,
    )

    schema = "k string, n bigint"
    got = spark.createDataFrame([(None, 1), ("b", 2)], schema)
    want = spark.createDataFrame([("b", 2), (None, 1)], schema)
    _assert_stream_matches_batch(got, want, "none-probe")


def test_parity_check_rejects_two_grid_steps(spark):
    """ADVICE r5: tolerance is one step of the 4dp rounding grid — a
    float divergence of 5e-4 (well past summation-order noise) must
    FAIL, where the old 1e-3 abs_tol silently passed it."""
    import pytest as _pytest

    from pyspark_analytics_library_spark.streaming.stream_queries import (
        _assert_stream_matches_batch,
    )

    schema = "k string, v double"
    got = spark.createDataFrame([("a", 1.0)], schema)
    want = spark.createDataFrame([("a", 1.0005)], schema)
    with _pytest.raises(AssertionError, match="diverges"):
        _assert_stream_matches_batch(got, want, "tol-probe")


def test_stream_late_data_output_has_no_precutoff_window(spark):
    """The embedded self-check asserts this inside the query; assert it
    from the outside too so a regression in the check itself (not just
    the semantics) is caught.  Spark-side comparison on purpose:
    collected timestamps render in the driver OS timezone, not the
    session timezone, so a Python-side `< datetime(...)` would break
    (or silently weaken) on any non-UTC machine."""
    stream = _split_parity(
        REGISTRY["stream_late_data"].fn(spark, TEST_SF_DIR), expect="watermark-drop"
    )
    cutoff = F.lit("2024-01-10 00:00:00").cast("timestamp")
    pre, total = stream.agg(
        F.count_if(F.col("window_start") < cutoff), F.count(F.lit(1))
    ).collect()[0]
    assert total > 0
    assert pre == 0


def test_scratch_janitor_prunes_leaked_dirs_only(tmp_path, monkeypatch):
    """The scratch janitor must reclaim exactly the leak classes it
    documents — aged uuid sinks and dead-pid late-stream splits — and
    must never touch a live pid's split, a fresh sink, or the reusable
    keyed staging dirs (VERDICT r6 #6 / ADVICE r6)."""
    import os
    import subprocess
    import time

    import pyspark_analytics_library_spark.streaming.stream_queries as sq

    p = subprocess.Popen(["true"])
    p.wait()
    dead_pid = p.pid
    p2 = subprocess.Popen(["true"])
    p2.wait()
    dead_pid2 = p2.pid  # distinct dead pid for the pruned pid<NNN> case

    now = time.time()
    aged = now - sq._SCRATCH_MAX_AGE_S - 60  # past the 6 h gate
    graced = now - sq._SCRATCH_DEAD_GRACE_S - 60  # past dead-pid grace only
    # late_stream_sf_gh_1: pid 1 is init — alive for the life of the
    # container — and its dir is aged past the gate; a CONFIRMED-live
    # pid must keep its split even then (a long-lived session reuses
    # its staging without ever refreshing the dir mtime).  On an
    # unprivileged runner kill(1, 0) raises EPERM rather than
    # succeeding — which still proves pid 1 exists, and pid_state maps
    # PermissionError to 'alive' (ADVICE r8), so this case is
    # privilege-independent.  The superscript-³ and the >C-long pid
    # are hostile name shapes that must be skipped, not crash the
    # best-effort janitor.
    keep = {
        "feb_fresh": None,  # legacy pid-less name, inside the age gate
        "stream_src_fresh": None,
        f"feb_{os.getpid()}_aaaa1111": None,  # own pid — alive by definition
        "late_stream_sf_gh_1": aged,
        f"late_stream_sf_ab_{os.getpid()}": None,
        f"feb_{dead_pid}_ingrace": None,  # dead but FRESH — grace holds it
        "feb_³_x": None,  # isdigit() but not int()-able
        "late_stream_sf_huge_99999999999999999999": None,
        # pid<NNN> scan-sink scratch (round-8 class): own pid is alive
        # by definition even past the age gate; pid 1 is init — a
        # confirmed-live pid keeps its sinks at any age; dead-but-fresh
        # is held by the grace; "pidfile" is not a pid shape at all.
        f"pid{os.getpid()}": aged,
        "pid1": aged,
        f"pid{dead_pid}": None,  # dead but FRESH — grace holds it
        "pidfile": aged,  # suffix isn't a pid — never touch
    }
    prune = {
        "feb_aged": aged,  # legacy pid-less name, past the age gate
        "stream_sink_aged": aged,
        "stream_src_aged": aged,
        f"feb_{dead_pid}_bbbb2222": graced,  # dead + past grace
        f"stream_sink_{dead_pid}_cccc3333": graced,
        f"late_stream_sf_cd_{dead_pid}": graced,
        f"late_stream3_sf_legacy_{dead_pid}": graced,  # pre-rename generation
        f"pid{dead_pid2}": graced,  # dead + past grace — reclaimed
    }
    for name, mtime in {**keep, **prune}.items():
        d = tmp_path / name
        d.mkdir()
        (d / "payload").write_text("x")
        if mtime is not None:
            os.utime(d, (mtime, mtime))

    # Broken-symlink staging (VERDICT r12 #8): a stream_src_* dir whose
    # links ALL dangle (pytest tmp fixture rotated away) is reclaimed on
    # the dead-grace path; a live-target link stays age-gated; a fresh
    # broken dir is held by the grace; a mixed dir (any non-link or any
    # live link) stays age-gated.
    live_target = tmp_path / "live_fixture.parquet"
    live_target.write_text("x")
    sym_cases = {
        "stream_src_shape_broken": (graced, tmp_path / "gone.parquet", True),
        "stream_src_shape_broken_fresh": (None, tmp_path / "gone2.parquet", False),
        "stream_src_shape_live": (graced, live_target, False),
    }
    for name, (mtime, target, _) in sym_cases.items():
        d = tmp_path / name
        d.mkdir()
        os.symlink(target, d / "events.parquet")
        if mtime is not None:
            os.utime(d, (mtime, mtime))
    mixed = tmp_path / "stream_src_shape_mixed"
    mixed.mkdir()
    os.symlink(tmp_path / "gone3.parquet", mixed / "events.parquet")
    (mixed / "marker").write_text("x")
    os.utime(mixed, (graced, graced))
    keep.update(
        {n: None for n, (_, _, pruned) in sym_cases.items() if not pruned}
    )
    keep["stream_src_shape_mixed"] = None
    keep["live_fixture.parquet"] = None  # plain file at the root — untouched

    monkeypatch.setattr(sq, "_SCRATCH", str(tmp_path))
    monkeypatch.setattr(sq, "_SCRATCH_PRUNED", False)
    sq._prune_stale_scratch()
    assert {e.name for e in tmp_path.iterdir()} == set(keep)
    # The latch makes the second call a no-op even with new leaks.
    (tmp_path / f"late_stream_sf_ef_{dead_pid}").mkdir()
    sq._prune_stale_scratch()
    assert f"late_stream_sf_ef_{dead_pid}" in {e.name for e in tmp_path.iterdir()}


def test_scratch_janitor_eperm_means_alive(tmp_path, monkeypatch):
    """kill(pid, 0) → EPERM proves the process EXISTS (POSIX kill(2)):
    the janitor must treat it as confirmed-live and keep the dir at ANY
    age — not degrade to 'unknown' and age-gate a live other-uid
    process's scratch (ADVICE r8)."""
    import os
    import time

    import pyspark_analytics_library_spark.streaming.stream_queries as sq

    real_kill = os.kill

    def eperm_kill(pid, sig):
        if pid == 4242:
            raise PermissionError("simulated other-uid live process")
        return real_kill(pid, sig)

    monkeypatch.setattr(os, "kill", eperm_kill)
    aged = time.time() - sq._SCRATCH_MAX_AGE_S - 60
    for name in ("pid4242", "late_stream_sf_xy_4242", "feb_4242_dddd4444"):
        d = tmp_path / name
        d.mkdir()
        os.utime(d, (aged, aged))
    monkeypatch.setattr(sq, "_SCRATCH", str(tmp_path))
    monkeypatch.setattr(sq, "_SCRATCH_PRUNED", False)
    sq._prune_stale_scratch()
    assert {e.name for e in tmp_path.iterdir()} == {
        "pid4242",
        "late_stream_sf_xy_4242",
        "feb_4242_dddd4444",
    }


def test_scan_scratch_invokes_janitor(tmp_path, monkeypatch):
    """`scan_queries._scratch()` must run the janitor too, so a replay
    that never touches a streaming query still reclaims dead-pid
    scan-sink dirs — the pre-round-8 leak was exactly this class
    accumulating because only streaming queries pruned (VERDICT r7 #2)."""
    import os
    import subprocess
    import time

    import pyspark_analytics_library_spark.sources.scan_queries as scq
    import pyspark_analytics_library_spark.streaming.stream_queries as sq

    p = subprocess.Popen(["true"])
    p.wait()
    leaked = tmp_path / f"pid{p.pid}"
    leaked.mkdir()
    (leaked / "payload").write_text("x")
    graced = time.time() - sq._SCRATCH_DEAD_GRACE_S - 60
    os.utime(leaked, (graced, graced))

    monkeypatch.setattr(sq, "_SCRATCH", str(tmp_path))
    monkeypatch.setattr(sq, "_SCRATCH_PRUNED", False)
    monkeypatch.setattr(scq, "_SCRATCH", str(tmp_path / f"pid{os.getpid()}"))
    path = scq._scratch("sink_probe")
    assert not leaked.exists()
    assert path.endswith(os.path.join(f"pid{os.getpid()}", "sink_probe"))


def test_cells_match_admits_one_grid_step_rejects_two():
    """The tolerance must admit exactly one step of the 4dp rounding
    grid (adjacent 4dp doubles differ by slightly MORE than 1e-4 in
    IEEE form — the reason abs_tol is 1.5e-4, not 1e-4) and reject two
    steps."""
    from pyspark_analytics_library_spark.streaming.stream_queries import (
        _cells_match,
    )

    assert _cells_match(0.1234, 0.1235)
    assert _cells_match(12.3456, 12.3457)
    assert _cells_match(99.9999, 100.0)
    assert not _cells_match(0.1234, 0.1236)
    assert not _cells_match(12.3456, 12.3458)
    # The guarantee must hold at SUM-sized magnitudes too: with
    # isclose's default rel_tol=1e-9 a 1e6-scale cell would tolerate
    # ~1e-3 (ten grid steps) — rel_tol is pinned to 0 so abs_tol is
    # the sole bound at every magnitude (ADVICE r6).
    assert _cells_match(1234567.1234, 1234567.1235)
    assert not _cells_match(1234567.1234, 1234567.1236)


@hyp_given(st.floats(min_value=1e11, max_value=1e15), st.integers(1, 4))
def test_cells_match_ulp_floor_at_large_magnitudes(x, k):
    """PROPERTY (VERDICT r8 #3): above ~2.6e11, where one double ulp
    exceeds the flat 1.5e-4 grid bound, the tolerance floor is 4 ulps —
    a k≤4-ulp summation-order divergence must PASS (the flat bound
    alone would degrade to exact equality there) and a 16-ulp
    divergence must still FAIL.  Magnitude range brackets the sf≈1
    parity-sum scale the flat bound could not serve."""
    import math

    from pyspark_analytics_library_spark.streaming.stream_queries import (
        _cells_match,
    )

    y = x
    for _ in range(k):
        y = math.nextafter(y, math.inf)
    assert _cells_match(x, y)
    far = x + 16.0 * math.ulp(x)
    if far - x > 1.5e-4:  # guard: near 1e11 sixteen ulps can sit under the grid bound
        assert not _cells_match(x, far)


def test_group_matching_backtracks_past_greedy_order():
    """Two rows tied on keys whose floats have OVERLAPPING tolerance
    windows: greedy first-fit pairs stream 1.0001 with batch 1.0002 and
    then dead-ends; the augmenting-path matcher must find the valid
    pairing (1.0001→1.0000, 1.0002→1.0002)."""
    from pyspark_analytics_library_spark.streaming.stream_queries import (
        _group_matches,
    )

    got = [("k", 1.0001), ("k", 1.0002)]
    want = [("k", 1.0002), ("k", 1.0000)]
    assert _group_matches(got, want)
    # and a genuinely unmatchable set still fails
    assert not _group_matches([("k", 1.0), ("k", 1.0002)], [("k", 1.0), ("k", 1.01)])


def _parity_multiset_ok(got_rows, want_rows) -> bool:
    """Drives the REAL pure multiset core the assert helper uses."""
    from pyspark_analytics_library_spark.streaming.stream_queries import (
        _parity_rows_match,
    )

    return _parity_rows_match(got_rows, want_rows) is None


@hyp_given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),
            st.integers(0, 3).map(lambda i: float(i) / 100.0),
            st.integers(-5, 5),
        ),
        max_size=12,
    ),
    st.randoms(use_true_random=False),
)
def test_parity_matching_accepts_noise_within_one_grid_step(rows, rnd):
    """PROPERTY: any permutation of the batch rows with per-float noise
    strictly inside the tolerance must match — regardless of ties,
    Nones, duplicate rows, or how the noise reorders a raw sort."""
    want = [
        (k, v + (rnd.random() - 0.5) * 1e-4, n)  # |noise| ≤ 5e-5 < 1.5e-4
        for (k, v, n) in rows
    ]
    rnd.shuffle(want)
    assert _parity_multiset_ok(rows, want)


@hyp_given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(0, 9).map(lambda i: float(i) / 100.0),
            st.integers(-5, 5),
        ),
        min_size=1,
        max_size=10,
        unique=True,
    ),
    st.randoms(use_true_random=False),
)
def test_parity_matching_rejects_divergence_beyond_tolerance(rows, rnd):
    """PROPERTY: perturbing ONE row's float by 4e-4 (past tolerance,
    while all generated floats sit on a 1e-2 grid so it cannot sidle up
    to a different row) must be reported as divergence."""
    want = list(rows)
    i = rnd.randrange(len(want))
    k, v, n = want[i]
    want[i] = (k, v + 4e-4, n)
    rnd.shuffle(want)
    assert not _parity_multiset_ok(rows, want)
