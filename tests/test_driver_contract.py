"""Differential test: every registered query vs its DuckDB oracle.

This is exactly what the driver does at sf0.01 (SURVEY.md §0.3), run
locally at sf0.001.  Rows-only queries (oracle=None) are still executed
and must return a well-formed DataFrame.
"""

from __future__ import annotations

import os

import pytest

from pyspark_analytics_library_spark.registry import REGISTRY, load_all_query_modules
from tests.conftest import TEST_SF_DIR, assert_query_matches_oracle

load_all_query_modules()

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


def _assert_boundary_has_no_complex_columns(df, name: str) -> None:
    """SURVEY §5.3 rule 11, enforced structurally: the driver's
    canonicalizer collects rows and sorts them with pandas, which
    crashes on list/dict cells (CORRECTNESS_r06 `agg_freqitems`,
    ``TypeError: unhashable type: 'list'``).  Every declared query must
    therefore serialize container outputs — ``to_json(sort_array(...))``
    for order-free arrays — so the boundary emits only atomic columns.
    Asserted on schema alone (no action), for oracled and rows-only
    queries alike, so the NEXT such query fails here, not in the
    driver."""
    from pyspark.sql import types as T

    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"[{name}] declared-query boundary emits complex-typed columns "
        f"{complex_cols} — serialize them (e.g. F.to_json(F.sort_array(c)))"
        f" so the driver canonicalizer sees atomic cells"
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, oracle, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, TEST_SF_DIR)
    _assert_boundary_has_no_complex_columns(df, name)
    assert_query_matches_oracle(df, oracle, spec.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, TEST_SF_DIR)
    # Schema must be stable and the query must execute end-to-end.
    assert df.columns, f"[{name}] produced no columns"
    _assert_boundary_has_no_complex_columns(df, name)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_every_oracle_name_has_query():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)


def _vacuity_sf_dirs() -> list[str]:
    """Every fixture SF dir the vacuity guard must cover, deduped.

    Globs ALL sibling ``sf*`` dirs of the conftest fixture root (plus
    TEST_SF_DIR itself and the SPARKALYTICS_DRIVER_SF override if set)
    — ADVICE r10: the round-10 vacuity bug was found at sf0.1, which
    the previous driver/pytest two-way parametrization left unguarded.
    Dirs are deduped by resolved path so overlapping env overrides
    don't double-scan (ADVICE r10 #3).
    """
    import glob as _glob

    root = os.path.dirname(TEST_SF_DIR.rstrip("/"))
    dirs = [TEST_SF_DIR]
    if "SPARKALYTICS_DRIVER_SF" in os.environ:
        dirs.append(os.environ["SPARKALYTICS_DRIVER_SF"])
    dirs.extend(sorted(_glob.glob(os.path.join(root, "sf*"))))
    out, seen = [], set()
    for d in dirs:
        r = os.path.realpath(d)
        if r not in seen and os.path.isdir(d):
            seen.add(r)
            out.append(d)
    # ADVICE r11: no fallback to TEST_SF_DIR here — it bypassed the
    # isdir filter, so a fixtureless checkout hit FileNotFoundError in
    # _sf_dir_bytes instead of skipping.  An empty list makes pytest
    # emit the parametrized tests as skipped, which is the intent.
    return out


#: DuckDB scan cost over the full oracle set at sf0.1 (~17 MB parquet)
#: is ~2 min; by default the guard runs the two cheap SFs (sf0.001
#: pytest / sf0.01 driver) every time and the expensive ones only when
#: SPARKALYTICS_VACUITY_ALL_SF=1 (set in the round's full-contract
#: replay, not per-commit pytest).
_VACUITY_CHEAP_BYTES = 8 * 1024 * 1024


def _sf_dir_bytes(sf_dir: str) -> int:
    return sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )


@pytest.mark.parametrize("sf_dir", _vacuity_sf_dirs())
def test_no_oracle_is_vacuous(sf_dir):
    """Every oracle must select at least one row at EVERY fixture SF:
    an empty result makes a value hash compare nothing — both engines
    vacuously agree on empty, and the green row attests no values.
    Caught live in round 9: ``sql_subquery_scalar``'s 4×-mean
    threshold selected zero rows at EVERY fixture SF (max/avg ≈ 2 in
    the synthetic orders table) and had been vacuously hash-green
    since round 2.  Caught live again in round 10 at the OTHER two
    SFs: ``query_important_stock`` (0.002×-of-total threshold beaten
    by sf0.1's part-count growth; nation with no sf0.001 supplier)
    and ``query_volume_shipping`` (nation pair with no sf0.001
    supplier) — hence the all-SF glob: the round-10 finds were at
    sf0.1, which a driver/pytest two-way parametrization misses.

    DuckDB-only (no Spark session): the point is the oracle's
    selectivity, and the differential tests already prove the Spark
    side matches it.
    """
    import duckdb

    import __spark_entry__ as e

    if (
        _sf_dir_bytes(sf_dir) > _VACUITY_CHEAP_BYTES
        and os.environ.get("SPARKALYTICS_VACUITY_ALL_SF") != "1"
    ):
        pytest.skip(
            f"{sf_dir} exceeds the cheap-scan budget; "
            "set SPARKALYTICS_VACUITY_ALL_SF=1 to include it"
        )

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    empty = [
        name
        for name, sql in e.oracle_sql().items()
        if con.execute(f"SELECT count(*) FROM ({sql}) x").fetchone()[0] == 0
    ]
    assert empty == [], f"vacuous oracles at {sf_dir}: {empty}"


def test_missing_sf_dir_raises_clean_error(spark):
    """A bad data dir must fail eagerly with Spark's AnalysisException
    (path not found), not a worker-side crash mid-query."""
    import pytest
    from pyspark.errors import AnalysisException

    from pyspark_analytics_library_spark.sources.io import load_tables

    with pytest.raises(AnalysisException):
        load_tables(spark, "/root/testdata/sf_does_not_exist")["lineitem"].count()


def test_ordered_registry_frontloads_least_recently_attested():
    """The driver samples a 50-query prefix of ``ordered_registry()``;
    the ordering must spend that budget on queries with the stalest (or
    no) driver CORRECTNESS attestation — VERDICT r4 task #1."""
    from pyspark_analytics_library_spark.registry import (
        _active_pins,
        _driver_attestation_rounds,
        _driver_green_rows,
        ordered_registry,
    )

    order = list(ordered_registry())
    assert set(order) == set(REGISTRY), "ordering must be a permutation"
    attested = _driver_attestation_rounds()
    # Pins hold only until their clearing round is green-attested.
    pinned = _active_pins(_driver_green_rows())
    assert order[: len(pinned)] == pinned
    never = [n for n in order if n not in attested]
    if len(never) >= 50:
        prefix_never = sum(1 for n in order[:50] if n not in attested)
        assert prefix_never >= 45, (
            f"only {prefix_never}/50 of the driver prefix are never-attested"
        )
    # Staleness must be non-decreasing once the pinned prefix ends.
    tiers = [attested.get(n, 0) for n in order[len(pinned):]]
    assert tiers == sorted(tiers), "attestation rounds must be non-decreasing"


def test_stalest_tier_fully_leads_rotation_after_pins():
    """VERDICT r15 #1 regression: the r15 money-sum pin burst displaced
    three r11-attested queries out of the K=50 sample, aging them one
    round past the R=4 freshness window.  Ordering discipline: the
    ENTIRE minimum-attestation tier must occupy the first slots after
    any active pins — never interleaved with fresher tiers — so a
    single driver round always restores the attestation floor (three
    such queries sit at positions 0-2 for round 16)."""
    from pyspark_analytics_library_spark.registry import (
        _active_pins,
        _driver_attestation_rounds,
        _driver_green_rows,
        ordered_registry,
    )

    attested = _driver_attestation_rounds()
    pinned = _active_pins(_driver_green_rows())
    order = list(ordered_registry())
    floor = min(attested.get(n, 0) for n in order)
    min_tier = {
        n for n in order if attested.get(n, 0) == floor and n not in pinned
    }
    lead = order[len(pinned) : len(pinned) + len(min_tier)]
    assert set(lead) == min_tier, (
        f"stalest tier (round {floor}) not contiguous at the front: "
        f"{sorted(min_tier - set(lead))} displaced"
    )


def test_driver_prefix_starves_recently_attested_queries():
    """VERDICT r5 #4: the 50-query driver sample must never re-spend a
    slot on a query attested in either of the two most recent rounds
    while enough staler queries exist to fill the prefix — the
    starvation property the ordered_registry docstring promises.
    Pinned queries are exempt (a pin deliberately jumps the queue to
    re-attest machinery that changed since its last green row)."""
    from pyspark_analytics_library_spark.registry import (
        _active_pins,
        _driver_attestation_rounds,
        _driver_green_rows,
        ordered_registry,
    )

    attested = _driver_attestation_rounds()
    if not attested:
        return  # outside the repo checkout: nothing to starve
    latest = max(attested.values())
    recent = {n for n, r in attested.items() if r >= latest - 1}
    pinned = set(_active_pins(_driver_green_rows()))
    order = list(ordered_registry())
    stale_pool = [n for n in order if n not in recent and n not in pinned]
    budget = 50 - len(pinned)
    if len(stale_pool) < budget:
        return  # not enough stale queries to fill the sample
    offenders = [n for n in order[:50] if n in recent and n not in pinned]
    assert not offenders, (
        f"driver prefix wastes slots on recently-attested queries: {offenders}"
    )


def test_attestation_ignores_failing_rows(tmp_path):
    """A failed driver row must not count as attestation — the query
    should rotate back toward the sample prefix."""
    import json as _json
    import pathlib as _pathlib

    from pyspark_analytics_library_spark.registry import _driver_attestation_rounds

    rows = {
        "good_oracle": {"rows_match": True, "schema_match": True, "hash_match": True,
                        "spark_rows": 5, "oracle_rows": 5, "err": None},
        "rows_only": {"rows_match": None, "schema_match": None, "hash_match": None,
                      "spark_rows": 9, "oracle_rows": None, "err": "no_oracle"},
        "hash_fail": {"rows_match": True, "schema_match": True, "hash_match": False,
                      "spark_rows": 5, "oracle_rows": 5, "err": None},
        "crashed": {"rows_match": None, "schema_match": None, "hash_match": None,
                    "spark_rows": None, "oracle_rows": None, "err": "boom"},
    }
    (tmp_path / "CORRECTNESS_r07.json").write_text(_json.dumps(rows))
    att = _driver_attestation_rounds(root=_pathlib.Path(tmp_path))
    assert att == {"good_oracle": 7, "rows_only": 7}


def test_priority_pins_expire_after_clearing_round(monkeypatch):
    """Once a pinned query has a green driver row at its clearing
    round — recording the pin's expected row count — it re-enters the
    normal staleness rotation (here: freshest tier, so it sorts last)
    instead of holding a sample slot forever."""
    import pyspark_analytics_library_spark.registry as reg

    names = sorted(reg.REGISTRY)[:3]
    monkeypatch.setattr(
        reg,
        "_PRIORITY",
        {names[0]: reg._Pin(until=9), names[1]: reg._Pin(until=9, expect_rows=155)},
    )
    monkeypatch.setattr(
        reg,
        "_driver_green_rows",
        lambda root=None: {n: [(9, 155)] for n in names},
    )
    order = list(reg.ordered_registry())
    assert set(order[-3:]) >= set(names[:2]), "cleared pins must sort to the freshest tier"


def test_priority_pin_not_cleared_by_stale_checkout_row(monkeypatch):
    """ADVICE r10: a pin keyed on ``expect_rows`` must NOT clear on a
    green row from the named round that attests the OLD result shape
    (e.g. a stale checkout ran in that round) — the round number alone
    is not evidence the changed definition was attested."""
    import pyspark_analytics_library_spark.registry as reg

    name = sorted(reg.REGISTRY)[0]
    monkeypatch.setattr(reg, "_PRIORITY", {name: reg._Pin(until=9, expect_rows=155)})
    # Green rows exist at r9 and r10, but both record the pre-change
    # row count (42) — the pin must hold.
    monkeypatch.setattr(
        reg, "_driver_green_rows", lambda root=None: {name: [(9, 42), (10, 42)]}
    )
    assert list(reg.ordered_registry())[0] == name
    # A green row from an EARLIER round with the right count also must
    # not clear it (the change landed after that round).
    monkeypatch.setattr(
        reg, "_driver_green_rows", lambda root=None: {name: [(8, 155)]}
    )
    assert list(reg.ordered_registry())[0] == name
    # Only round >= until AND matching rows clears.
    monkeypatch.setattr(
        reg, "_driver_green_rows", lambda root=None: {name: [(9, 155)]}
    )
    assert list(reg.ordered_registry())[0] != name


def test_no_pin_outlives_its_staleness_ceiling(monkeypatch):
    """ADVICE r11: a _Pin with a miscalculated ``expect_rows`` (or a
    driver-SF change that moves the row count) can never clear — the
    'a pin can never permanently starve' claim only holds for
    round-only pins.  ``stale_pins`` is the ceiling: a pin still active
    PIN_STALENESS_GRACE rounds past ``until`` fails here instead of
    silently holding a rotation slot forever."""
    import pyspark_analytics_library_spark.registry as reg

    # The live check: the REAL pin table against the REAL artifacts.
    current = reg.latest_attested_round() + 1
    stale = reg.stale_pins(current)
    assert not stale, (
        f"pins {stale} are still active {reg.PIN_STALENESS_GRACE}+ rounds "
        f"past their clearing round (building r{current}) — their "
        "expect_rows is likely wrong; fix or remove them"
    )

    # The mechanism: a pin whose expect_rows never matches goes stale
    # exactly after the grace window.
    name = sorted(reg.REGISTRY)[0]
    monkeypatch.setattr(reg, "_PRIORITY", {name: reg._Pin(until=9, expect_rows=1)})
    monkeypatch.setattr(
        reg, "_driver_green_rows", lambda root=None: {name: [(9, 42), (10, 42)]}
    )
    grace = reg.PIN_STALENESS_GRACE
    assert reg.stale_pins(9 + grace) == []
    assert reg.stale_pins(9 + grace + 1) == [name]


def test_describe_self_check_conf_switch(spark, monkeypatch):
    """`spark.analytics.describe.selfCheck` (VERDICT r8 #4): default
    true keeps the embedded parse-back attestation (two bounded eager
    collects inside the query body); false must skip the extra eager
    job entirely — zero internal collects, plan stays lazy — while
    returning the identical summary frame."""
    from pyspark_analytics_library_spark.registry import REGISTRY

    # Patch the CONCRETE DataFrame class (pyspark.sql.classic.…):
    # patching the abstract pyspark.sql.DataFrame would be shadowed by
    # the subclass override and count nothing.
    DataFrame = type(spark.range(1))

    fn = REGISTRY["agg_describe"].fn
    calls = {"n": 0}
    orig_collect = DataFrame.collect

    def counting_collect(self):
        calls["n"] += 1
        return orig_collect(self)

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    try:
        spark.conf.set("spark.analytics.describe.selfCheck", "false")
        lazy = fn(spark, TEST_SF_DIR)
        assert calls["n"] == 0, "selfCheck=false must not run eager jobs"
        rows_off = sorted(map(tuple, lazy.collect()))

        calls["n"] = 0
        spark.conf.set("spark.analytics.describe.selfCheck", "true")
        attested = fn(spark, TEST_SF_DIR)
        assert calls["n"] >= 2, "default path must run the parse-back jobs"
        rows_on = sorted(map(tuple, attested.collect()))
    finally:
        spark.conf.unset("spark.analytics.describe.selfCheck")
    assert rows_off == rows_on
