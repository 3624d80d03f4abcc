"""Table loading and IO surface (SURVEY.md §2.1 `scan_*` / `sink_*`).

Capability parity target: the reference's source/sink surface (reference
snapshot is empty — SURVEY.md §0.1 — so the contract is the §2.1 table).

Scale posture (100 TB): the loader is declarative — `spark.read.parquet`
feeds Catalyst's vectorized Parquet scan, so predicate pushdown, column
pruning and (on a partitioned layout) partition pruning all apply to
every downstream operator for free.  Nothing is collected to the driver.
At cluster scale the same entry point accepts a directory of many files
or a partitioned table root; nothing here assumes a single file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The ten fixture tables (TESTDATA.md / FIXTURES.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Cache of loaded (lazy) DataFrames keyed by (applicationId, sf_dir).
# Spark DataFrames are plans, not data, so this only saves schema-read and
# plan-build overhead when many declared queries hit the same sf_dir.
# applicationId, not id(spark): id() values are recycled after a session
# is garbage-collected, which would hand a fresh session plans bound to a
# dead one.
_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


#: applicationIds the package zip has already been shipped to.
_SHIPPED: set[str] = set()

#: Zip built by THIS process (in-memory flag, not file existence: a stale
#: same-named file from a recycled pid would otherwise ship outdated code).
_ZIP_PATH: str | None = None


def _package_zip() -> str:
    """Build (once per process) a zip of this package for addPyFile.

    The source zip must outlive the call that ships it: local-mode
    executors re-fetch and byte-compare it against the file server's copy
    at task time, so a deleted-on-exit tempdir breaks the first job.  The
    name embeds a digest of the source contents, so a leftover zip from a
    recycled pid with *different* code can never be shipped by mistake —
    and an identical-content leftover is safe to reuse by construction.
    """
    global _ZIP_PATH
    if _ZIP_PATH is not None and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    import hashlib
    import shutil
    import tempfile

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    digest = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                digest.update(os.path.relpath(p, pkg_root).encode())
                with open(p, "rb") as f:
                    digest.update(f.read())
    archive_base = os.path.join(
        tempfile.gettempdir(),
        f"pyspark_analytics_library_spark-pyfiles-{digest.hexdigest()[:12]}",
    )
    if not os.path.exists(archive_base + ".zip"):
        # Build at a pid-unique scratch name, then os.replace() into the
        # shared digest-named path: a concurrent process running the same
        # code could otherwise pass the exists() check mid-write and
        # addPyFile a partially written zip.  os.replace is atomic on the
        # same filesystem, and identical digests mean identical contents,
        # so whichever writer lands last is equivalent.
        scratch = shutil.make_archive(
            f"{archive_base}-build-{os.getpid()}",
            "zip",
            root_dir=os.path.dirname(pkg_root),
            base_dir=os.path.basename(pkg_root),
        )
        os.replace(scratch, archive_base + ".zip")
    _ZIP_PATH = archive_base + ".zip"
    return _ZIP_PATH


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Module-level UDF callables are cloudpickled *by reference*, so the
    worker must be able to ``import pyspark_analytics_library_spark`` —
    true under pytest (cwd is the repo) but NOT when an external driver
    imports ``__spark_entry__`` from an arbitrary cwd with only a
    driver-side ``sys.path`` tweak (worker processes don't inherit
    that).  ``addPyFile`` ships a zip of the package to every executor
    and prepends it to the workers' ``sys.path`` — the same mechanism a
    real cluster submit uses (``spark-submit --py-files``), so this is
    exactly the 100 TB deployment path, not a test shim.
    """
    sc = spark.sparkContext
    if sc.applicationId in _SHIPPED:
        return
    sc.addPyFile(_package_zip())
    _SHIPPED.add(sc.applicationId)


def _configure(spark: SparkSession) -> None:
    """Session confs every query depends on (runtime-settable).

    - ``nanosAsLong``: `events.ts` is Parquet TIMESTAMP(NANOS), which the
      Spark 4.x reader rejects outright ([PARQUET_TYPE_ILLEGAL]); with
      this legacy flag it arrives as LongType nanoseconds (FIXTURES.md).
    - UTC session timezone: DuckDB timestamps are UTC-naive; without
      this, every timestamp comparison against the oracle is shifted.
    - Shuffle partitions: an external LOCAL driver on Spark's untouched
      200 default pays 200 tasks per exchange that AQE cannot always
      save (streaming state partitioning never coalesces; Python-worker
      ops pay per-task startup).  Trim ONLY on a local[*] master AND
      only the exact 200 default — a deliberately sized session passes
      through untouched, and a *cluster* session is never touched at
      all: silently pinning 32 reducers under a 1000-executor job would
      be a petabyte-shuffle bottleneck, so cluster admins keep their own
      sizing (2-3x total cores, or AQE coalescing from a high initial
      count).  Measured on the bare-session local replay: whole-suite
      sf0.01 wall time drops ~30%, single worst query 13.3 s -> 3.5 s.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if (
        spark.sparkContext.master.startswith("local")
        and spark.conf.get("spark.sql.shuffle.partitions", "200") == "200"
    ):
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    _ship_package(spark)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with canonical column types."""
    _configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col, target in _TS_CANON.get(name, {}).items():
        df = _normalize_ts(df, col, target)
    return df


#: Timestamp-bearing fixture columns and their canonical Spark dtype.
#: The generator has re-encoded these across rounds (int64 nanos in
#: rounds 1-2, timestamp[us] without timezone in round 3), and each
#: switch broke queries three hours after the last commit — so the
#: loader owns a schema contract instead of trusting the files.
#: ``events.ts`` must be TIMESTAMP (LTZ): NTZ rejects both
#: `CAST(ts AS BIGINT)` and `withWatermark`.  The date columns stay
#: TIMESTAMP_NTZ — that is today's validated-green dtype, and all
#: downstream use is date comparison/truncation, which is
#: timezone-independent under the pinned-UTC session.
_TS_CANON: dict[str, dict[str, str]] = {
    "events": {"ts": "timestamp"},
    "lineitem": {"l_shipdate": "timestamp_ntz"},
    "orders": {"o_orderdate": "timestamp_ntz"},
}


def _normalize_ts(df: DataFrame, col: str = "ts", target: str = "timestamp") -> DataFrame:
    """Canonicalize one timestamp column to ``target`` regardless of the
    fixture's physical encoding.  All branches stay live — the generator
    has already produced two of these shapes across rounds:

    - Parquet TIMESTAMP(NANOS) read as int64 under ``nanosAsLong``:
      ns → µs with *integer* division (`div` keeps LongType; a double
      roundtrip would lose precision above 2^53 ns).  DuckDB reads the
      same file truncated to µs — identical values (SURVEY.md §1.3).
    - TIMESTAMP_NTZ ↔ TIMESTAMP off-target: cast.  With the session tz
      pinned UTC (`_configure`) the wall-clock fields — and therefore
      the µs epoch values — are preserved bit-for-bit in both
      directions, matching DuckDB's naive read of the same file.
    - Already on target: untouched (no Project node inserted, so scan
      pushdown on other columns is unaffected).
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        dtype = "timestamp"
    if dtype in ("timestamp", "timestamp_ntz") and dtype != target:
        df = df.withColumn(col, F.col(col).cast(target))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load all fixture tables; optionally register them as temp views.

    Returns a dict of lazy DataFrames.  Cached per (session, sf_dir).
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CACHE:
        _CACHE[key] = {name: load_table(spark, sf_dir, name) for name in TABLES}
    if register_views:
        # Re-register on every call: the session-global view names must
        # track the *requested* sf_dir even when callers alternate
        # between scale factors (entry() at sf0.001, queries at sf0.01).
        for name, df in _CACHE[key].items():
            df.createOrReplaceTempView(name)
    return _CACHE[key]


# ---------------------------------------------------------------------------
# Generic scan surface (`scan_csv` / `scan_json` / `scan_orc` / `scan_jdbc`)
# ---------------------------------------------------------------------------


def scan_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV scan with explicit schema (schema inference is an extra pass
    over the data — never acceptable at 100 TB, so callers pass one)."""
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def scan_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def scan_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).orc(path)


def scan_jdbc(
    spark: SparkSession, url: str, table: str, **properties
) -> DataFrame:
    """JDBC connector surface.  Declared as the full-oracle driver
    query ``scan_jdbc`` (sources/scan_queries.py) since round 12: no
    EXTERNAL database is reachable in the driver environment, but
    Spark bundles embedded Derby, so the declared query writes nation
    into a fresh Derby database and reads it back partitioned —
    writer+reader value-exactness attested against the original table.
    tests/test_jdbc.py drives the plain and partitioned paths directly.

    At scale, callers should pass ``partitionColumn``/``lowerBound``/
    ``upperBound``/``numPartitions`` so the read parallelizes across
    that many connections instead of funneling through one (the
    partitioned test pins that these options shard the RDD).
    """
    return spark.read.jdbc(url=url, table=table, properties=properties)


# ---------------------------------------------------------------------------
# Sink surface
# ---------------------------------------------------------------------------


def sink_parquet(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """Parquet writer.  ``partition_by`` produces the hive-style layout
    that enables partition pruning on re-read — the 100 TB default for
    fact tables (partition by a low-cardinality time bucket).

    Operational note (r12 AQE root-cause, SCALE.md): keep row groups
    bounded (``parquet.block.size``; Spark's 128 MB default is fine —
    the hazard is single-row-group compaction jobs).  A file whose rows
    live in ONE giant row group is read by ONE effective scan task no
    matter how many byte-range splits Spark makes, which serializes the
    scan AND disables AQE's skew-join split downstream: the split can
    only cut a hot shuffle partition at map-output boundaries, and a
    one-map stage leaves it a single unsplittable block."""
    writer = df.write.mode(mode)
    if partition_by:
        # a bare name is ONE partition column, not characters
        if isinstance(partition_by, str):
            partition_by = [partition_by]
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def sink_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", header).csv(path)
