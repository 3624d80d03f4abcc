"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers exactly one
:class:`QuerySpec` here.  ``__spark_entry__.queries()`` and
``oracle_sql()`` are generated from this registry, so an operator is
"done" if and only if it has a row here (with ``oracle=None`` only for
the rows-only exclusions enumerated in SURVEY.md §5.3.5: sampling,
approximate/randomized algorithms, LSH, streaming, binary payloads).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    """One declared query: a Spark callable plus its DuckDB oracle."""

    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a declared query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


#: Module emission order for :func:`ordered_registry`.  Round-robin across
#: modules (one query from each, repeating) so any prefix of the registry
#: — e.g. a driver that samples the first N queries — spans every operator
#: family instead of exhausting one module at a time.  Modules whose
#: queries had no driver CORRECTNESS row in rounds 1-2 (the driver's
#: sample covered relational/composite/skew/dedup/text/pipeline twice)
#: lead the cycle so they are hard-verified first.  Round 4:
#: timeseries/windows/stream_queries front-loaded so the driver's
#: 50-query prefix sample re-verifies the queries broken by the round-3
#: TIMESTAMP_NTZ fixture regeneration (VERDICT r3 task #5).
_MODULE_ORDER = (
    "timeseries",
    "windows",
    "stream_queries",
    "sql_surface",
    "graph",
    "aggregates",
    "setops",
    "similarity",
    "udf",
    "scalar",
    "scan_queries",
    "multimodal",
    "pipeline",
    "relational",
    "composite",
    "skew",
    "dedup",
    "text",
)


#: Queries that sort FIRST within their module's round-robin queue —
#: the 12 broken by the round-3 TIMESTAMP_NTZ fixture regeneration
#: (so the driver's 50-query prefix sample re-verifies all of them;
#: the module cycle alone only reaches ~3 queries per module in 50),
#: followed by the queries added or rewritten in round 4, which have
#: no driver CORRECTNESS row yet.
_FRONTLOAD = (
    "ts_sessionize",
    "ts_session_stats",
    "win_lag_lead",
    "win_running",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_late_data",
    "stream_dedup",
    "dedup_watermarked",
    "stream_static_join",
    "stream_stream_join",
    # round-4 additions/rewrites
    "ts_activity_streaks",
    "ts_resample_interp",
    "win_distinct_range",
    "agg_entropy",
    "text_repetition",
    "graph_triangles",
    "sim_lsh_approx",
    "dedup_ngram_jaccard",
)


def ordered_registry() -> dict[str, QuerySpec]:
    """REGISTRY re-ordered round-robin by module (see _MODULE_ORDER).

    Registration order follows Python import order, which cross-module
    imports distort (importing ``pipeline`` registers ``dedup``/``text``
    first); this function is the stable, intent-bearing order used by
    ``__spark_entry__.queries()``.  Modules not in _MODULE_ORDER (new
    ones not yet prioritized) are appended alphabetically.
    """
    by_module: dict[str, list[QuerySpec]] = {}
    for spec in REGISTRY.values():
        mod = spec.fn.__module__.rsplit(".", 1)[-1]
        by_module.setdefault(mod, []).append(spec)
    for specs in by_module.values():
        specs.sort(
            key=lambda s: _FRONTLOAD.index(s.name) if s.name in _FRONTLOAD else len(_FRONTLOAD)
        )
    module_cycle = [m for m in _MODULE_ORDER if m in by_module]
    module_cycle += sorted(m for m in by_module if m not in _MODULE_ORDER)
    out: dict[str, QuerySpec] = {}
    queues = {m: list(by_module[m]) for m in module_cycle}
    while queues:
        for mod in list(module_cycle):
            if mod not in queues:
                continue
            spec = queues[mod].pop(0)
            out[spec.name] = spec
            if not queues[mod]:
                del queues[mod]
    return out


def load_all_query_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    # Imports are local to avoid circular imports at package-init time.
    import pyspark_analytics_library_spark.operators.relational  # noqa: F401
    import pyspark_analytics_library_spark.operators.composite  # noqa: F401
    import pyspark_analytics_library_spark.operators.skew  # noqa: F401
    import pyspark_analytics_library_spark.operators.pipeline  # noqa: F401
    import pyspark_analytics_library_spark.operators.aggregates  # noqa: F401
    import pyspark_analytics_library_spark.operators.windows  # noqa: F401
    import pyspark_analytics_library_spark.operators.setops  # noqa: F401
    import pyspark_analytics_library_spark.operators.timeseries  # noqa: F401
    import pyspark_analytics_library_spark.operators.dedup  # noqa: F401
    import pyspark_analytics_library_spark.operators.similarity  # noqa: F401
    import pyspark_analytics_library_spark.operators.text  # noqa: F401
    import pyspark_analytics_library_spark.operators.udf  # noqa: F401
    import pyspark_analytics_library_spark.operators.multimodal  # noqa: F401
    import pyspark_analytics_library_spark.operators.sql_surface  # noqa: F401
    import pyspark_analytics_library_spark.operators.graph  # noqa: F401
    import pyspark_analytics_library_spark.functions.scalar  # noqa: F401
    import pyspark_analytics_library_spark.sources.scan_queries  # noqa: F401
    import pyspark_analytics_library_spark.streaming.stream_queries  # noqa: F401
