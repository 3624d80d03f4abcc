"""pyspark_analytics_library_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first implementation of the analytics-operator
surface of ``kuanpern/PySpark-Analytics-Library`` (reference snapshot at
/root/reference is empty — see SURVEY.md §0.1; the operator inventory in
SURVEY.md §2 is the authoritative capability contract).

Design stance (SURVEY.md §7):
- The engine is an *operator layer* over the public PySpark DataFrame
  API; Catalyst/Tungsten/AQE own optimization and physical execution.
- Everything expressible with built-in ``pyspark.sql.functions`` stays
  JVM-side inside whole-stage codegen; pandas UDFs are the escape hatch.
- Every declared query is registered in :mod:`.registry` together with
  its DuckDB oracle SQL, which the driver cross-checks at sf0.01.
"""

from pyspark_analytics_library_spark.registry import REGISTRY, query, QuerySpec
from pyspark_analytics_library_spark.sources.io import load_tables, TABLES
from pyspark_analytics_library_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "load_tables",
    "TABLES",
    "get_spark",
    "__version__",
]
