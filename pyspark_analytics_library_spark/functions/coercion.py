"""String-or-Column coercion — the reference's core API idiom.

The reference's ``convert_to_spark_col`` accepts either a column name or
a Column expression everywhere and fails fast on anything else
(SNIPPETS.md snippet 1, SURVEY.md §1.4).  Reproduced here as the
package-wide argument convention.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ensure_column(c: str | Column) -> Column:
    """Coerce a column name to a Column; pass Columns through.

    Raises ``TypeError`` eagerly (at plan-build time, before any job is
    submitted) for anything else — errors surface in milliseconds, not
    after a cluster-wide stage fails.
    """
    if isinstance(c, Column):
        return c
    if isinstance(c, str):
        return F.col(c)
    raise TypeError(f"expected column name or Column, got {type(c).__name__}: {c!r}")


def scaled_int_text(c: str | Column) -> Column:
    """SURVEY §5.3 rule 11's float serializer, as ONE definition: a
    float compare-column becomes ``FLOOR(x*1e6 + 0.5)`` scaled-integer
    TEXT — identical IEEE arithmetic on Spark and DuckDB (rule 7's
    half-up form), immune to the engines' float→string formatting and
    float32-widening differences.  Matching oracle SQL:
    ``CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS
    VARCHAR)``.

    PRECONDITION: finite inputs only (NULL is fine).  On NaN/±Inf the
    engines DIVERGE — Spark's ``cast('long')`` yields NULL where
    DuckDB's ``CAST(FLOOR(…) AS BIGINT)`` raises — so a query putting
    user-controlled floats on the compare surface must filter or
    ``nanvl`` them first.  Every current caller serializes a rounded
    aggregate of finite fixture data, where the precondition holds by
    construction."""
    x = ensure_column(c).cast("double")
    return F.floor(x * 1e6 + F.lit(0.5)).cast("long").cast("string")


def ensure_columns(cols) -> list[Column]:
    """Coerce a name/Column OR a sequence of them to a list of Columns.

    A bare string counts as ONE column, never as an iterable of
    characters: ``orderBy(*"ts")`` silently orders by columns ``t`` and
    ``s`` when those happen to exist — the Python
    string-is-iterable foot-gun — and errors confusingly when they
    don't."""
    if isinstance(cols, (str, Column)):
        return [ensure_column(cols)]
    return [ensure_column(c) for c in cols]
