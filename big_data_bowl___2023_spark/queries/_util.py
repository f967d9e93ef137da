"""Shared helpers for driver-checked queries.

Cross-engine float policy (see registry docstring): exact decimal
arithmetic for large sums, round(6) for small-magnitude derived values,
total orders with tie-breakers before any LIMIT.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..sources.io import load_table

__all__ = ["load_table", "dsum", "r6", "EVENTS_CTE"]


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Exact SUM: cast to decimal (exact, associative) so Spark's
    partial-aggregation order and DuckDB's scan order give identical
    results, then back to double for type-stable comparison."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB side of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def r6(col: Column) -> Column:
    """Round a small-magnitude derived double to 6 decimals."""
    return F.round(col, 6)


# DuckDB view `events` carries a TIMESTAMP_NS column; Spark reads it
# truncated to microseconds (sources.io.load_table). Oracles wrap the
# view in this CTE (named `ev` — DuckDB won't shadow a view name) so
# both engines see identical microsecond values.
EVENTS_CTE = (
    "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, "
    "user_id, event_type, value, props FROM events)"
)
