"""As-of (point-in-time) join — a custom operator Spark's DataFrame
API lacks natively (SURVEY §2 custom-operator scope; the canonical
time-series primitive: match each left row to the most recent right
row at or before it).

Spark-first composition, no UDF, ONE shuffle:

1. Tag both inputs and UNION them into one keyed event stream
   (right rows carry their payload, left rows carry nulls).
2. One ordered window per key: ``last(payload, ignorenulls=True)``
   over rows-unbounded-preceding propagates the latest right payload
   forward; right rows sort before left rows at equal timestamps, so
   the match is inclusive (left.ts >= right.ts) — exactly DuckDB's
   ``ASOF JOIN`` semantics, which the tests use as the oracle.
3. Keep left rows; optionally null out matches older than
   ``tolerance_seconds``.

At 100 TB this is one shuffle on the partition keys and a single
sorted scan per partition — the same cost profile as any window
aggregation, with no range-explosion join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame,
              keys: Sequence[str], ts_col: str,
              value_cols: Sequence[str] | None = None,
              tolerance_seconds: float | None = None,
              matched_ts_col: str = "matched_ts") -> DataFrame:
    """Backward as-of join: left rows + latest right payload with
    right.ts <= left.ts (per key). ``value_cols`` defaults to every
    right column that is neither a key nor the timestamp. The matched
    right timestamp is exposed as ``matched_ts_col``; with
    ``tolerance_seconds`` set, matches further back than the
    tolerance are nulled (standard as-of tolerance semantics)."""
    keys = list(keys)
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in keys and c != ts_col]
    value_cols = list(value_cols)

    l_tagged = left.select(
        *keys, F.col(ts_col),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__r_ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns if c not in keys and c != ts_col],
    )
    r_tagged = right.select(
        *keys, F.col(ts_col),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(ts_col).alias("__r_ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys and c != ts_col],
    )
    merged = l_tagged.unionByName(r_tagged)

    w = (Window.partitionBy(*keys)
         .orderBy(F.col(ts_col).asc(), F.col("__is_left").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = merged.select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
          for c in value_cols],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__m_ts"),
    )
    out = filled.filter(F.col("__is_left") == 1)

    in_tol = F.lit(True)
    if tolerance_seconds is not None:
        gap = (F.unix_micros(F.col(ts_col))
               - F.unix_micros(F.col("__m_ts"))) / 1e6
        in_tol = gap <= F.lit(float(tolerance_seconds))

    proj = [*keys, ts_col,
            *[c for c in left.columns if c not in keys and c != ts_col]]
    return out.select(
        *proj,
        *[F.when(in_tol, F.col(f"__m_{c}")).alias(c_out)
          for c, c_out in ((c, f"{c}_asof") for c in value_cols)],
        F.when(in_tol, F.col("__m_ts")).alias(matched_ts_col))
