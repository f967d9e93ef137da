"""Window functions (SURVEY.md §2.5 W1–W4).

The reference sorts the whole frame globally then lags without group
boundaries (DLC:37 + MBE:47-50) — the first frame of each play sees the
previous play's last value, masked by the -999 snap sentinel (SURVEY
§7.1). The engine partitions the window correctly: one shuffle on the
partition keys, no global sort, each partition scanned once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def ordered_window(partition: Sequence[str],
                   order: Sequence[str | Column]) -> WindowSpec:
    """W4: the one window spec the whole metric pipeline reuses —
    partition by play/player keys, order by frame. Reusing a single
    spec lets EnsureRequirements dedupe the shuffle across the lag,
    lag-of-lag, and first-event computations (SURVEY §4.1)."""
    return Window.partitionBy(*partition).orderBy(*order)


def lag_delta(df: DataFrame, col: str, w: WindowSpec,
              alias: str) -> DataFrame:
    """W1: LAG(1) difference — discrete acceleration
    ``a_direction = s - lag(s)`` (MBE:47-49). First row per partition
    is NULL (correct semantics; reference divergence documented)."""
    return df.withColumn(alias, F.col(col) - F.lag(col, 1).over(w))


def second_difference_rising(df: DataFrame, delta_col: str, w: WindowSpec,
                             alias: str) -> DataFrame:
    """W2: lag of a derived lag — the "speed rising again" detector
    ``a_dir > lag(a_dir) & a_dir > 0`` (MBE:50)."""
    d = F.col(delta_col)
    return df.withColumn(alias, (d > F.lag(delta_col, 1).over(w)) & (d > 0))


def first_per_group(df: DataFrame, partition: Sequence[str],
                    order: Sequence[str | Column]) -> DataFrame:
    """W3: first-event-per-group (pressure start MBE:85-86, drop start
    MBE:39, set point MBE:52-55). ``row_number``-based: a single window
    pass instead of the reference's groupBy-min + join-back — one
    shuffle fewer, and deterministic given a total order (callers must
    include a tie-breaker key in ``order``)."""
    w = Window.partitionBy(*partition).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1)
              .drop("__rn"))


def running(df: DataFrame, expr: Column, w: WindowSpec,
            alias: str) -> DataFrame:
    """Engine extension: running aggregate over an ordered window
    (rows unbounded-preceding..current). Not in the reference; exposed
    because cumulative metrics are standard on the tracking grain."""
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(alias, expr.over(frame))
