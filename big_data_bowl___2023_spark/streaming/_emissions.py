"""Shared pruning for update-mode window emissions.

Every windowed sketch module re-emits a (window, group)'s refreshed
artifact each touching micro-batch, tagged with a monotonically
increasing ``emit_seq``. Archive consumers keep only the newest
emission per key — mandatory before merging the ADDITIVE sketches
(t-digest weights, CMS counters), merely thrifty for the idempotent
ones (bottom-k). One definition so tie/pruning semantics can't
drift between the modules."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_emit_seq(emissions: DataFrame,
                       keys: Sequence[str]) -> DataFrame:
    """Rows belonging to each key group's maximum ``emit_seq`` (an
    emission may span several rows — sketch cells, sample rows — so
    this filters, never row_number-truncates)."""
    w = Window.partitionBy(*keys)
    return (emissions
            .withColumn("__mx", F.max("emit_seq").over(w))
            .filter(F.col("emit_seq") == F.col("__mx"))
            .drop("__mx"))
