"""Single-pass data-quality validation (deequ-style constraint
suite) for pipeline gates.

A 100 TB curation run cannot afford one scan per check, so every
constraint compiles to an aggregate expression and the whole suite
runs as ONE aggregation job over the table (count-distinct checks use
HLL++ by default to keep the pass shuffle-light; ``exact_unique=True``
opts into the exact form). Referential-integrity checks add one
left-anti probe per referenced dimension.

The result is a small DataFrame — (check, column, metric, threshold,
passed) — so a pipeline gates itself with a plain filter on
``passed`` and persists the audit trail next to the data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RESULT_SCHEMA = ("check: string, column: string, metric: double, "
                 "threshold: double, passed: boolean")


@dataclass
class Suite:
    """Accumulates constraints; ``run(df)`` executes them all in one
    aggregation pass (+ one anti-join probe per foreign key)."""

    exact_unique: bool = False
    _aggs: list[tuple[str, str, Column, float, Column]] = field(
        default_factory=list)
    _fks: list[tuple[str, DataFrame, str]] = field(default_factory=list)

    def _add(self, check: str, column: str, metric: Column,
             threshold: float, passed: Column) -> "Suite":
        self._aggs.append((check, column, metric, threshold, passed))
        return self

    def is_complete(self, col: str, min_ratio: float = 1.0) -> "Suite":
        """Non-null ratio ≥ min_ratio."""
        ratio = (F.count(col) / F.count(F.lit(1))).cast("double")
        return self._add("complete", col, ratio, min_ratio,
                         ratio >= F.lit(min_ratio))

    def is_unique(self, col: str, min_ratio: float = 1.0) -> "Suite":
        """distinct/total ratio ≥ min_ratio. HLL++ distinct by default
        (±2.5% rsd) — at 100 TB the exact form shuffles every value;
        thresholds under 1.0 should budget for the sketch error."""
        if self.exact_unique:
            distinct = F.count_distinct(F.col(col))
        else:
            distinct = F.approx_count_distinct(col, 0.025)
        ratio = (distinct / F.count(F.lit(1))).cast("double")
        return self._add("unique", col, ratio, min_ratio,
                         ratio >= F.lit(min_ratio))

    def in_range(self, col: str, lo: float, hi: float) -> "Suite":
        """Every non-null value in [lo, hi]; metric = violation count."""
        bad = F.sum(F.when((F.col(col) < lo) | (F.col(col) > hi), 1)
                    .otherwise(0)).cast("double")
        return self._add("in_range", col, bad, 0.0, bad <= F.lit(0.0))

    def satisfies(self, name: str, predicate: Column,
                  max_violations: int = 0) -> "Suite":
        """Row-level predicate; metric = rows violating it."""
        bad = (F.count(F.lit(1))
               - F.sum(F.when(predicate, 1).otherwise(0))).cast("double")
        return self._add("satisfies", name, bad, float(max_violations),
                         bad <= F.lit(float(max_violations)))

    def non_empty(self) -> "Suite":
        n = F.count(F.lit(1)).cast("double")
        return self._add("non_empty", "*", n, 1.0, n >= F.lit(1.0))

    def has_foreign_key(self, col: str, dim: DataFrame,
                        dim_col: str) -> "Suite":
        """Every non-null value must exist in the dimension — a
        broadcast left-anti probe (dims are small by definition);
        metric = orphan count."""
        self._fks.append((col, dim, dim_col))
        return self

    def run(self, df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        rows = []
        if self._aggs:
            exprs = []
            for i, (_, _, metric, _, passed) in enumerate(self._aggs):
                # on an empty frame sum-based metrics are null: a null
                # violation count is zero violations, and the null
                # comparison it feeds is a pass — coalesce both so the
                # suite reports instead of raising float(None)
                exprs.append(F.coalesce(metric, F.lit(0.0))
                             .alias(f"m{i}"))
                exprs.append(F.coalesce(passed, F.lit(True))
                             .alias(f"p{i}"))
            agg = df.agg(*exprs).collect()[0]
            for i, (check, col, _, thr, _) in enumerate(self._aggs):
                rows.append((check, col, float(agg[f"m{i}"]), thr,
                             bool(agg[f"p{i}"])))
        for col, dim, dim_col in self._fks:
            orphans = (df.filter(F.col(col).isNotNull())
                         .join(F.broadcast(
                             dim.select(F.col(dim_col).alias(col))
                                .distinct()),
                             col, "left_anti")
                         .count())
            rows.append(("foreign_key", col, float(orphans), 0.0,
                         orphans == 0))
        return spark.createDataFrame(rows, RESULT_SCHEMA)


def check_all_passed(results: DataFrame) -> bool:
    return results.filter(~F.col("passed")).isEmpty()
