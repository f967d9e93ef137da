"""Incremental aggregate (materialized-rollup) maintenance.

A 100 TB table's daily rollup cannot be recomputed by rescanning
history; it must be MAINTAINED: aggregate the new partition into a
partial state, merge it with the stored state, finalize on read. That
requires every aggregate to be decomposable into a commutative,
associative partial form:

* count/sum   → sum of partials
* min/max     → min/max of partials
* avg         → (sum, count) pair, divided at finalize
* COUNT(DISTINCT) → the classically non-decomposable one, carried as
  a DataSketches HLL sketch (binary column): ``hll_sketch_agg`` per
  batch, ``hll_union_agg`` to merge — sketch union is lossless in HLL
  mode, so the merged estimate equals the full-recompute estimate.

The stored state is just a DataFrame (parquet-persistable, binary
sketch column included), so the maintenance loop is: read state ∪
partial(new batch) → merge → write state. Nothing here rescans
anything but the delta.

For cardinality-ONLY questions (per-source distinct URLs across
ingest batches, no other aggregates), ``operators.cardinality`` is
the standalone artifact surface over the same HLL primitive.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_rollup(df: DataFrame, group_cols: Sequence[str],
                   num_cols: Sequence[str] = (),
                   distinct_cols: Sequence[str] = ()) -> DataFrame:
    """Mergeable per-group state: one aggregation pass over the batch
    (map-side partials + one shuffle on the group keys)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in num_cols:
        aggs += [F.sum(c).alias(f"sum_{c}"),
                 F.min(c).alias(f"min_{c}"),
                 F.max(c).alias(f"max_{c}"),
                 # non-null count: avg must divide by count(c), not
                 # count(*), or nulls in c skew the finalized average
                 F.count(c).alias(f"cnt_{c}")]
    for c in distinct_cols:
        aggs.append(F.hll_sketch_agg(c).alias(f"hll_{c}"))
    return df.groupBy(*group_cols).agg(*aggs)


def merge_rollups(state: DataFrame, delta: DataFrame,
                  group_cols: Sequence[str],
                  num_cols: Sequence[str] = (),
                  distinct_cols: Sequence[str] = ()) -> DataFrame:
    """state ⊕ delta — the maintenance step. Cost is proportional to
    the number of GROUPS, not the data behind them; groups absent
    from the delta pass through, new groups appear."""
    u = state.unionByName(delta)
    aggs = [F.sum("n").alias("n")]
    for c in num_cols:
        aggs += [F.sum(f"sum_{c}").alias(f"sum_{c}"),
                 F.min(f"min_{c}").alias(f"min_{c}"),
                 F.max(f"max_{c}").alias(f"max_{c}"),
                 F.sum(f"cnt_{c}").alias(f"cnt_{c}")]
    for c in distinct_cols:
        aggs.append(F.hll_union_agg(f"hll_{c}").alias(f"hll_{c}"))
    return u.groupBy(*group_cols).agg(*aggs)


def finalize_rollup(state: DataFrame, group_cols: Sequence[str],
                    num_cols: Sequence[str] = (),
                    distinct_cols: Sequence[str] = ()) -> DataFrame:
    """Read-side view of the state: derived avg, sketch → estimate.
    Finalize is a projection — no shuffle."""
    cols = [*[F.col(c) for c in group_cols], F.col("n")]
    for c in num_cols:
        cols += [F.col(f"sum_{c}"), F.col(f"min_{c}"), F.col(f"max_{c}"),
                 (F.col(f"sum_{c}") / F.col(f"cnt_{c}")).alias(f"avg_{c}")]
    for c in distinct_cols:
        cols.append(F.hll_sketch_estimate(F.col(f"hll_{c}"))
                    .alias(f"distinct_{c}"))
    return state.select(*cols)
