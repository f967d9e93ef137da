"""Mergeable distinct-count summaries (HyperLogLog sketches).

The cardinality complement of the Misra-Gries frequency artifacts
(``operators.heavy``): "how many distinct URLs / fingerprints / users
per source" over a growing corpus, without ever rescanning old
batches. ``COUNT(DISTINCT key)`` at 100 TB shuffles every distinct
key; an HLL sketch is a bounded (~KB) binary summary whose union
covers exactly the union of the sketched SETS — so each ingest batch
persists one tiny sketch row per group, and corpus-wide distinct
counts come from unioning artifacts, never from the raw data.

Estimator caveat (DataSketches): a directly built sketch is scored
with the order-sensitive HIP estimator, a unioned one with the
composite estimator — so merge-then-estimate and
estimate-the-whole-corpus agree within the error band, NOT
bit-for-bit (and the direct path's estimate itself shifts slightly
with the partial-aggregation tree shape, i.e. with parallelism).
Both stay inside the ~1.04/sqrt(2^lgConfigK) envelope; treat any
exact-equality expectation across build paths as a bug.

Spark shape: the Apache DataSketches HLL aggregates that ship with
Spark (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``) — JVM-side, map-side partial aggregation,
one tiny groupBy per batch. No UDFs anywhere. Relative error is
~1.04/sqrt(2^lgConfigK) (~1.6% at the default lgConfigK=12);
``lg_config_k`` is the knob when tighter counts are worth 2× sketch
bytes per step.

The artifact is a plain DataFrame (group cols + binary sketch), so it
persists as parquet like any table — same pattern as the PQ codebook
and drift-edge artifacts.

Relationship to ``operators.incremental``: that module embeds the same
HLL primitive as ONE column inside a maintained multi-aggregate rollup
state (count/sum/min/max/avg + distinct, merged per refresh); this one
is the standalone cardinality-only surface — per-batch artifacts you
union ad hoc, across arbitrary batch groupings, without adopting the
rollup-state loop. Same sketches, interchangeable bytes.

Reference scope note: north-star extension (SURVEY.md §2 extensions);
the reference has no cardinality surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cardinality_summary(df: DataFrame, key_col: str,
                        group_cols: Sequence[str] = (),
                        lg_config_k: int = 12) -> DataFrame:
    """(group_cols..., sketch): one HLL sketch of ``key_col``'s
    distinct values per group — the per-batch artifact. NULL keys are
    ignored (SQL COUNT(DISTINCT) semantics); a NULL GROUP is its own
    row (SQL GROUP BY semantics). One map-side-combined groupBy; the
    output is ≤ groups rows of ~KB sketches regardless of input
    size."""
    gcols = list(group_cols)
    agg = F.hll_sketch_agg(key_col, lg_config_k).alias("sketch")
    if gcols:
        return df.groupBy(*gcols).agg(agg)
    return df.agg(agg)


def merge_cardinality(*summaries: DataFrame,
                      group_cols: Sequence[str] | None = None
                      ) -> DataFrame:
    """Fold several :func:`cardinality_summary` outputs (same
    group_cols and lg_config_k) into one summary with the same
    schema: sketch union is associative and commutative, so a growing
    corpus' running distinct counts never rescan old batches — the
    same move as ``operators.heavy.merge_summaries``, for
    cardinality. Union + groupBy over tiny artifact rows.

    ``group_cols=None`` (default) infers the grouping as every
    non-``sketch`` column — correct for bare ``cardinality_summary``
    artifacts. Inputs that carry EXTRA columns (the streaming
    emissions add ``window`` and ``distinct_estimate``) MUST pass
    ``group_cols`` explicitly — ``()`` to collapse everything into
    one corpus-lifetime sketch — or the extras would be treated as
    group keys and nothing would merge."""
    from ._fold import fold_union

    out = fold_union(summaries, "merge_cardinality")
    gcols = ([c for c in out.columns if c != "sketch"]
             if group_cols is None else list(group_cols))
    out = out.select(*gcols, "sketch")
    agg = F.hll_union_agg("sketch").alias("sketch")
    if gcols:
        return out.groupBy(*gcols).agg(agg)
    return out.agg(agg)


def cardinality_estimate(summary: DataFrame) -> DataFrame:
    """(group_cols..., distinct_estimate): the readable form of a
    (possibly merged) summary. Pure projection — zero shuffle."""
    gcols = [c for c in summary.columns if c != "sketch"]
    return summary.select(
        *gcols,
        F.hll_sketch_estimate("sketch").alias("distinct_estimate"))


def distinct_count_report(df: DataFrame, key_col: str,
                          group_cols: Sequence[str] = (),
                          lg_config_k: int = 12) -> DataFrame:
    """One-shot (group_cols..., distinct_estimate) — sketch + estimate
    in a single pass for callers that don't need the artifact. At
    100 TB this replaces ``groupBy(...).agg(countDistinct(key))``:
    the shuffle carries one sketch per group instead of every
    distinct key."""
    return cardinality_estimate(
        cardinality_summary(df, key_col, group_cols, lg_config_k))
