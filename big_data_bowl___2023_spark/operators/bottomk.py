"""Mergeable uniform-sample summaries (bottom-k / KMV sketch).

The inspectable member of the mergeable-artifact family: the other
sketches answer aggregate questions (membership, distincts, heavy
keys, quantiles, point frequencies); this one keeps ACTUAL ROWS — a
deterministic uniform sample of each group's distinct keys, with
optional payload columns riding along — so "show me 100 random
documents per source across the whole corpus" is an artifact lookup,
not a corpus scan.

The trick (bottom-k / K-Minimum-Values, Bar-Yossef et al. 2002;
Cohen & Kaplan, "Summarizing data using bottom-k sketches", PODC'07):
hash every key with a fixed seeded hash and keep the k SMALLEST
hashes per group. Because a key always hashes to the same value:

* the sample is a uniform k-subset of the group's distinct keys
  (order statistics of the hash are uniform);
* it is DETERMINISTIC and layout-invariant — same corpus, same
  sample, any partitioning;
* merge is idempotent: union two sketches and re-take the k smallest
  — duplicate keys collapse (same hash), re-merging a batch is
  harmless (unlike the additive t-digest/CMS artifacts);
* the k-th smallest normalized hash doubles as a distinct-count
  estimator: n̂ = (k−1)/h_(k) with relative error ~1/sqrt(k−2)
  (:func:`kmv_distinct_estimate`) — a cross-check for the HLL
  artifacts that additionally carries examples.

Spark shape — the ``operators.heavy`` two-phase discipline:

* **phase 1, zero shuffle**: ``xxhash64(seed, key)`` is computed
  JVM-side, then a ``mapInPandas`` scan keeps each partition's k
  smallest distinct keys per group (bounded state; duplicate keys
  collapse in-partition, ties on payload resolve to the least
  payload tuple for determinism);
* **phase 2, bounded shuffle**: the ≤ partitions·k candidate rows
  per group shuffle once for the global dedup + top-k window. Raw
  rows never shuffle.

NULL keys are excluded (a sample slot spent on NULL is meaningless;
COUNT(DISTINCT) semantics for the estimator); NULL group keys are
their own group (SQL GROUP BY semantics). Payload columns must be
orderable types (the deterministic tie-break sorts by them).

Reference scope note: north-star extension (SURVEY.md §2 extensions);
the reference has no sampling-sketch surface.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_K = 1_000_000

HASH_COL = "kmv_hash"


def bottomk_summary(df: DataFrame, key_col: str, k: int,
                    group_cols: Sequence[str] = (),
                    payload_cols: Sequence[str] = (),
                    seed: int = 0) -> DataFrame:
    """(group_cols..., key_col, kmv_hash, payload_cols...): at most
    ``k`` rows per group — the k distinct keys with the smallest
    ``xxhash64(seed, key)``, each carrying the lexicographically
    least payload tuple observed for that key. The per-batch/corpus
    artifact; persist as parquet, grow with :func:`merge_bottomk`."""
    if not (0 < k <= MAX_K):
        raise ValueError(f"k must be in (0, {MAX_K}], got {k}")
    gcols = list(group_cols)
    pcols = list(payload_cols)
    overlap = {key_col, HASH_COL} & set(pcols) | \
        ({HASH_COL} & set(gcols + [key_col]))
    if overlap:
        raise ValueError(f"column collision {overlap}: payload must "
                         f"not repeat the key, and {HASH_COL!r} is "
                         f"reserved")
    hashed = (df.filter(F.col(key_col).isNotNull())
                .withColumn(HASH_COL,
                            F.xxhash64(F.lit(seed), F.col(key_col)))
                .select(*gcols, key_col, HASH_COL, *pcols))
    out_schema = T.StructType([hashed.schema[c]
                               for c in hashed.columns])
    sort_cols = [HASH_COL, key_col, *pcols]

    def partial(batches: Iterator[pd.DataFrame]
                ) -> Iterator[pd.DataFrame]:
        state: pd.DataFrame | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            both = pdf if state is None else pd.concat(
                [state, pdf], ignore_index=True)
            both = both.sort_values(sort_cols, kind="mergesort")
            both = both.drop_duplicates(
                subset=gcols + [key_col], keep="first")
            if gcols:
                both = both.groupby(gcols, dropna=False, sort=False,
                                    group_keys=False).head(k)
            else:
                both = both.head(k)
            state = both.reset_index(drop=True)
        if state is not None and len(state):
            yield state

    partials = hashed.mapInPandas(partial, out_schema)
    return _global_topk(partials, key_col, k, gcols, pcols)


def _global_topk(rows: DataFrame, key_col: str, k: int,
                 gcols: list, pcols: list) -> DataFrame:
    """Dedup-by-key + per-group k-smallest over candidate rows (tiny:
    ≤ partitions·k per group)."""
    if pcols:
        agg = rows.groupBy(*gcols, key_col).agg(
            F.min(HASH_COL).alias(HASH_COL),
            F.min(F.struct(*pcols)).alias("__p"))
    else:
        agg = rows.groupBy(*gcols, key_col).agg(
            F.min(HASH_COL).alias(HASH_COL))
    part = [F.col(c) for c in gcols] if gcols else [F.lit(0)]
    w = Window.partitionBy(*part).orderBy(F.col(HASH_COL).asc(),
                                          F.col(key_col).asc())
    ranked = agg.withColumn("__rn", F.row_number().over(w)) \
                .filter(F.col("__rn") <= k)
    cols = [*gcols, key_col, HASH_COL] \
        + [F.col(f"__p.{c}").alias(c) for c in pcols]
    return ranked.select(*cols)


def merge_bottomk(*summaries: DataFrame, key_col: str, k: int,
                  group_cols: Sequence[str] = (),
                  payload_cols: Sequence[str] = ()) -> DataFrame:
    """Fold several :func:`bottomk_summary` artifacts (same key_col /
    seed / group_cols; k may shrink but never grow beyond the
    smallest build k — a sketch only keeps its k smallest, so asking
    a merge for more would bias the tail) into one artifact with the
    same schema. Idempotent: duplicate keys share a hash and
    collapse, so overlapping batches are safe."""
    if not summaries:
        raise ValueError("merge_bottomk needs at least one summary")
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s, allowMissingColumns=False)
    return _global_topk(out, key_col, k, list(group_cols),
                        list(payload_cols))


def kmv_distinct_estimate(summary: DataFrame, k: int,
                          group_cols: Sequence[str] = ()
                          ) -> DataFrame:
    """(group_cols..., distinct_estimate): the KMV cardinality read
    of a bottom-k artifact. A group holding fewer than k keys is
    EXACT (the sketch has every key); at k the estimate is
    (k−1)/h_(k) with ~1/sqrt(k−2) relative error. Cross-checks the
    HLL artifacts — and unlike them, the evidence rows are sitting in
    the sketch."""
    gcols = list(group_cols)
    # normalize int64 hash to (0, 1]: (h - INT64_MIN) / 2^64
    u = (F.col("__maxh").cast("double")
         - float(-(2 ** 63))) / float(2 ** 64)
    agg = summary.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.max(HASH_COL).alias("__maxh"))
    est = F.when(F.col("__n") < k,
                 F.col("__n").cast("double")) \
           .otherwise((F.lit(float(k - 1)) / u))
    return agg.select(*gcols, est.alias("distinct_estimate"))
