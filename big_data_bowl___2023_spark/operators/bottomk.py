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
    """(group_cols..., key_col, kmv_hash, payload_cols..., kmv_k,
    kmv_seed): at most ``k`` rows per group — the k distinct keys
    with the smallest ``xxhash64(seed, key)``, each carrying the
    least payload tuple observed for that key (NULL payload fields
    sort FIRST, the Spark ordering, so the pick is layout-invariant).
    ``kmv_k`` / ``kmv_seed`` record the build parameters on every
    row, making the artifact self-describing: merges and the
    estimators validate against them (two sketches hashed with
    different seeds are numerically incomparable, and for large
    corpora no co-occurring sketch key would reveal it). The
    per-batch/corpus artifact; persist as parquet, grow with
    :func:`merge_bottomk`."""
    if not (0 < k <= MAX_K):
        raise ValueError(f"k must be in (0, {MAX_K}], got {k}")
    gcols = list(group_cols)
    pcols = list(payload_cols)
    # every output column must be distinct: key vs payload vs group
    # overlaps (not just the reserved meta names) would produce an
    # ambiguous duplicate-named select
    out_cols = gcols + [key_col, HASH_COL] + pcols \
        + ["kmv_k", "kmv_seed"]
    dupes = {c for c in out_cols if out_cols.count(c) > 1}
    if dupes:
        raise ValueError(
            f"column collision {sorted(dupes)}: group/key/payload "
            f"columns must be pairwise distinct, and "
            f"{HASH_COL!r}/'kmv_k'/'kmv_seed' are reserved")
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
            # na_position="first" matches Spark's NULLS FIRST struct
            # ordering in phase 2 — without it a NULL-payload row
            # would win in one phase and lose in the other, making
            # the artifact depend on partitioning
            both = both.sort_values(sort_cols, kind="mergesort",
                                    na_position="first")
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
    return _global_topk(partials, key_col, k, gcols, pcols, seed)


def _with_meta(df: DataFrame, k: int, seed: int) -> DataFrame:
    return df.withColumn("kmv_k", F.lit(int(k)).cast("int")) \
             .withColumn("kmv_seed", F.lit(int(seed)).cast("long"))


def _rank_topk(df: DataFrame, key_col: str, k: int,
               gcols: list) -> DataFrame:
    """Per-group k smallest (hash, key) rows — the ONE ranking used
    by build, merge, and overlap estimation."""
    part = [F.col(c) for c in gcols] if gcols else [F.lit(0)]
    w = Window.partitionBy(*part).orderBy(F.col(HASH_COL).asc(),
                                          F.col(key_col).asc())
    return df.withColumn("__rn", F.row_number().over(w)) \
             .filter(F.col("__rn") <= k)


def _kmv_estimate_expr(k: int, n_col: str = "__n",
                       maxh_col: str = "__maxh"):
    """(k−1)/h_(k) on the (0,1]-normalized max sketch hash; exact n
    below k — the ONE estimator expression (distinct and overlap
    reads share it)."""
    u = (F.col(maxh_col).cast("double")
         - float(-(2 ** 63))) / float(2 ** 64)
    return F.when(F.col(n_col) < k, F.col(n_col).cast("double")) \
            .otherwise(F.lit(float(k - 1)) / u)


def _global_topk(rows: DataFrame, key_col: str, k: int,
                 gcols: list, pcols: list, seed: int) -> DataFrame:
    """Dedup-by-key + per-group k-smallest over candidate rows (tiny:
    ≤ partitions·k per group)."""
    if pcols:
        agg = rows.groupBy(*gcols, key_col).agg(
            F.min(HASH_COL).alias(HASH_COL),
            F.min(F.struct(*pcols)).alias("__p"))
    else:
        agg = rows.groupBy(*gcols, key_col).agg(
            F.min(HASH_COL).alias(HASH_COL))
    ranked = _rank_topk(agg, key_col, k, gcols)
    cols = [*gcols, key_col, HASH_COL] \
        + [F.col(f"__p.{c}").alias(c) for c in pcols]
    return _with_meta(ranked.select(*cols), k, seed)


def merge_bottomk(*summaries: DataFrame, key_col: str, k: int,
                  group_cols: Sequence[str] = (),
                  payload_cols: Sequence[str] = ()) -> DataFrame:
    """Fold several :func:`bottomk_summary` artifacts (same key_col /
    seed / group_cols; k may shrink but never grow beyond the
    smallest build k — a sketch only keeps its k smallest, so asking
    a merge for more would bias the tail) into one artifact with the
    same schema. Idempotent: duplicate keys share a hash and
    collapse, so overlapping batches are safe."""
    from ._fold import fold_union

    out = fold_union(summaries, "merge_bottomk")
    meta = out.select("kmv_k", "kmv_seed").distinct().collect()
    build_k = sorted({r["kmv_k"] for r in meta})
    seeds = sorted({r["kmv_seed"] for r in meta})
    if len(seeds) != 1:
        raise ValueError(
            f"artifacts were built with different seeds {seeds}: "
            f"their hashes are numerically incomparable and cannot "
            f"merge")
    if any(k > bk for bk in build_k):
        raise ValueError(
            f"merge k={k} exceeds a build k in {build_k}: a "
            f"sketch only kept its k smallest keys, so a larger "
            f"merge k would produce a hash-truncated, tail-biased "
            f"sample presented as a uniform k-sample")
    return _global_topk(out.drop("kmv_k", "kmv_seed"), key_col, k,
                        list(group_cols), list(payload_cols),
                        seeds[0])


def kmv_distinct_estimate(summary: DataFrame,
                          group_cols: Sequence[str] = ()
                          ) -> DataFrame:
    """(group_cols..., distinct_estimate): the KMV cardinality read
    of a bottom-k artifact. ``k`` is read from the artifact's own
    ``kmv_k`` column (passing a wrong k here was the one way to make
    a full sketch read as an 'exact' undercount). A group holding
    fewer than k keys is EXACT (the sketch has every key); at k the
    estimate is (k−1)/h_(k) with ~1/sqrt(k−2) relative error.
    Cross-checks the HLL artifacts — and unlike them, the evidence
    rows are sitting in the sketch."""
    gcols = list(group_cols)
    ks = [r["kmv_k"] for r in
          summary.select("kmv_k").distinct().collect()]
    if not ks:
        raise ValueError("empty bottom-k artifact: nothing to "
                         "estimate from")
    if len(ks) != 1:
        raise ValueError(f"artifact carries mixed build k {sorted(ks)}"
                         f"; merge to a single k first")
    k = int(ks[0])
    agg = summary.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.max(HASH_COL).alias("__maxh"))
    return agg.select(*gcols, _kmv_estimate_expr(k)
                      .alias("distinct_estimate"))


def kmv_overlap_estimate(a: DataFrame, b: DataFrame, key_col: str,
                         group_cols: Sequence[str] = ()
                         ) -> DataFrame:
    """(group_cols..., jaccard, intersection_estimate,
    union_estimate): set-overlap estimates between two corpora FROM
    THEIR BOTTOM-K ARTIFACTS ALONE — no corpus join, no rescan. The
    classic bottom-k set operation (Cohen & Kaplan, PODC'07): the k
    smallest hashes of A∪B are a uniform sample of the union, so the
    fraction of them present in BOTH sketches estimates the Jaccard
    similarity (σ ≈ sqrt(J(1−J)/k)), and the union's KMV cardinality
    scales it to an intersection count. Groups where both sketches
    hold every key (below k) are EXACT.

    Guards: both artifacts must share the build k AND the hash seed
    — both read from the artifacts' own ``kmv_k``/``kmv_seed``
    metadata (a seed mismatch makes the two hash scales numerically
    incomparable and would read as jaccard ≈ 0, the false
    'no contamination' answer; co-occurring-key hash disagreement is
    kept as a belt-and-braces second check but is vanishingly rare
    at corpus scale, ~k²/n). The use case is
    `dedup.clusters.source_overlap_matrix`'s question at artifact
    cost: cross-source/cross-snapshot contamination screening before
    deciding to run the exact pair join."""
    gcols = list(group_cols)
    meta = a.select("kmv_k", "kmv_seed").union(
        b.select("kmv_k", "kmv_seed")).distinct().collect()
    if not meta:
        raise ValueError("empty bottom-k artifacts: nothing to "
                         "estimate overlap from")
    ks = sorted({r["kmv_k"] for r in meta})
    seeds = sorted({r["kmv_seed"] for r in meta})
    if len(seeds) != 1:
        raise ValueError(
            f"artifacts were built with different seeds {seeds}: "
            f"their hash scales are incomparable — overlap would "
            f"silently read as zero")
    if len(ks) != 1:
        raise ValueError(f"overlap estimation needs one shared build "
                         f"k, got {ks}")
    k = int(ks[0])
    ta = a.select(*gcols, key_col, HASH_COL) \
        .withColumn("__in_a", F.lit(True)) \
        .withColumn("__in_b", F.lit(False))
    tb = b.select(*gcols, key_col, HASH_COL) \
        .withColumn("__in_a", F.lit(False)) \
        .withColumn("__in_b", F.lit(True))
    both = ta.unionByName(tb)
    per_key = both.groupBy(*gcols, key_col).agg(
        F.min(HASH_COL).alias(HASH_COL),
        F.max(HASH_COL).alias("__hmax"),
        F.max("__in_a").alias("__in_a"),
        F.max("__in_b").alias("__in_b"))
    # the belt-and-braces co-occurring-key hash check rides the SAME
    # aggregation as the estimate (no separate eager count() job —
    # the round-7 ADVICE #3 double-cost): rank over ALL per-key rows,
    # restrict the estimator aggregates to the top-k conditionally,
    # and count disagreeing keys group-wide alongside them. The
    # window and the groupBy share the group keys, so this stays one
    # shuffle.
    part = [F.col(c) for c in gcols] if gcols else [F.lit(0)]
    w = Window.partitionBy(*part).orderBy(F.col(HASH_COL).asc(),
                                          F.col(key_col).asc())
    ranked = per_key.withColumn("__rn", F.row_number().over(w))
    in_k = F.col("__rn") <= k
    agg = ranked.groupBy(*gcols).agg(
        F.sum(in_k.cast("long")).alias("__n"),
        F.max(F.when(in_k, F.col(HASH_COL))).alias("__maxh"),
        F.sum(F.when(in_k & F.col("__in_a") & F.col("__in_b"),
                     F.lit(1)).otherwise(F.lit(0))).alias("__inter"),
        F.sum((F.col(HASH_COL) != F.col("__hmax")).cast("long"))
        .alias("__badn"))
    union_est = _kmv_estimate_expr(k)
    # surfaces when the result is computed (laziness preserved): a
    # key hashed differently by the two artifacts means mixed seeds
    # slipped past the metadata guard — poison the output instead of
    # returning the false 'no contamination' jaccard≈0 answer
    guard = F.when(
        F.col("__badn") > 0,
        F.raise_error(F.format_string(
            "%s key(s) carry two different kmv_hash values across "
            "the two artifacts — they were built with different "
            "seeds and cannot be compared", F.col("__badn"))))
    # the guard wraps EVERY output column — a caller selecting only
    # union_estimate must still hit it (column pruning would
    # otherwise drop a jaccard-only guard and return a corrupt
    # cardinality silently)
    def checked(expr):
        return F.when(F.col("__badn") > 0,
                      guard.cast("double")).otherwise(expr)

    jaccard = F.col("__inter") / F.col("__n")
    return agg.select(
        *gcols,
        checked(jaccard).alias("jaccard"),
        checked(jaccard * union_est).alias("intersection_estimate"),
        checked(union_est).alias("union_estimate"))


def kmv_overlap_matrix(summary: DataFrame, key_col: str,
                       group_col: str) -> DataFrame:
    """(group_a, group_b, jaccard, intersection_estimate,
    union_estimate) for EVERY unordered group pair, from ONE grouped
    bottom-k artifact — `dedup.clusters.source_overlap_matrix`'s
    answer at artifact cost: no pair join, no corpus scan, just the
    :func:`kmv_overlap_estimate` math applied per pair over the
    collected sketch rows (bounded: groups × k). Pairs where both
    groups' sketches hold every key (below k) are EXACT. One hash
    seed by construction (a single artifact), so the cross-artifact
    seed guard is unnecessary here."""
    rows = summary.collect()
    if not rows:
        raise ValueError("empty bottom-k artifact: nothing to "
                         "estimate overlap from")
    ks = {r["kmv_k"] for r in rows}
    if len(ks) != 1:
        raise ValueError(f"artifact carries mixed build k "
                         f"{sorted(ks)}; merge to a single k first")
    k = int(ks.pop())
    by_group: dict = {}
    for r in rows:
        by_group.setdefault(r[group_col], {})[r[key_col]] = \
            int(r[HASH_COL])
    groups = sorted(by_group, key=str)
    out = []
    for i, ga in enumerate(groups):
        for gb in groups[i + 1:]:
            a, b = by_group[ga], by_group[gb]
            union = sorted(
                ((h, key) for key, h in {**a, **b}.items()))[:k]
            n = len(union)
            inter = sum(1 for h, key in union
                        if key in a and key in b)
            if n < k:
                union_est = float(n)
            else:
                maxh = union[-1][0]
                u = (maxh + 2.0 ** 63) / 2.0 ** 64
                union_est = (k - 1) / u
            j = inter / n if n else 0.0
            out.append((ga, gb, j, j * union_est, union_est))
    gtype = summary.schema[group_col].dataType.simpleString()
    return summary.sparkSession.createDataFrame(
        out, f"group_a {gtype}, group_b {gtype}, jaccard double, "
             f"intersection_estimate double, union_estimate double")
