"""Mergeable quantile summaries (t-digest).

The distribution complement of the mergeable artifact family:
``operators.heavy`` answers "which keys dominate", ``operators.
cardinality`` answers "how many distinct", this module answers "what
does the distribution of token counts / quality scores / latencies
look like" — per ingest batch, merged across a growing corpus without
rescanning old data.

Spark's own ``percentile_approx`` (Greenwald-Khanna) answers one-shot
quantile queries well, but its sketch is not exposed as a persistable,
mergeable artifact — you cannot keep one summary row per batch and
fold new batches in. The t-digest (Dunning & Ertl, "Computing
extremely accurate quantiles using t-digests", 2019) is built for
exactly that: a bounded list of (mean, weight) centroids whose sizes
follow a scale function that keeps tail quantiles sharp, and whose
merge is just concatenate-and-recompress.

Implementation notes:

* Scale function k1: ``k(q) = δ/(2π)·asin(2q−1)`` — centroids near
  q=0/q=1 stay tiny, so p99/p999 stay accurate; mid quantiles carry
  rank error O(1/δ) (δ = ``compression``, default 200 → ≲1%).
* Compression is the vectorized k-bin variant: sort, assign each
  point/centroid to the k-space bin of its cumulative-rank center,
  one ``bincount`` per flush — no per-value Python loop.
* min/max/count ride alongside exactly, so p=0 / p=1 are EXACT and
  ``count`` is the true non-null row count.
* NULL and NaN values are EXCLUDED (``percentile_approx``
  semantics); a NULL in a GROUP column is its own group (SQL GROUP
  BY semantics).

Spark shape — two stages, digests only on the wire:

1. **per-partition build, zero shuffle**: ``mapInPandas`` folds each
   partition's rows into one digest per (partition × group); state is
   bounded (≤ groups × O(δ) centroids + a flush buffer).
2. **per-group merge**: ``groupBy(group).applyInPandas`` concatenates
   the per-partition digests and recompresses. The shuffle carries
   one digest row per partition per group — never raw values.

The artifact is a plain DataFrame (group cols + centroid arrays +
count/min/max), so it persists as parquet and merges across batches
via :func:`merge_quantile_summaries` — same pattern as the HLL and
Misra-Gries artifacts. Estimates are NOT bit-identical across
partition layouts (merge order shifts centroid boundaries); the rank
error bound holds for any layout, and tests pin it.

Reference scope note: north-star extension (SURVEY.md §2 extensions);
the reference's quantile use (``quantile()`` summaries in
Final_Scripts) is covered by the exact/GK operators in
``operators.aggregates``; this module is the growing-corpus form.
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DIGEST_FIELDS = ("means", "weights", "count", "min", "max")

# per-group flush buffer: compress once this many raw values pile up
_BUFFER_FACTOR = 10


def _digest_schema(group_fields: Sequence[T.StructField]
                   ) -> T.StructType:
    return T.StructType(list(group_fields) + [
        T.StructField("means", T.ArrayType(T.DoubleType()), False),
        T.StructField("weights", T.ArrayType(T.DoubleType()), False),
        T.StructField("count", T.LongType(), False),
        T.StructField("min", T.DoubleType(), True),
        T.StructField("max", T.DoubleType(), True),
    ])


def _compress(means: np.ndarray, weights: np.ndarray,
              compression: int) -> tuple[np.ndarray, np.ndarray]:
    """One k-bin compression pass: sort by mean, bin by the k1 scale
    function of each centroid's cumulative-rank CENTER, merge bins by
    weighted mean. Bounded output: ≤ compression+1 centroids."""
    if len(means) == 0:
        return means.astype(float), weights.astype(float)
    order = np.argsort(means, kind="mergesort")
    m = means[order].astype(float)
    w = weights[order].astype(float)
    n = w.sum()
    q_center = (np.cumsum(w) - w / 2.0) / n
    q_center = np.clip(q_center, 0.0, 1.0)
    k = (compression / (2.0 * math.pi)
         * np.arcsin(2.0 * q_center - 1.0))
    bins = np.floor(k + compression / 4.0).astype(np.int64)
    # bins is non-decreasing (q_center sorted); relabel consecutively
    uniq, inv = np.unique(bins, return_inverse=True)
    out_w = np.bincount(inv, weights=w)
    out_m = np.bincount(inv, weights=w * m) / out_w
    return out_m, out_w


class _GroupDigest:
    """Mutable per-group build state: centroids + a raw-value buffer
    flushed through _compress when it grows past BUFFER_FACTOR·δ."""

    __slots__ = ("means", "weights", "count", "vmin", "vmax", "buf",
                 "compression")

    def __init__(self, compression: int):
        self.compression = compression
        self.means = np.empty(0)
        self.weights = np.empty(0)
        self.count = 0
        self.vmin = None
        self.vmax = None
        self.buf: list[np.ndarray] = []

    def add(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        self.count += len(values)
        lo, hi = float(values.min()), float(values.max())
        self.vmin = lo if self.vmin is None else min(self.vmin, lo)
        self.vmax = hi if self.vmax is None else max(self.vmax, hi)
        self.buf.append(values.astype(float))
        if (sum(len(b) for b in self.buf)
                >= _BUFFER_FACTOR * self.compression):
            self.flush()

    def flush(self) -> None:
        if self.buf:
            raw = np.concatenate(self.buf)
            self.buf = []
            self.means, self.weights = _compress(
                np.concatenate([self.means, raw]),
                np.concatenate([self.weights,
                                np.ones(len(raw))]),
                self.compression)


def _clean_values(col: pd.Series) -> np.ndarray:
    vals = pd.to_numeric(col, errors="coerce").to_numpy(dtype=float)
    return vals[~np.isnan(vals)]


def quantile_summary(df: DataFrame, value_col: str,
                     group_cols: Sequence[str] = (),
                     compression: int = 200) -> DataFrame:
    """(group_cols..., means, weights, count, min, max): one t-digest
    row per group — the per-batch artifact. Empty groups never
    appear; an all-NULL group appears with count=0 and NULL min/max
    (it was observed, just valueless)."""
    if compression < 10:
        raise ValueError(f"compression must be >= 10, "
                         f"got {compression}")
    gcols = list(group_cols)
    group_fields = [df.schema[c] for c in gcols]
    out_schema = _digest_schema(group_fields)
    src = df.select(*gcols, value_col)

    def build(batches: Iterator[pd.DataFrame]
              ) -> Iterator[pd.DataFrame]:
        state: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            if gcols:
                grouped = pdf.groupby(gcols, dropna=False, sort=False)
                for key, sub in grouped:
                    if not isinstance(key, tuple):
                        key = (key,)
                    dig = state.get(key)
                    if dig is None:
                        dig = state[key] = _GroupDigest(compression)
                    dig.add(_clean_values(sub[value_col]))
            else:
                dig = state.get(())
                if dig is None:
                    dig = state[()] = _GroupDigest(compression)
                dig.add(_clean_values(pdf[value_col]))
        for key, dig in state.items():
            dig.flush()
            row = {c: [None if pd.isna(v) else v]
                   for c, v in zip(gcols, key)}
            row.update({
                "means": [dig.means.tolist()],
                "weights": [dig.weights.tolist()],
                "count": [dig.count],
                "min": [dig.vmin],
                "max": [dig.vmax],
            })
            yield pd.DataFrame(row)

    per_part = src.mapInPandas(build, out_schema)
    return _merge_digest_rows(per_part, gcols, compression)


def _merge_digest_rows(rows: DataFrame, gcols: Sequence[str],
                       compression: int) -> DataFrame:
    """groupBy(group).applyInPandas: concatenate digests,
    recompress. The shuffle carries digest rows only."""
    gcols = list(gcols)
    group_fields = [rows.schema[c] for c in gcols]
    out_schema = _digest_schema(group_fields)
    key_cols = gcols or ["__g"]
    if not gcols:
        rows = rows.withColumn("__g", F.lit(0))

    def merge(key, pdf):
        all_m = np.concatenate([np.asarray(m, dtype=float)
                                for m in pdf["means"]]) \
            if len(pdf) else np.empty(0)
        all_w = np.concatenate([np.asarray(w, dtype=float)
                                for w in pdf["weights"]]) \
            if len(pdf) else np.empty(0)
        m, w = _compress(all_m, all_w, compression)
        mins = pdf["min"].dropna()
        maxs = pdf["max"].dropna()
        row = {c: [k] for c, k in zip(key_cols, key) if c != "__g"}
        row.update({
            "means": [m.tolist()],
            "weights": [w.tolist()],
            "count": [int(pdf["count"].sum())],
            "min": [float(mins.min()) if len(mins) else None],
            "max": [float(maxs.max()) if len(maxs) else None],
        })
        return pd.DataFrame(row)

    return rows.groupBy(*key_cols).applyInPandas(merge, out_schema)


def merge_quantile_summaries(*summaries: DataFrame,
                             compression: int = 200,
                             group_cols: Sequence[str] | None = None
                             ) -> DataFrame:
    """Fold several :func:`quantile_summary` artifacts (same
    group_cols; same or compatible compression) into one summary with
    the same schema — the growing-corpus move: per-batch digests
    union + recompress, old batches never rescanned. NOT idempotent
    (re-merging a batch double-counts it — unlike the OR/union
    sketches, t-digest weights add), so track which batches an
    artifact already covers.

    ``group_cols=None`` infers the grouping as every non-digest
    column — correct for bare quantile_summary artifacts."""
    from ._fold import fold_union

    out = fold_union(summaries, "merge_quantile_summaries")
    gcols = ([c for c in out.columns if c not in _DIGEST_FIELDS]
             if group_cols is None else list(group_cols))
    out = out.select(*gcols, *_DIGEST_FIELDS)
    return _merge_digest_rows(out, gcols, compression)


def quantile_estimate(summary: DataFrame,
                      probabilities: Sequence[float]
                      ) -> DataFrame:
    """(group_cols..., probability, quantile): interpolated quantile
    estimates from a (possibly merged) summary. One row per group per
    probability; p=0 and p=1 return the exact min/max. Pure map-side
    work over artifact rows (≤ groups rows)."""
    probs = [float(p) for p in probabilities]
    if not probs:
        raise ValueError("probabilities must be non-empty")
    for p in probs:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"probability {p} outside [0, 1]")
    gcols = [c for c in summary.columns if c not in _DIGEST_FIELDS]

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def estimate(means: pd.Series, weights: pd.Series,
                 count: pd.Series, vmin: pd.Series,
                 vmax: pd.Series) -> pd.Series:
        out = []
        for m, w, c, lo, hi in zip(means, weights, count, vmin, vmax):
            out.append(_quantiles_from_digest(
                np.asarray(m, dtype=float), np.asarray(w, dtype=float),
                lo, hi, probs))
        return pd.Series(out)

    probs_lit = F.array(*[F.lit(p) for p in probs])
    est = summary.withColumn(
        "__est", estimate("means", "weights", "count", "min", "max"))
    pair = F.explode(F.arrays_zip(probs_lit.alias("probability"),
                                  F.col("__est").alias("quantile")))
    return est.select(*gcols, pair.alias("__pq")) \
              .select(*gcols,
                      F.col("__pq.probability").alias("probability"),
                      F.col("__pq.quantile").alias("quantile"))


def _quantiles_from_digest(means: np.ndarray, weights: np.ndarray,
                           vmin, vmax,
                           probs: Sequence[float]) -> list:
    """Standard t-digest interpolation: centroid centers at
    cumulative-rank midpoints, linear between neighbours, pinned to
    exact min/max at the ends."""
    if len(means) == 0 or vmin is None or pd.isna(vmin):
        return [None] * len(probs)
    n = weights.sum()
    centers = np.cumsum(weights) - weights / 2.0
    xs = np.concatenate(([0.0], centers, [n]))
    ys = np.concatenate(([float(vmin)], means, [float(vmax)]))
    ranks = np.asarray(probs, dtype=float) * n
    return np.interp(ranks, xs, ys).tolist()


def _cdf_from_digest(means: np.ndarray, weights: np.ndarray,
                     vmin, vmax, xs_query: np.ndarray) -> np.ndarray:
    """Rank fraction at each query value — the inverse of
    :func:`_quantiles_from_digest`, same centroid-center
    interpolation."""
    n = weights.sum()
    centers = np.cumsum(weights) - weights / 2.0
    xs = np.concatenate(([float(vmin)], means, [float(vmax)]))
    rs = np.concatenate(([0.0], centers, [n]))
    return np.interp(xs_query, xs, rs) / n


def psi_from_digests(reference: DataFrame, current: DataFrame,
                     n_buckets: int = 10,
                     group_cols: Sequence[str] = ()) -> DataFrame:
    """(group_cols..., psi, n_ref, n_cur): Population Stability Index
    between two archived t-digest artifacts of the SAME metric — the
    ``operators.drift`` question answered from the artifact store,
    with neither snapshot rescanned. Buckets are the reference
    digest's quantile edges (the drift module's convention); each
    side's bucket shares come from its digest's CDF; the PSI formula
    and ``_EPS`` smoothing are drift's own, so its thresholds
    (``drifted_columns``' 0.25 alert default) carry over. Accuracy inherits the
    digest rank error (~1/compression per edge) — parity with the
    raw-data ``psi_report`` is tested to a small absolute band.

    Differences from raw-data PSI, by construction: digests hold
    non-NULL, non-NaN values only, so the NULL/NaN drift buckets do
    not exist here (compare ``count`` against raw row counts for
    nullability drift); a group empty or missing on either side
    reports psi NULL (appeared/vanished — drift by definition,
    flagged rather than faked). Pure driver-side math over artifact
    rows (≤ groups, bounded)."""
    from .drift import _EPS

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    gcols = list(group_cols)

    def collect(summary):
        out = {}
        for r in summary.collect():
            key = tuple(r[c] for c in gcols)
            if key in out:
                raise ValueError(
                    f"multiple digest rows for group {key}: this is "
                    f"an unmerged artifact (e.g. a per-batch "
                    f"append dir) — fold it with "
                    f"merge_quantile_summaries first")
            out[key] = r
        return out

    ref = collect(reference)
    cur = collect(current)
    rows = []
    for key in sorted(set(ref) | set(cur),
                      key=lambda t: tuple(str(v) for v in t)):
        a, b = ref.get(key), cur.get(key)
        n_ref = int(a["count"]) if a is not None else 0
        n_cur = int(b["count"]) if b is not None else 0
        if n_ref == 0 or n_cur == 0:
            rows.append((*key, None, n_ref, n_cur))
            continue
        am = np.asarray(a["means"], dtype=float)
        aw = np.asarray(a["weights"], dtype=float)
        probs = [i / n_buckets for i in range(1, n_buckets)]
        edges = np.asarray(_quantiles_from_digest(
            am, aw, a["min"], a["max"], probs), dtype=float)

        def shares(row):
            m = np.asarray(row["means"], dtype=float)
            w = np.asarray(row["weights"], dtype=float)
            cdf = _cdf_from_digest(m, w, row["min"], row["max"],
                                   np.clip(edges, row["min"],
                                           row["max"]))
            # clamp handles edges outside this side's observed range:
            # below-min edges read CDF 0, above-max read 1
            cdf = np.concatenate(([0.0], cdf, [1.0]))
            return np.diff(cdf)

        p = np.maximum(shares(a), _EPS)
        q = np.maximum(shares(b), _EPS)
        psi = float(np.sum((q - p) * np.log(q / p)))
        rows.append((*key, round(psi, 6), n_ref, n_cur))

    spark = reference.sparkSession
    schema_cols = ", ".join(
        [f"`{c}` {reference.schema[c].dataType.simpleString()}"
         for c in gcols]
        + ["psi double", "n_ref long", "n_cur long"])
    return spark.createDataFrame(rows, schema_cols)


def quantile_report(df: DataFrame, value_col: str,
                    probabilities: Sequence[float],
                    group_cols: Sequence[str] = (),
                    compression: int = 200) -> DataFrame:
    """One-shot (group_cols..., probability, quantile) — summary +
    estimate in a single pipeline for callers that don't need the
    artifact. At 100 TB the shuffle carries one digest per partition
    per group instead of every value (the exact grouped-median
    operator shuffles raw rows; this one never does)."""
    return quantile_estimate(
        quantile_summary(df, value_col, group_cols, compression),
        probabilities)
