"""Mergeable point-frequency summaries (count-min sketch).

The last member of the mergeable-artifact family: ``operators.heavy``
keeps the EXACT counts of the heavy keys and nothing else;
``operators.cardinality`` counts distincts; ``dedup.bloom`` answers
membership; this module answers "approximately how often does ANY
given key occur" — including the billion-key tail that Misra-Gries
deliberately forgets — from a bounded counter matrix (Cormode &
Muthukrishnan, "An improved data stream summary: the count-min
sketch and its applications", J. Algorithms 2005).

Guarantees (depth d = ⌈ln 1/δ⌉ rows, width w = ⌈e/ε⌉ counters):
estimate ≥ true count ALWAYS (one-sided), and estimate ≤ true count
+ ε·N with probability ≥ 1−δ (N = total weight). Counters are plain
sums, so two sketches over disjoint batches merge by cell-wise
addition — per-batch artifacts fold into corpus-lifetime frequencies
without rescanning old data. Unlike the Bloom filter's OR, addition
is NOT idempotent: re-merging a batch double-counts it, so track
coverage (same contract as the t-digest artifacts).

Corpus use cases: shingle document-frequency for IDF/stop-term cuts
without materializing the full posting counts; token frequencies for
vocab pruning; per-domain request rates — anywhere the answer is a
lookup against a frequency table too large to keep exactly.

Spark shape — the same discipline as dedup/bloom.py:

* **hashing is JVM codegen**: two ``xxhash64`` columns; row ``i`` of
  the sketch uses position ``(h1 + i·h2') mod w`` (pairwise-
  independent enough in practice; Kirsch-Mitzenmacher double
  hashing), so build and probe agree by construction.
* **the artifact is SPARSE**: one ``(row_idx, col_idx, count)`` row
  per non-zero counter, built per-partition with ``mapInPandas``
  (zero shuffle) and combined with a map-side-combinable
  ``groupBy.sum`` — bounded by d·w cells, not input rows. Merging
  batches is union + the same sum (an append-only parquet dir of
  per-batch summaries is therefore a valid sketch: cms_matrix sums
  duplicate cells).
* **probing is map-side**: the dense d×w matrix broadcasts and an
  Arrow-batched pandas UDF takes the min over d counters per key.

NULL keys are EXCLUDED on build (COUNT(key) semantics) and probe
NULL (SQL-unknown), mirroring the Bloom module.

The artifact also records the sketched key's Spark type
(``key_type``, `simpleString()` form): xxhash64 of int 5 and string
"5" differ, so probing or inner-producting sketches built over
differently-typed keys is silently meaningless — exactly like an
equi-join over incomparable key types. Probe/join entry points
REFUSE a known mismatch; artifacts without the column (pre-round-9
parquet, the streaming faces' pruned emissions) skip the check —
the guard never claims more than the artifact records. ``key_type``
is therefore a reserved column name for ``group_cols``.

Reference scope note: north-star extension (SURVEY.md §2 extensions);
the reference has no frequency-sketch surface.
"""

from __future__ import annotations

import math
from typing import Iterator, NamedTuple, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..dedup.bloom import _hash_cols, _positions

# dense d×w int64 broadcast guard: 64 Mi counters = 512 MiB
MAX_CELLS = 64 * 1024 * 1024


class CmsParams(NamedTuple):
    width: int
    depth: int


def cms_parameters(epsilon: float = 1e-4,
                   delta: float = 0.01) -> CmsParams:
    """Width/depth for overestimate ≤ ε·N with probability ≥ 1−δ:
    w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉. The defaults (ε=1e-4, δ=0.01) give a
    5×27183 ≈ 1 MB sketch."""
    if not (0.0 < epsilon < 1.0):
        raise ValueError(f"epsilon must be in (0, 1), got {epsilon}")
    if not (0.0 < delta < 1.0):
        raise ValueError(f"delta must be in (0, 1), got {delta}")
    w = int(math.ceil(math.e / epsilon))
    d = max(1, int(math.ceil(math.log(1.0 / delta))))
    if w * d > MAX_CELLS:
        raise ValueError(
            f"epsilon={epsilon}, delta={delta} needs {w * d} "
            f"counters (> {MAX_CELLS}); a tolerance this tight is a "
            f"full frequency table — use groupBy().count()")
    return CmsParams(w, d)


_SPARSE_SCHEMA = T.StructType([
    T.StructField("row_idx", T.IntegerType(), False),
    T.StructField("col_idx", T.LongType(), False),
    T.StructField("count", T.LongType(), False),
    T.StructField("width", T.LongType(), False),
    T.StructField("depth", T.IntegerType(), False),
])


def cms_summary(df: DataFrame, key_col: str, width: int, depth: int,
                weight_col: str | None = None,
                group_cols: Sequence[str] = ()) -> DataFrame:
    """(group_cols..., row_idx, col_idx, count, width, depth): sparse
    non-zero-cell form of the count-min sketch over ``key_col``'s
    non-NULL values — the per-batch artifact; with ``group_cols`` one
    independent sketch per group (per-source / per-window key
    frequencies — partition-local state is groups × d×w, so size the
    matrix down when groups are many). ``weight_col`` adds that
    column's value per row instead of 1 (e.g. pre-aggregated (key, n)
    inputs; NULL weights count 0; weights must be NON-NEGATIVE
    INTEGERS — negative or fractional values fail the build rather
    than silently breaking the one-sided guarantee). Zero-shuffle
    per-partition build + one bounded cell-keyed sum (map-side
    partial agg). The ungrouped artifact carries an anchor cell so it
    is self-describing even for empty input; a GROUP appears only
    when it has non-NULL-key rows (groups of an empty input are
    unknowable). A trailing ``key_type`` literal records the key's
    Spark type so probes/joins can refuse cross-type use (module
    docstring)."""
    if width <= 0 or depth <= 0:
        raise ValueError(f"width and depth must be positive, got "
                         f"({width}, {depth})")
    if width * depth > MAX_CELLS:
        raise ValueError(f"width*depth {width * depth} exceeds the "
                         f"dense broadcast guard {MAX_CELLS}")
    gcols = list(group_cols)
    if "key_type" in gcols:
        raise ValueError("cms_summary: 'key_type' is reserved for "
                         "the artifact's own key-type record — "
                         "rename the group column")
    key_type = df.schema[key_col].dataType.simpleString()
    cols = [*gcols, "__h1", "__h2"] \
        + ([weight_col] if weight_col else [])
    hashed = _hash_cols(df, key_col) \
        .filter(F.col(key_col).isNotNull()).select(*cols)
    group_fields = [hashed.schema[c] for c in gcols]
    out_schema = T.StructType(list(group_fields)
                              + list(_SPARSE_SCHEMA.fields))

    def weights_of(pdf: pd.DataFrame) -> np.ndarray:
        if not weight_col:
            return np.ones(len(pdf), dtype=np.int64)
        raw_w = pd.to_numeric(pdf[weight_col],
                              errors="coerce").fillna(0)
        wts = raw_w.to_numpy(dtype=np.int64)
        # negative weights would DECREMENT shared cells and break
        # the one-sided estimate>=true guarantee the whole module
        # advertises; fractional weights would silently truncate —
        # both are caller errors, not sketch inputs
        if (wts < 0).any():
            raise ValueError(
                f"cms_summary: negative weight in {weight_col!r} — "
                f"count-min counters are non-negative; deletions "
                f"need a different sketch")
        if (raw_w.to_numpy(dtype=float) != wts).any():
            raise ValueError(
                f"cms_summary: non-integer weight in "
                f"{weight_col!r} would be silently truncated; "
                f"pre-round explicitly")
        return wts

    def fold(cells: np.ndarray, pdf: pd.DataFrame) -> None:
        h1 = pdf["__h1"].to_numpy()
        h2 = pdf["__h2"].to_numpy()
        wts = weights_of(pdf)
        for i, pos in enumerate(_positions(h1, h2, width, depth)):
            np.add.at(cells[i], pos, wts)

    def build(batches: Iterator[pd.DataFrame]
              ) -> Iterator[pd.DataFrame]:
        states: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            if gcols:
                for gkey, sub in pdf.groupby(gcols, dropna=False,
                                             sort=False):
                    if not isinstance(gkey, tuple):
                        gkey = (gkey,)
                    gkey = tuple(None if pd.isna(v) else v
                                 for v in gkey)
                    cells = states.get(gkey)
                    if cells is None:
                        cells = states[gkey] = np.zeros(
                            (depth, width), dtype=np.int64)
                    fold(cells, sub)
            else:
                cells = states.get(())
                if cells is None:
                    cells = states[()] = np.zeros((depth, width),
                                                  dtype=np.int64)
                fold(cells, pdf)
        for gkey, cells in states.items():
            r, c = np.nonzero(cells)
            row = {col: [v] * len(r)
                   for col, v in zip(gcols, gkey)}
            row.update({
                "row_idx": pd.array(r, dtype="int32"),
                "col_idx": pd.array(c, dtype="int64"),
                "count": pd.array(cells[r, c], dtype="int64"),
                "width": pd.array([width] * len(r), dtype="int64"),
                "depth": pd.array([depth] * len(r), dtype="int32"),
            })
            yield pd.DataFrame(row)

    per_part = hashed.mapInPandas(build, out_schema)
    if not gcols:
        # literal anchor row, as in bloom_summary: keeps the
        # ungrouped artifact self-describing when the input is empty
        anchor = df.sparkSession.range(1).select(
            F.lit(0).cast("int").alias("row_idx"),
            F.lit(0).cast("long").alias("col_idx"),
            F.lit(0).cast("long").alias("count"),
            F.lit(width).cast("long").alias("width"),
            F.lit(depth).cast("int").alias("depth"))
        per_part = per_part.unionByName(anchor)
    return (per_part
            .groupBy(*gcols, "row_idx", "col_idx", "width", "depth")
            .agg(F.sum("count").alias("count"))
            .select(*gcols, "row_idx", "col_idx", "count", "width",
                    "depth")
            .withColumn("key_type", F.lit(key_type)))


def merge_cms(*summaries: DataFrame) -> DataFrame:
    """Fold several :func:`cms_summary` artifacts (same width/depth)
    into one: union + cell-wise sum. NOT idempotent — counters add,
    so re-merging a batch double-counts it (track coverage, as with
    the t-digest artifacts)."""
    from ._fold import fold_union

    out = fold_union(summaries, "merge_cms")
    # key_type rides the groupBy when present (all-typed artifacts):
    # same-typed inputs collapse as before; differently-typed inputs
    # yield >1 key_type and every downstream densify/probe refuses.
    # Mixed typed/untyped inputs fail fold_union's strict unionByName.
    kt = ["key_type"] if "key_type" in out.columns else []
    return (out.groupBy("row_idx", "col_idx", "width", "depth", *kt)
               .agg(F.sum("count").alias("count"))
               .select("row_idx", "col_idx", "count", "width",
                       "depth", *kt))


def _collect_cells(summary: DataFrame
                   ) -> tuple[np.ndarray, CmsParams, str | None]:
    """One collect shared by every densifying consumer: the dense
    matrix, the (width, depth) params, and the recorded key type
    (None when the artifact predates the ``key_type`` column)."""
    extra = set(summary.columns) - {"row_idx", "col_idx", "count",
                                    "width", "depth", "key_type"}
    if extra:
        raise ValueError(
            f"grouped cms artifact (extra columns {sorted(extra)}): "
            f"densifying would sum sketches across groups — filter "
            f"to one group first")
    rows = summary.collect()
    if not rows:
        raise ValueError("empty cms artifact: cms_summary always "
                         "emits an anchor cell, so this input is not "
                         "a cms_summary output")
    key_type = None
    if "key_type" in summary.columns:
        # NULL = a pre-key_type batch file in an append-only dir
        # (schema-on-read null-fills it): unknown, not a distinct
        # type — only CONFLICTING recorded types are incommensurable
        kts = {r["key_type"] for r in rows} - {None}
        if len(kts) > 1:
            raise ValueError(
                f"cms artifact mixes key types {sorted(kts)} — "
                f"sketches hash the key's physical type, so cells "
                f"built over different types are incommensurable")
        key_type = next(iter(kts)) if kts else None
    params = {(r["width"], r["depth"]) for r in rows}
    if len(params) > 1:
        raise ValueError(f"cms artifact mixes parameters {params}; "
                         f"sketches with different width/depth "
                         f"cannot be merged or probed together")
    width, depth = next(iter(params))
    if width * depth > MAX_CELLS:
        raise ValueError(f"width*depth {width * depth} exceeds "
                         f"{MAX_CELLS}")
    cells = np.zeros((depth, width), dtype=np.int64)
    for r in rows:
        cells[r["row_idx"], r["col_idx"]] += r["count"]
    return cells, CmsParams(int(width), int(depth)), key_type


def _refuse_key_type(artifact_kt: str | None, probe_kt: str,
                     what: str) -> None:
    """xxhash64(int 5) != xxhash64('5'): a cross-type probe returns
    collision noise, not an estimate — refuse when the artifact
    recorded its type; pre-key_type artifacts probe unchecked."""
    if artifact_kt is not None and artifact_kt != probe_kt:
        raise ValueError(
            f"{what}: sketch was built over {artifact_kt} keys but "
            f"the probe key is {probe_kt} — cast to a common type "
            f"BEFORE sketching/probing (like the join itself)")


def cms_matrix(summary: DataFrame) -> tuple[np.ndarray, CmsParams]:
    """Materialize the dense d×w counter matrix of a (possibly
    merged, possibly append-only-unioned) artifact. Duplicate cells
    SUM (counters add), so a parquet dir of per-batch summaries reads
    back as the merged sketch. Bounded by MAX_CELLS; raises on
    mixed parameters, on mixed key types, and on a GROUPED artifact
    (densifying one would silently sum unrelated groups' counters —
    filter to one group, or drop the group axis deliberately,
    first)."""
    cells, params, _ = _collect_cells(summary)
    return cells, params


def estimate_counts(df: DataFrame, key_col: str, summary: DataFrame,
                    out_col: str = "freq_estimate",
                    broadcast_handle: list | None = None
                    ) -> DataFrame:
    """df + long ``out_col``: the count-min estimate of each key's
    total weight in the sketched corpus — ≥ the true count always,
    ≤ true + ε·N with probability 1−δ per key; NULL for NULL keys.
    Map-side: codegen hashes + one Arrow-batched pandas UDF over the
    broadcast dense matrix — zero shuffle, zero join. Long-running
    per-micro-batch callers: pass ``broadcast_handle`` and unpersist
    the appended Broadcast after the batch's actions (the dedup/bloom
    probe documents the leak mode). Refuses a probe key whose type
    differs from the artifact's recorded ``key_type``."""
    cells, (width, depth), akt = _collect_cells(summary)
    _refuse_key_type(akt, df.schema[key_col].dataType.simpleString(),
                     "estimate_counts")
    bc = df.sparkSession.sparkContext.broadcast(cells)
    if broadcast_handle is not None:
        broadcast_handle.append(bc)

    @F.pandas_udf(T.LongType())
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        if not len(h1):
            return pd.Series([], dtype="int64")
        mat = bc.value
        a1 = h1.to_numpy()
        a2 = h2.to_numpy()
        est = np.full(len(h1), np.iinfo(np.int64).max,
                      dtype=np.int64)
        for i, pos in enumerate(_positions(a1, a2, width, depth)):
            est = np.minimum(est, mat[i][pos])
        return pd.Series(est)

    hashed = _hash_cols(df, key_col)
    val = F.when(F.col(key_col).isNull(),
                 F.lit(None).cast("long")) \
           .otherwise(probe("__h1", "__h2"))
    return hashed.withColumn(out_col, val).drop("__h1", "__h2")


def estimate_counts_grouped(df: DataFrame, key_col: str,
                            group_col: str, summary: DataFrame,
                            out_col: str = "freq_estimate"
                            ) -> DataFrame:
    """df + long ``out_col``: the count-min estimate of each key's
    weight WITHIN ITS OWN GROUP's sketch, against a grouped artifact
    (``cms_summary(..., group_cols=[group_col])``). One dense matrix
    per group broadcasts as a dict (total size = groups × d×w,
    guarded by MAX_CELLS across ALL groups); probing stays map-side.
    Rows whose group has no sketch — or whose key/group is NULL —
    estimate NULL (per-group sketches exist only for groups with
    non-NULL-key rows, so an unknown group is 'never sketched', not
    'count 0')."""
    rows = summary.collect()
    if not rows:
        raise ValueError("empty grouped cms artifact")
    if "key_type" in summary.columns:
        kts = {r["key_type"] for r in rows} - {None}
        if len(kts) > 1:
            raise ValueError(
                f"grouped cms artifact mixes key types {sorted(kts)}")
        if kts:
            _refuse_key_type(
                next(iter(kts)),
                df.schema[key_col].dataType.simpleString(),
                "estimate_counts_grouped")
    params = {(r["width"], r["depth"]) for r in rows}
    if len(params) > 1:
        raise ValueError(f"cms artifact mixes parameters {params}")
    width, depth = map(int, next(iter(params)))
    groups: dict = {}
    for r in rows:
        cells = groups.get(r[group_col])
        if cells is None:
            cells = groups[r[group_col]] = np.zeros(
                (depth, width), dtype=np.int64)
        cells[r["row_idx"], r["col_idx"]] += r["count"]
    if len(groups) * width * depth > MAX_CELLS:
        raise ValueError(
            f"{len(groups)} groups × {width * depth} cells exceeds "
            f"the broadcast guard {MAX_CELLS}; shrink the matrix or "
            f"probe per group")
    bc = df.sparkSession.sparkContext.broadcast(groups)

    # pandas nullable Int64 (masked int, Arrow-native), NOT float64
    # with NaN: a double round-trip silently loses exactness above
    # 2^53, and sketch cells are int64 sums that can legitimately
    # exceed it at corpus scale (round-7 ADVICE #4)
    @F.pandas_udf(T.LongType())
    def probe(g: pd.Series, h1: pd.Series,
              h2: pd.Series) -> pd.Series:
        if not len(g):
            return pd.Series([], dtype="Int64")
        by_g = bc.value
        vals = np.zeros(len(g), dtype=np.int64)
        found = np.zeros(len(g), dtype=bool)
        gv = g.to_numpy(dtype=object)
        a1 = h1.to_numpy()
        a2 = h2.to_numpy()
        for grp in pd.unique(g.dropna()):
            mat = by_g.get(grp)
            if mat is None:
                continue
            m = gv == grp
            mins = np.full(int(m.sum()), np.iinfo(np.int64).max,
                           dtype=np.int64)
            for i, pos in enumerate(
                    _positions(a1[m], a2[m], width, depth)):
                mins = np.minimum(mins, mat[i][pos])
            vals[m] = mins
            found[m] = True
        return pd.Series(
            pd.arrays.IntegerArray(vals, mask=~found))

    hashed = _hash_cols(df, key_col)
    val = F.when(F.col(key_col).isNull()
                 | F.col(group_col).isNull(),
                 F.lit(None).cast("long")) \
           .otherwise(probe(group_col, "__h1", "__h2"))
    return hashed.withColumn(out_col, val).drop("__h1", "__h2")


def frequency_report(df: DataFrame, key_col: str, probe: DataFrame,
                     probe_key: str, epsilon: float = 1e-4,
                     delta: float = 0.01) -> DataFrame:
    """One-shot: sketch ``df[key_col]``, estimate every ``probe``
    key's frequency. At 100 TB this replaces a count-join against a
    full ``groupBy(key).count()`` table: the corpus pass shuffles
    ≤ d·w cells and the probe side never joins."""
    w, d = cms_parameters(epsilon, delta)
    return estimate_counts(probe, probe_key,
                           cms_summary(df, key_col, w, d))


def cms_join_size(a: DataFrame, b: DataFrame) -> dict:
    """Equi-join OUTPUT-SIZE estimate from two count-min artifacts —
    the pre-shuffle query-planning probe: at 100 TB, knowing whether
    ``A ⋈ B`` produces 10⁶ or 10¹² rows BEFORE paying for the
    shuffle decides broadcast-vs-sortmerge, skew salting, or
    refusing the query — and the sketches already exist per ingest
    batch in the artifact store.

    Cormode & Muthukrishnan (J.Alg 2005, §4.2): each depth row's
    inner product Σ_w cmsA[d][w]·cmsB[d][w] equals the true join
    size Σ_k f_A(k)·f_B(k) PLUS non-negative collision cross-terms,
    so ``min`` over rows is a ONE-SIDED (never-under) estimate with
    expected excess ≤ (e/width)·n_a·n_b — the returned
    ``error_bound``. Driver arithmetic over two dense d×w matrices;
    no data is scanned.

    Both artifacts must share (width, depth) AND have sketched keys
    of the same TYPE (the hash family is fixed module-wide, but
    xxhash64 of e.g. int 5 and string "5" differ — exactly like the
    join itself, which also requires comparable key types). The
    type check is enforced from the artifacts' recorded ``key_type``
    when both carry it; an artifact predating the column (or pruned
    of it by the streaming faces) is trusted on the caller's word."""
    A, pa, ka = _collect_cells(a)
    B, pb, kb = _collect_cells(b)
    if ka is not None and kb is not None and ka != kb:
        raise ValueError(
            f"cms_join_size: key-type mismatch — sketch A was built "
            f"over {ka} keys, sketch B over {kb}; their hash spaces "
            f"are unrelated, so the inner product estimates nothing. "
            f"Cast to a common key type before sketching")
    if (pa.width, pa.depth) != (pb.width, pb.depth):
        raise ValueError(
            f"cms_join_size: parameter mismatch "
            f"{(pa.width, pa.depth)} vs {(pb.width, pb.depth)} — "
            f"sketches are only inner-product-compatible at "
            f"identical (width, depth)")
    # float64 accumulation: two billion-count cells would overflow
    # the int64 product long before the true join size does
    per_row = (A.astype(np.float64) * B.astype(np.float64)).sum(axis=1)
    n_a = int(A.sum(axis=1).max())
    n_b = int(B.sum(axis=1).max())
    bound = math.e / pa.width * n_a * n_b
    return {"join_size_estimate": int(per_row.min()),
            "n_rows_a": n_a, "n_rows_b": n_b,
            "error_bound": round(float(bound), 3),
            "width": pa.width, "depth": pa.depth}
