"""Deterministic sampling and shard packing for training-data
curation.

Reproducibility is the design constraint: a 100 TB curation run must
be able to re-derive the exact same sample/shard assignment on a
re-run (lineage audits, incremental re-builds), so nothing here uses
``rand()`` or partition-order-dependent state. Randomness comes from
content hashes (xxhash64 of the id), which any engine reproduces.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_BUCKETS = 1_000_000

# portable split granularity: 4 hex chars of md5 = 65536 buckets
PORTABLE_BUCKETS = 65536


def portable_split_cut(fraction: float) -> str:
    """4-hex-char cut below which a row is OUT of the kept fraction:
    keep ⇔ substr(md5(id_str), 1, 4) >= cut. md5 hex is lowercase in
    every engine and hex-string order is numeric order, so the SAME
    predicate is expressible in Spark, DuckDB, or any ANSI SQL —
    unlike xxhash64, which only Spark computes."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    cut = int(round((1.0 - fraction) * PORTABLE_BUCKETS))
    if cut >= PORTABLE_BUCKETS:     # fraction ~ 0: keep nothing
        return "g"                  # 'g' > every hex char
    return format(cut, "04x")


def portable_split_col(id_col: str, fraction: float) -> F.Column:
    """Boolean keep-column for a deterministic, ENGINE-PORTABLE
    ~``fraction`` split keyed on the id's md5. Same contract as
    ``hash_sample`` (stateless scan-side filter, no shuffle, rerun-
    stable) but reproducible outside Spark, which is what makes
    downstream model fits oracle-checkable. Quantized to 1/65536."""
    hx = F.substring(
        F.md5(F.col(id_col).cast("string").cast("binary")), 1, 4)
    return hx >= F.lit(portable_split_cut(fraction))


def portable_train_test_split(df: DataFrame, train_frac: float,
                              id_col: str) -> tuple[DataFrame, DataFrame]:
    """Deterministic 80/20-style split both engines reproduce; the
    two sides partition the input exactly (complementary filters on
    the same hash)."""
    keep = portable_split_col(id_col, train_frac)
    return df.filter(keep), df.filter(~keep)


def hash_sample(df: DataFrame, fraction: float,
                id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Stateless deterministic ~fraction sample: keep rows whose
    id-hash bucket falls under the cut. Pure scan-side filter — no
    shuffle, no sort, pushes down past column pruning — the only
    sampling shape that is free at 100 TB. Sample membership is stable
    across runs and across engines (xxhash64 is pinned in both)."""
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)),
                    F.lit(HASH_BUCKETS))
    return df.filter(bucket < F.lit(int(round(fraction * HASH_BUCKETS))))


def build_mixture(df: DataFrame, weights: dict[str, float],
                  total_tokens: int, source_col: str = "source",
                  token_col: str = "n_tokens",
                  id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Training-mixture construction: sample each source so its token
    share matches ``weights`` within a ``total_tokens`` budget (the
    Pile/DoReMi mixing step).

    One aggregation derives per-source token totals; each source's
    keep-fraction is ``weight·total_tokens / source_tokens`` (clamped
    at 1 — a source too small to fill its share contributes everything
    it has; callers detect the shortfall by comparing realized vs
    target shares). Membership is then ONE deterministic hash-filter
    scan with the per-source cut joined in broadcast — no shuffle of
    corpus rows, rerun-stable, unlisted sources drop out.

    Expected (not exact) token totals: the hash filter samples
    documents, so realized share converges to target as docs/source
    grows — the law-of-large-numbers contract every hash-sampled
    mixture pipeline accepts. Exact ceilings compose downstream via
    ``pack_by_budget_strict``."""
    totals = (df.groupBy(source_col)
              .agg(F.sum(token_col).alias("__src_tokens"))
              .collect())
    cuts = []
    for r in totals:
        w = weights.get(r[source_col])
        if w is None:
            continue
        frac = min(1.0, (w * total_tokens) / max(1, r["__src_tokens"]))
        cuts.append((r[source_col], int(round(frac * HASH_BUCKETS))))
    spark = df.sparkSession
    cut_df = spark.createDataFrame(
        cuts, f"{source_col} string, __cut long")
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)),
                    F.lit(HASH_BUCKETS))
    return (df.join(F.broadcast(cut_df), source_col)
            .filter(bucket < F.col("__cut"))
            .drop("__cut"))


def temperature_weights(token_totals: dict[str, int],
                        temperature: float = 1.0) -> dict[str, float]:
    """Source-mixing weights by sampling temperature (the XLM-R /
    multilingual-LM rebalancing rule): weight_i ∝ share_i^(1/T),
    normalized to sum 1. T=1 reproduces natural shares; T→∞ tends to
    uniform; T<1 sharpens toward the largest sources. Pure driver-side
    arithmetic over the per-source token totals (one small aggregate
    the caller already has, e.g. from ``curation_report``); feed the
    result straight into ``build_mixture``."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    token_totals = {s: (t or 0) for s, t in token_totals.items()}
    total = sum(token_totals.values())
    if total <= 0:
        return {s: 0.0 for s in token_totals}
    powered = {s: (t / total) ** (1.0 / temperature)
               for s, t in token_totals.items()}
    z = sum(powered.values())
    return {s: p / z for s, p in powered.items()}


def build_temperature_mixture(df: DataFrame, total_tokens: int,
                              temperature: float = 1.0,
                              source_col: str = "source",
                              token_col: str = "n_tokens",
                              id_col: str = "doc_id",
                              seed: int = 0) -> DataFrame:
    """``build_mixture`` with weights derived from the corpus's own
    per-source token shares at the given sampling temperature — one
    extra tiny aggregate, then the same single broadcast-joined
    hash-filter scan."""
    totals = {r[source_col]: r["__t"] or 0 for r in
              df.groupBy(source_col)
              .agg(F.sum(token_col).alias("__t")).collect()}
    w = temperature_weights(totals, temperature)
    return build_mixture(df, w, total_tokens, source_col, token_col,
                         id_col, seed)


def stratified_sample_exact(df: DataFrame, strata: Sequence[str],
                            fraction: float,
                            id_col: str = "doc_id") -> DataFrame:
    """Exactly ceil(fraction * n) rows per stratum, chosen by id-hash
    order (deterministic, unbiased for content-independent ids). One
    shuffle on the strata key: both the stratum size and the rank come
    from the same window partition, no count-join-back pass.

    The per-stratum sort is the price of exactness — for merely
    approximate per-stratum fractions use ``hash_sample`` which is
    shuffle-free."""
    w = Window.partitionBy(*strata)
    wo = w.orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
    return (df.withColumn("__n", F.count(F.lit(1)).over(w))
              .withColumn("__rn", F.row_number().over(wo))
              .filter(F.col("__rn")
                      <= F.ceil(F.col("__n") * F.lit(fraction)))
              .drop("__n", "__rn"))


def cap_per_group(df: DataFrame, group_cols: Sequence[str],
                  max_rows: int,
                  priority_col: str | None = None,
                  id_col: str = "doc_id") -> DataFrame:
    """At most ``max_rows`` rows per group — the RefinedWeb-style
    per-domain/per-source document quota that stops any one domain
    from dominating a crawl corpus. ``priority_col`` (descending,
    e.g. a learned quality probability) decides WHICH rows survive;
    without it the deterministic id-hash order makes the cap an
    unbiased per-group sample. One shuffle on the group key; the
    per-group sort is window-local (no global order).

    At 100 TB the hot group (the biggest domain) lands on one task —
    bounded by that group's row count, the same contract as
    ``stratified_sample_exact``; groups hot enough to spill should be
    pre-thinned with ``hash_sample``."""
    order = []
    if priority_col is not None:
        order.append(F.col(priority_col).desc())
    order += [F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= max_rows)
              .drop("__rn"))


def quantile_buckets(df: DataFrame, col: str, n_buckets: int = 10,
                     out_col: str = "bucket",
                     relative_error: float = 1e-4) -> DataFrame:
    """Assign each row its quantile bucket of ``col`` (0-based; bucket
    b covers the (b/n, (b+1)/n] score range) — the building block for
    curriculum mixtures ("sample hardest decile more") and
    score-stratified reporting, composing with ``build_mixture`` /
    ``cap_per_group`` on the bucket column.

    One GK-sketch pass (``approxQuantile``, driver gets n_buckets-1
    split points — the standard mergeable-sketch shape at any scale),
    then assignment is a codegen comparison chain: no shuffle, no
    second scan of wide rows. Duplicate split points (heavy ties)
    collapse; the bucket ids stay 0..n_buckets-1 but some may be
    empty."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    splits = df.approxQuantile(col, qs, relative_error)
    expr = F.lit(0)
    for b, s in enumerate(splits):
        expr = F.when(F.col(col) > s, b + 1).otherwise(expr)
    expr = F.when(F.col(col).isNull(), F.lit(None)).otherwise(expr)
    return df.withColumn(out_col, expr.cast("int"))


def pack_by_budget(df: DataFrame, budget: int,
                   size_col: str, partition_cols: Sequence[str],
                   id_col: str = "doc_id",
                   shard_col: str = "shard") -> DataFrame:
    """Boundary packing of rows into token-budget training shards:
    within each partition, rows in id-hash order are assigned
    shard = floor(exclusive-cumsum / budget) — one window pass, no
    iteration, whole-stage codegen end to end.

    Contract: shard boundaries sit at multiples of ``budget`` in the
    running total, so a shard's sum may exceed the budget by at most
    (its last row's size − 1). Use ``pack_by_budget_strict`` when the
    budget is a hard ceiling (e.g. a model context window).

    Shards are per partition key (date, language, source …): a global
    sequential pack would serialize into a single task, so the caller
    chooses the parallelism unit.
    """
    w = (Window.partitionBy(*partition_cols)
         .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.col(size_col)).over(w)
    return df.withColumn(
        shard_col,
        F.floor((cum - F.col(size_col)) / F.lit(budget)).cast("bigint"))


def pack_by_budget_strict(df: DataFrame, budget: int,
                          size_col: str, partition_cols: Sequence[str],
                          id_col: str = "doc_id",
                          shard_col: str = "shard") -> DataFrame:
    """Strict greedy packing: a shard's total NEVER exceeds ``budget``
    unless a single row alone does (that row gets a shard of its own).
    This is the hard-ceiling variant for context-window shards.

    The reset-on-overflow recurrence is inherently sequential, which
    no window expression can state, so each partition group runs one
    Arrow ``applyInPandas`` pass in id-hash order. Sequential-within-
    group is exactly the parallelism the semantics allow; groups pack
    concurrently.
    """
    from pyspark.sql.types import LongType, StructField, StructType
    import pandas as pd

    out_schema = StructType(df.schema.fields
                            + [StructField(shard_col, LongType(), False)])
    keyed = df.withColumn("__h", F.xxhash64(F.col(id_col)))
    part_keys = list(partition_cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__h", id_col], kind="mergesort")
        shards, shard, acc = [], 0, 0
        first = True
        for size in pdf[size_col]:
            size = int(size)
            if not first and acc + size > budget:
                shard += 1
                acc = 0
            shards.append(shard)
            acc += size
            first = False
        pdf = pdf.copy()
        pdf[shard_col] = shards
        return pdf.drop(columns=["__h"])

    return keyed.groupBy(*part_keys).applyInPandas(pack, out_schema)


def epoch_shuffle(df: DataFrame, seed: int,
                  id_col: str = "doc_id",
                  n_shards: int | None = None) -> DataFrame:
    """Reproducible global training-order shuffle: rows ordered by
    ``xxhash64(seed, id)`` — a deterministic permutation that changes
    completely with ``seed`` (one per epoch), is independent of input
    partitioning/file layout, and needs no materialized random column
    (rand() would make every recompute/retry reorder the epoch).

    With ``n_shards`` the order is realized as ``repartitionByRange``
    on the hash + within-shard sort — each output shard is a sorted
    contiguous slice of the global order, so a loader streaming shards
    in index order replays the exact permutation while Spark writes
    them in parallel. Without it, a plain global orderBy (range
    exchange under the hood) — same order, planner-chosen shards."""
    h = F.xxhash64(F.lit(seed), F.col(id_col))
    if n_shards is None:
        return df.orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("__eo", h)
            .repartitionByRange(n_shards, F.col("__eo"), F.col(id_col))
            .sortWithinPartitions("__eo", id_col)
            .drop("__eo"))


def hash_sample_exact(df: DataFrame, k: int, seed: int = 0,
                      id_col: str = "doc_id") -> DataFrame:
    """EXACTLY ``min(k, n)`` rows, deterministically: the k smallest
    ``xxhash64(seed, id)`` values — an unbiased fixed-size sample
    (eval-set carving, fixed-budget audits) where ``hash_sample``'s
    Bernoulli fraction gives only an expected size. Spark executes
    orderBy+limit as TakeOrdered: per-partition top-k map-side, one
    tiny merge — no global sort materialization. Same seed → same
    rows on any layout; different seeds → independent samples.
    Membership is NOT nested across k (use ``hash_sample`` for
    grow-only subsets)."""
    h = F.xxhash64(F.lit(seed), F.col(id_col))
    return df.orderBy(h.asc(), F.col(id_col).asc()).limit(k)
