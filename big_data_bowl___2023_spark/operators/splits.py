"""Leakage-safe dataset splitting.

A row-level random split leaks: two near-duplicate documents (or two
chunks of one document) land on opposite sides and the eval set
overlaps training. The safe unit is the DUPLICATE CLUSTER — every
document in a near-dup cluster, and every chunk of every document,
must fall on the same side.

Spark shape: label docs with their cluster id (connected components
over the near-dup pairs), hash the CLUSTER id to pick the side (the
same deterministic xxhash64 filter the sampling module uses — rerun-
stable, no RNG), then propagate the side to docs/chunks by join. The
expensive part (pair generation) is whatever dedup stage already ran;
the split itself adds one broadcast-able join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.clusters import resolve_clusters

HASH_BUCKETS = 1_000_000


def leakage_safe_split(docs: DataFrame, pairs: DataFrame,
                       test_frac: float, id_col: str = "doc_id",
                       seed: int = 0) -> DataFrame:
    """Input plus ``cluster_id`` and ``split`` ('train' | 'test').

    The side is a pure function of (cluster_id, seed): adding new
    documents later never flips existing assignments unless they join
    an existing cluster — the property that keeps a frozen eval set
    frozen across corpus refreshes."""
    labeled = resolve_clusters(docs, pairs, id_col=id_col)
    bucket = F.pmod(F.xxhash64(F.col("cluster_id"), F.lit(seed)),
                    F.lit(HASH_BUCKETS))
    side = F.when(
        bucket < F.lit(int(round(test_frac * HASH_BUCKETS))),
        F.lit("test")).otherwise(F.lit("train"))
    return labeled.withColumn("split", side)


def leakage_safe_folds(docs: DataFrame, pairs: DataFrame, k: int,
                       id_col: str = "doc_id",
                       seed: int = 0) -> DataFrame:
    """K-fold variant for cross-validation: input plus ``cluster_id``
    and ``fold`` ∈ [0, k). Same cluster-hash determinism — every
    member of a duplicate cluster shares a fold, so no CV split ever
    trains on an eval document's near-duplicate."""
    labeled = resolve_clusters(docs, pairs, id_col=id_col)
    fold = F.pmod(F.xxhash64(F.col("cluster_id"), F.lit(seed)),
                  F.lit(k)).cast("int")
    return labeled.withColumn("fold", fold)


def assert_no_leakage(split_docs: DataFrame, pairs: DataFrame,
                      id_col: str = "doc_id") -> int:
    """Number of near-dup pairs crossing the split (MUST be 0 for a
    valid eval set) — the check a curation run records next to the
    split itself."""
    sides = split_docs.select(F.col(id_col), F.col("split"))
    a = sides.select(F.col(id_col).alias("doc_a"),
                     F.col("split").alias("side_a"))
    b = sides.select(F.col(id_col).alias("doc_b"),
                     F.col("split").alias("side_b"))
    return (pairs.join(a, "doc_a").join(b, "doc_b")
            .filter(F.col("side_a") != F.col("side_b"))
            .count())
