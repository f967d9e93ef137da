"""The driver-tier Lloyd loop (r17): train_pq(lloyd="driver") runs
the capped-sample k-means on the driver in numpy — one bounded
collect instead of seeds-collect + sample-pin + one Spark job per
round. Parity contract: codebooks agree with the distributed trainer
to float-summation order (the sampled-training tolerance class,
~1e-9), the tier is deterministic and partitioning-invariant, and
the semantic pair sets it feeds are identical across tiers."""

from __future__ import annotations

import pytest

from big_data_bowl___2023_spark.dedup.semantic import (
    _lloyd_tier,
    semantic_dup_pairs,
)
from big_data_bowl___2023_spark.similarity.pq import train_pq
from big_data_bowl___2023_spark.sources.io import load_table


def _close(a: list, b: list, tol: float = 1e-9) -> bool:
    assert len(a) == len(b)
    for cb_a, cb_b in zip(a, b):
        assert len(cb_a) == len(cb_b)
        for ca, cb in zip(cb_a, cb_b):
            for x, y in zip(ca, cb):
                if abs(x - y) >= tol:
                    return False
    return True


def test_driver_lloyd_matches_distributed_to_summation_order(
        spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    dist = train_pq(emb, dim=64, m=1, k=8, n_iters=4,
                    assign_kernel="arrow")
    drv = train_pq(emb, dim=64, m=1, k=8, n_iters=4,
                   assign_kernel="arrow", lloyd="driver")
    assert _close(dist, drv)
    # PQ shape (m subspaces) routes each row to ITS subspace table
    dist_m = train_pq(emb, dim=64, m=4, k=4, n_iters=3,
                      assign_kernel="arrow")
    drv_m = train_pq(emb, dim=64, m=4, k=4, n_iters=3,
                     assign_kernel="arrow", lloyd="driver")
    assert _close(dist_m, drv_m)


def test_driver_lloyd_deterministic_and_layout_invariant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = train_pq(emb, dim=64, m=1, k=8, n_iters=4, lloyd="driver")
    b = train_pq(emb.repartition(7), dim=64, m=1, k=8, n_iters=4,
                 lloyd="driver")
    assert a == b                     # bitwise across layouts


def test_driver_lloyd_requires_sample_cap(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="train_rows"):
        train_pq(emb, dim=64, m=1, k=4, n_iters=1, lloyd="driver",
                 train_rows=None)
    with pytest.raises(ValueError, match="unknown lloyd tier"):
        train_pq(emb, dim=64, m=1, k=4, n_iters=1, lloyd="numpy")


def test_driver_lloyd_small_and_empty_inputs(spark):
    rows = [(i, [float(i), 1.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # fewer rows than k: seeds (and codebooks) shrink, like the
    # distributed path
    cents = train_pq(df, dim=2, m=1, k=8, n_iters=2, lloyd="driver")
    assert len(cents) == 1 and len(cents[0]) == 3
    empty = df.filter("vec_id < 0")
    assert train_pq(empty, dim=2, m=1, k=4, n_iters=2,
                    lloyd="driver") == [[]]


def test_semantic_pairs_identical_across_lloyd_tiers(spark, sf_dir):
    """The end-to-end pin: the arrow-kernel entry point (which now
    trains on the driver tier) emits the same verified pair set as
    the sql-kernel entry point (distributed training) — the tier is
    a physical choice, not a semantics choice, on real embeddings."""
    emb = load_table(spark, sf_dir, "embeddings")
    sql_pairs = {(r.vec_a, r.vec_b, r.cosine) for r in
                 semantic_dup_pairs(emb, 0.4, dim=64).collect()}
    arrow_pairs = {(r.vec_a, r.vec_b, r.cosine) for r in
                   semantic_dup_pairs(emb, 0.4, dim=64,
                                      assign_kernel="arrow",
                                      verify_kernel="arrow").collect()}
    assert sql_pairs == arrow_pairs and sql_pairs


def test_lloyd_tier_rule():
    assert _lloyd_tier("arrow") == "driver"
    assert _lloyd_tier("sql") == "spark"
