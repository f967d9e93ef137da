"""The Arrow/GEMM nearest-centroid assignment kernel (round 8): the
corpus-scale alternative to the interpreted SQL argmin fold. Fast
tier — these pin kernel agreement and plan shape, not recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.dedup.semantic import (
    assign_with_centroids,
    kmeans_assign,
    semantic_dup_pairs,
)
from big_data_bowl___2023_spark.dedup.embedding import _normalized
from big_data_bowl___2023_spark.sources.io import load_table


def _clusters(df):
    return {r["id"]: r["cluster"] for r in df.collect()}


def test_arrow_assignment_matches_sql_on_real_embeddings(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    v = _normalized(emb, "embedding", "vec_id")
    cents = [[(1.0 if d == j else 0.0) for d in range(64)]
             for j in range(5)]
    sql = _clusters(assign_with_centroids(v, cents, kernel="sql"))
    arrow = _clusters(assign_with_centroids(v, cents, kernel="arrow"))
    assert sql == arrow and len(sql) > 0
    # and against the >codegen_max_k broadcast-join path
    joined = _clusters(assign_with_centroids(v, cents,
                                             codegen_max_k=2))
    assert joined == arrow


def test_arrow_assignment_geometry_and_ties(spark):
    cents = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    rows = [(1, [0.9, 0.1]), (2, [0.1, 0.9]), (3, [-0.8, -0.1]),
            # EXACTLY equidistant to cents[0] and cents[1]:
            # both kernels break ties to the LOWEST code
            (4, [0.5, 0.5])]
    v = spark.createDataFrame(rows, "id long, u array<double>")
    got = _clusters(assign_with_centroids(v, cents, kernel="arrow"))
    assert got == {1: 0, 2: 1, 3: 2, 4: 0}
    assert got == _clusters(assign_with_centroids(v, cents,
                                                  kernel="sql"))


def test_arrow_assignment_plan_is_map_side(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    v = _normalized(emb, "embedding", "vec_id")
    cents = [[0.0] * 64, [1.0] * 64]
    plan = assign_with_centroids(v, cents, kernel="arrow") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan       # pure map-side scan
    assert "Join" not in plan


def test_semantic_pairs_identical_under_arrow_kernel(spark, sf_dir):
    """The end-to-end contract: the kernel is a physical-plan choice,
    not a semantics choice — same centroids, same clusters, same
    verified pair set on the test corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = {(r.vec_a, r.vec_b, r.cosine) for r in
         semantic_dup_pairs(emb, 0.4, dim=64).collect()}
    b = {(r.vec_a, r.vec_b, r.cosine) for r in
         semantic_dup_pairs(emb, 0.4, dim=64,
                            assign_kernel="arrow").collect()}
    assert a == b and a
    # r16: the bench extra now runs BOTH corpus-scale kernels —
    # pin the exact configuration it ships (assign + verify arrow)
    c = {(r.vec_a, r.vec_b, r.cosine) for r in
         semantic_dup_pairs(emb, 0.4, dim=64,
                            assign_kernel="arrow",
                            verify_kernel="arrow").collect()}
    assert a == c


def test_unknown_kernel_rejected(spark):
    v = spark.createDataFrame([(1, [1.0, 0.0])],
                              "id long, u array<double>")
    with pytest.raises(ValueError, match="unknown assignment kernel"):
        assign_with_centroids(v, [[1.0, 0.0]], kernel="numpy")
