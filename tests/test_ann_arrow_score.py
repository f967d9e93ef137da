"""The Arrow scoring kernel for ANN top-k (round 8): numpy batch
cosine instead of three interpreted expression folds per candidate
pair. Fast tier — pins kernel agreement and plan shape; defaults
stay on the bit-pinned SQL fold for the hash-pinned registry
queries."""

from __future__ import annotations

import pytest

from big_data_bowl___2023_spark.similarity import (
    brute_force_topk,
    ivf_topk,
)
from big_data_bowl___2023_spark.sources.io import load_table


def _rows(df):
    return sorted((r["query_id"], r["neighbor_id"], r["cosine"],
                   r["rank"]) for r in df.collect())


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_arrow_scoring_matches_sql_brute_force(spark, emb):
    queries = emb.limit(8)
    sql = _rows(brute_force_topk(emb, queries, 5))
    arrow = _rows(brute_force_topk(emb, queries, 5,
                                   score_kernel="arrow"))
    assert sql == arrow and len(sql) == 8 * 5


def test_arrow_scoring_matches_sql_ivf(spark, emb):
    queries = emb.limit(8)
    sql = _rows(ivf_topk(emb, queries, 5, dim=64))
    arrow = _rows(ivf_topk(emb, queries, 5, dim=64,
                           score_kernel="arrow"))
    assert sql == arrow and sql


def test_degenerate_vectors_score_zero_in_both_kernels(spark):
    """Zero-norm AND corrupt (NaN/Inf-component) vectors score 0.0
    under BOTH kernels — without the nanvl/isfinite guards the SQL
    fold surfaced corrupt rows as NaN, which Spark sorts GREATEST,
    ranking them FIRST for every query (the round-7 bug class)."""
    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.6, 0.8]),
            (4, [float("nan"), 1.0]), (5, [float("inf"), 0.0])]
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<double>")
    q = emb.filter("vec_id = 1")
    for kernel in ("sql", "arrow"):
        got = {r["neighbor_id"]: (r["cosine"], r["rank"]) for r in
               brute_force_topk(emb, q, 4,
                                score_kernel=kernel).collect()}
        assert got[3][0] == 0.6 and got[3][1] == 1, kernel
        assert got[2][0] == 0.0, kernel   # zero-norm
        assert got[4][0] == 0.0, kernel   # NaN component
        assert got[5][0] == 0.0, kernel   # Inf component


def test_arrow_scoring_stage_is_pythonic_map(spark, emb):
    plan = brute_force_topk(emb, emb.limit(2), 3,
                            score_kernel="arrow") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    with pytest.raises(ValueError, match="unknown score kernel"):
        brute_force_topk(emb, emb.limit(1), 1, score_kernel="np")


def test_hard_negative_miner_guards_corrupt_vectors(spark):
    """mine_hard_negatives shares _guarded_cosine: a corrupt NaN
    embedding in a labeled corpus scores 0.0 and never tops an
    anchor's negatives (unguarded it scored NaN, which Spark sorts
    greatest — rank 1 for every anchor)."""
    from big_data_bowl___2023_spark.similarity.ann import (
        mine_hard_negatives,
    )
    rows = [(1, [1.0, 0.0], "a"), (2, [0.9, 0.1], "b"),
            (3, [float("nan"), 1.0], "b")]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string")
    got = {(r["anchor_id"], r["negative_id"]): (r["cosine"], r["rank"])
           for r in mine_hard_negatives(corpus, 2).collect()}
    # for anchor 1: the genuine close negative (2) ranks first; the
    # corrupt row scores 0.0 and sits below it
    assert got[(1, 2)][1] == 1
    assert got[(1, 3)] == (0.0, 2)
