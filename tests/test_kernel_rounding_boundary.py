"""Characterize the documented SQL-vs-Arrow 6-dp rounding divergence
(similarity/ann.py ``_score_pairs`` docstring; round-8 verdict #3
asked for the boundary to be CONSTRUCTED, not anecdotal).

Spark's ``round`` converts the exact binary double to BigDecimal and
rounds HALF_UP; ``np.round`` scales-and-rints HALF_EVEN. The two can
only disagree when the cosine's binary double lands EXACTLY on a
6-dp .5 boundary — i.e. the value is k/2^m with a decimal expansion
terminating in ...5 at the 7th digit. 1/128 = 0.0078125 is such a
value, and it is reachable: dot((1,0), (1/128, q)) = 1/128 exactly
for any finite q, and q = sqrt(1 - p^2) makes the vector exactly
unit-norm in float64 (asserted below), so the norms divide out
exactly in the guarded ann kernels too.

These tests PIN the divergence — registry defaults stay "sql"
precisely because of it — so a future numpy/Spark rounding change
surfaces as a test failure instead of a silent hash drift."""

from __future__ import annotations

import math

import numpy as np

from big_data_bowl___2023_spark.dedup.embedding import _verify_exact
from big_data_bowl___2023_spark.similarity.ann import brute_force_topk

P = 0.0078125                      # 1/128 — exact binary double
Q = math.sqrt(1.0 - P * P)


def test_boundary_preconditions():
    # the construction is self-validating: P has its decimal .5 at
    # the 7th digit, and (P, Q) is EXACTLY unit-norm in float64 (both
    # the numpy norm and the sequential fold (0 + P*P) + Q*Q)
    assert P == 1.0 / 128.0
    assert (0.0 + P * P) + Q * Q == 1.0
    assert np.linalg.norm(np.array([P, Q])) == 1.0
    assert float(np.round(P, 6)) == 0.007812        # half-even


def _verify_one(spark, kernel):
    v = spark.createDataFrame([(1, [1.0, 0.0]), (2, [P, Q])],
                              "id long, u array<double>")
    cand = spark.createDataFrame([(1, 2)], "vec_a long, vec_b long")
    rows = _verify_exact(v, cand, 0.001, kernel=kernel).collect()
    assert len(rows) == 1
    return rows[0].cosine


def test_verify_kernels_diverge_at_exact_boundary(spark):
    assert _verify_one(spark, "sql") == 0.007813     # BigDecimal half-up
    assert _verify_one(spark, "arrow") == 0.007812   # np.round half-even


def _topk_one(spark, kernel):
    corpus = spark.createDataFrame([(2, [P, Q])],
                                   "vec_id long, embedding array<double>")
    queries = spark.createDataFrame([(1, [1.0, 0.0])],
                                    "vec_id long, embedding array<double>")
    rows = brute_force_topk(corpus, queries, 1,
                            score_kernel=kernel).collect()
    assert len(rows) == 1
    return rows[0].cosine


def test_score_kernels_diverge_at_exact_boundary(spark):
    """The ann kernels divide by the norms before rounding; the
    exactly-unit neighbor keeps the quotient at exactly 1/128, so the
    same divergence shows through the guarded cosine (the [-1, 1]
    clamp is irrelevant here — the boundary value is interior)."""
    assert _topk_one(spark, "sql") == 0.007813
    assert _topk_one(spark, "arrow") == 0.007812
