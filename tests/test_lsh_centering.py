"""Mean-centered hyperplane LSH on positive-orthant corpora.

[0,1]-bounded statistic features (media `extract_features`) all sit
near the all-ones direction, so UNCENTERED sign-of-projection
signatures collapse into a few hot sign patterns: the star guard
bounds the pair blowup (O(m) hub pairs instead of O(m²)) but
borderline-pair recall quietly drops vs the exact kernel — exactly
the corpus-scale failure mode round-13's verdict flagged. Centering
(sign((u − μ)·s), applied as a per-plane offset) restores the bucket
spread; precision stays 1.0 because verification is exact cosine on
the ORIGINAL vectors.

These tests plant a positive-orthant corpus with known near-dup
twins and pin the recall floor AND the candidate-volume envelope."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_bowl___2023_spark.dedup.embedding import (
    _normalized,
    cosine_near_dup_pairs,
    cosine_near_dup_pairs_lsh,
    lsh_candidate_pairs,
    mean_unit_vector,
    pin,
)

DIM = 16
N_BASE = 200
THRESHOLD = 0.999
N_TABLES = 4
N_PLANES = 5          # 32 buckets/table: expected width ~12 at n=400
MAX_BUCKET = 50       # star guard well above the centered width


def _positive_orthant_corpus():
    """200 bases in [0.01, 1]^16 around 0.5·ones, each with one
    near-identical twin (cosine ≥ ~0.9999 ≫ threshold); random base
    pairs sit near cosine ~0.96, below the 0.999 threshold."""
    rng = np.random.default_rng(1402)
    base = np.clip(0.5 + 0.12 * rng.standard_normal((N_BASE, DIM)),
                   0.01, 1.0)
    twin = np.clip(base + 0.004 * rng.standard_normal(base.shape),
                   0.01, 1.0)
    vecs = np.concatenate([base, twin])
    return [(i, [float(x) for x in row])
            for i, row in enumerate(vecs)]


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(
        _positive_orthant_corpus(),
        "media_id long, features array<double>")
    return df.cache()


def _pair_set(rows):
    return {(r["vec_a"], r["vec_b"]) for r in rows}


def test_centered_lsh_recall_floor(corpus):
    """LSH-leg recall vs the exact kernel ≥ 0.95 on a positive-
    orthant corpus WITH the star guard armed — the configuration
    where the uncentered leg demonstrably under-recalls."""
    exact = _pair_set(cosine_near_dup_pairs(
        corpus, THRESHOLD, vec_col="features",
        id_col="media_id").collect())
    # every planted twin pair is a near-dup the exact kernel finds
    assert len(exact) >= N_BASE
    assert all((i, i + N_BASE) in exact for i in range(0, N_BASE, 17))

    kw = dict(vec_col="features", id_col="media_id", dim=DIM,
              n_tables=N_TABLES, n_planes=N_PLANES,
              max_bucket=MAX_BUCKET)
    centered = _pair_set(cosine_near_dup_pairs_lsh(
        corpus, THRESHOLD, center=True, **kw).collect())
    uncentered = _pair_set(cosine_near_dup_pairs_lsh(
        corpus, THRESHOLD, center=False, **kw).collect())

    # precision 1.0 both ways: every emitted pair is exact-verified
    assert centered <= exact and uncentered <= exact
    recall_c = len(centered & exact) / len(exact)
    recall_u = len(uncentered & exact) / len(exact)
    # the stated floor — and the degeneracy it fixes: hot buckets hit
    # the star guard, which keeps only O(m) hub pairs per bucket, so
    # the uncentered leg drops most twin pairs
    assert recall_c >= 0.95
    assert recall_u < 0.5
    assert recall_c > recall_u


def test_centered_candidate_volume_bounded(corpus):
    """Without the star guard, uncentered positive-orthant buckets
    approach all-pairs candidate volume; centered buckets stay near
    the design width, so candidate volume per vector is bounded."""
    v = pin(_normalized(corpus, "features", "media_id"))
    n = v.count()
    cand_c = lsh_candidate_pairs(
        v, DIM, N_TABLES, N_PLANES, center=True).count()
    cand_u = lsh_candidate_pairs(
        v, DIM, N_TABLES, N_PLANES, center=False).count()
    all_pairs = n * (n - 1) // 2
    # uncentered degenerates toward all-pairs; centered stays well
    # under half of it and under a per-vector envelope derived from
    # the bucket design width (T tables × expected width)
    assert cand_u > 0.6 * all_pairs
    assert cand_c < 0.4 * cand_u
    assert cand_c / n < 2.0 * N_TABLES * (n / 2 ** N_PLANES)


def test_mean_unit_vector_and_zero_mean_noop(spark):
    """mean_unit_vector returns the per-dim average of the unit
    vectors; for a zero-mean corpus, centering leaves the candidate
    set essentially unchanged (offsets ~0 — the no-op-cost claim)."""
    rng = np.random.default_rng(7)
    sym = rng.standard_normal((120, DIM))
    sym = np.concatenate([sym, -sym])          # exactly zero mean
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(sym)],
        "media_id long, features array<double>")
    v = pin(_normalized(df, "features", "media_id"))
    mu = np.asarray(mean_unit_vector(v, DIM))
    assert np.abs(mu).max() < 1e-12
    c1 = lsh_candidate_pairs(v, DIM, 2, 4, center=True)
    c0 = lsh_candidate_pairs(v, DIM, 2, 4, center=False)
    assert _pair_set(c1.collect()) == _pair_set(c0.collect())
