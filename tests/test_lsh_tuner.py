"""MinHash-LSH parameter tuner (E118,
dedup/minhash.py::tune_lsh_params / lsh_candidate_probability):
driver-side S-curve optimization (MMDS ch. 3) whose output plugs
straight into minhash_band_pairs."""

from __future__ import annotations

import pytest

from big_data_bowl___2023_spark.dedup.minhash import (
    lsh_candidate_probability,
    minhash_band_pairs,
    tune_lsh_params,
)


def test_curve_hand_values():
    # b=4, r=2 at s=0.5: 1 - (1 - 0.25)^4
    assert lsh_candidate_probability(0.5, 4, 2) == pytest.approx(
        1 - 0.75 ** 4)
    assert lsh_candidate_probability(0.0, 8, 4) == 0.0
    assert lsh_candidate_probability(1.0, 8, 4) == 1.0


def test_tuner_tracks_threshold_and_budget():
    prev_rows = 0
    for t in (0.3, 0.5, 0.8):
        p = tune_lsh_params(t, max_perms=128)
        assert p["bands"] * p["rows_per_band"] == p["num_perms"] <= 128
        # the curve midpoint lands near the target
        assert abs(p["s50"] - t) < 0.06
        # steeper curves (more rows) for higher thresholds
        assert p["rows_per_band"] >= prev_rows
        prev_rows = p["rows_per_band"]
        # deterministic
        assert tune_lsh_params(t, max_perms=128) == p


def test_fn_weight_buys_recall():
    """Penalizing false negatives harder shifts the curve left:
    recall at the threshold rises (at the cost of more verify
    work)."""
    base = tune_lsh_params(0.7, max_perms=128)
    recall = tune_lsh_params(0.7, max_perms=128, fn_weight=5.0)
    assert recall["recall_at_threshold"] > base["recall_at_threshold"]
    assert recall["fp_mass"] >= base["fp_mass"]


def test_tuner_validation():
    with pytest.raises(ValueError, match="threshold"):
        tune_lsh_params(0.0)
    with pytest.raises(ValueError, match="threshold"):
        tune_lsh_params(1.0)
    with pytest.raises(ValueError, match="max_perms"):
        tune_lsh_params(0.5, max_perms=1)


def test_tuned_params_plug_into_band_pairs(spark):
    """Wiring: num_perms = bands*rows divides exactly, and a tuned
    (0.3, small-budget) configuration deterministically surfaces a
    planted high-jaccard pair (hash-seeded minhash is deterministic
    for fixed text, and the planted pair's candidate probability at
    these params is ≈ 1)."""
    p = tune_lsh_params(0.3, max_perms=32)
    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lamda mu nu xi omicron pi rho sigma tau upsilon")
    docs = spark.createDataFrame(
        [(1, base), (2, base + " phi"),
         (3, "entirely different words about completely other "
             "topics nothing shared with the planted pair at all "
             "whatsoever in any shingle anywhere")],
        "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b)
             for r in minhash_band_pairs(
                 docs, 0.3, num_perms=p["num_perms"],
                 bands=p["bands"]).collect()}
    assert (1, 2) in pairs
    assert all(a != 3 and b != 3 for a, b in pairs)


def test_tuner_validates_steps_and_weights():
    with pytest.raises(ValueError, match="steps"):
        tune_lsh_params(0.5, steps=0)
    with pytest.raises(ValueError, match="weights"):
        tune_lsh_params(0.5, fp_weight=-1.0)
    with pytest.raises(ValueError, match="weights"):
        tune_lsh_params(0.5, fp_weight=0.0, fn_weight=0.0)
