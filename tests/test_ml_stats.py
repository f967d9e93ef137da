"""M10/M11 tests: special-function p-values pinned against closed
forms, test semantics on hand-built fixtures, RFE subset search."""

from __future__ import annotations

from math import exp, sqrt

import pytest

from big_data_bowl___2023_spark.ml import stats as S


# ---------------------------------------------- special functions
# Student-t with df=1 (Cauchy) and df=2, and chi-square with df=2 and
# df=4, have exact closed forms — independent checks of the continued
# fraction / series implementations.

@pytest.mark.parametrize("t", [0.0, 0.5, 1.0, 2.7, 10.0])
def test_t_sf_matches_cauchy_closed_form(t):
    assert S.t_sf_two_sided(t, 1) == pytest.approx(
        S.cauchy_sf_two_sided(t), abs=1e-12)


@pytest.mark.parametrize("t", [0.0, 0.8, 2.0, 5.0])
def test_t_sf_matches_df2_closed_form(t):
    closed = 1.0 - t / sqrt(t * t + 2.0)
    assert S.t_sf_two_sided(t, 2) == pytest.approx(closed, abs=1e-12)


@pytest.mark.parametrize("x", [0.1, 1.0, 3.0, 12.0])
def test_chi2_sf_matches_df2_closed_form(x):
    assert S.chi2_sf(x, 2) == pytest.approx(exp(-x / 2.0), abs=1e-12)


@pytest.mark.parametrize("x", [0.5, 2.0, 7.5])
def test_chi2_sf_matches_df4_closed_form(x):
    closed = exp(-x / 2.0) * (1.0 + x / 2.0)
    assert S.chi2_sf(x, 4) == pytest.approx(closed, abs=1e-12)


# ---------------------------------------------------- test semantics

def _fixture(spark):
    # Two clearly separated groups plus one overlapping; ties included.
    rows = ([("a", float(v)) for v in [1, 2, 2, 3, 4]]
            + [("b", float(v)) for v in [8, 9, 9, 10, 11]]
            + [("c", float(v)) for v in [2, 3, 4, 9, 10]])
    return spark.createDataFrame(rows, ["g", "v"])


def test_pairwise_t_pooled_by_hand(spark):
    """Pooled t for groups a (mean 2.4) vs b (mean 9.4): check the
    statistic against a direct hand computation of the pooled SD."""
    df = _fixture(spark)
    rows = {(r["group_a"], r["group_b"]): r
            for r in S.pairwise_t_tests(df, "g", "v")}
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    moments = {r["g"]: r for r in
               S.group_moments(df, "g", "v").collect()}
    pooled = sum((moments[g]["n"] - 1) * moments[g]["var"]
                 for g in "abc") / (15 - 3)
    t_ab = (moments["a"]["mean"] - moments["b"]["mean"]) / sqrt(
        pooled * (1 / 5 + 1 / 5))
    r = rows[("a", "b")]
    assert r["statistic"] == pytest.approx(t_ab, abs=1e-12)
    assert r["df"] == 12.0
    # Bonferroni: 3 comparisons, capped at 1.
    assert r["p_adjusted"] == pytest.approx(
        min(1.0, r["p_value"] * 3), abs=1e-12)
    assert 0.0 <= r["p_value"] <= r["p_adjusted"] <= 1.0
    # a vs b are far apart -> significant (pooled SD is inflated by
    # the overlapping group c, so ~4e-4 rather than tiny).
    assert r["p_value"] < 0.01


def test_kruskal_wallis_by_hand(spark):
    """H computed from midranks by hand on the 15-row fixture must
    match the distributed computation exactly."""
    df = _fixture(spark)
    out = S.kruskal_wallis(df, "g", "v")
    # Hand midranks over sorted values
    # [1,2,2,2,3,3,4,4,8,9,9,9,10,10,11]:
    # 1->1; 2->3; 3->5.5; 4->7.5; 8->9; 9->11; 10->13.5; 11->15.
    r_a = 1 + 3 + 3 + 5.5 + 7.5            # a: 1,2,2,3,4
    r_b = 9 + 11 + 11 + 13.5 + 15          # b: 8,9,9,10,11
    r_c = 3 + 5.5 + 7.5 + 11 + 13.5        # c: 2,3,4,9,10
    n = 15
    h = 12.0 / (n * (n + 1)) * (r_a**2 + r_b**2 + r_c**2) / 5 - 3 * (n + 1)
    ties = sum(t**3 - t for t in [1, 3, 2, 2, 1, 3, 2, 1])
    h /= 1.0 - ties / (n**3 - n)
    assert out["statistic"] == pytest.approx(h, abs=1e-9)
    assert out["df"] == 2.0
    assert out["p_value"] == pytest.approx(S.chi2_sf(h, 2), abs=1e-12)


def test_significance_tests_dataframe_shape(spark):
    df = _fixture(spark)
    out = S.significance_tests(spark, df, "g", "v").collect()
    tests = [r["test"] for r in out]
    assert tests.count("pairwise_t_pooled") == 3
    assert tests.count("kruskal_wallis") == 1


# ------------------------------------------------------------- RFE

def test_rfe_selects_informative_feature(spark):
    """Target is a pure function of x1; RFE must rank {x1} above {x2}
    at size 1 and flag a winner deterministically."""
    import random

    from big_data_bowl___2023_spark.ml.models import rfe_selection

    rng = random.Random(7)
    rows = [(float(i), rng.random() * 10, 3.0 * i + 1.0)
            for i in range(60)]
    df = spark.createDataFrame(rows, ["x1", "x2", "y"])
    out = rfe_selection(df, ["x1", "x2"], "y")
    by_size = {r["n_features"]: r for r in out}
    assert by_size[1]["feature_set"] == "x1"
    assert by_size[1]["cv_rmse"] < 1e-6
    assert sum(r["selected"] for r in out) == 1
