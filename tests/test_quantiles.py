"""Mergeable t-digest quantile summaries (operators/quantiles.py).

Contracts under test:
* rank-error accuracy vs the exact distribution (mid quantiles and
  tails) at the default compression;
* merged per-batch artifacts estimate within the same rank-error
  band as the single-pass build;
* p=0 / p=1 are EXACT min/max and ``count`` is the exact non-null
  count;
* monotone quantiles, bounded centroid count, layout invariance
  within the error band;
* parquet round trip of the artifact + merge with a fresh batch;
* grouped digests (incl. NULL group) match per-group exact data;
* NULL and NaN values excluded, all-NULL group well-formed.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.quantiles import (
    merge_quantile_summaries,
    quantile_estimate,
    quantile_report,
    quantile_summary,
)

PROBS = [0.0, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def _lognormal_df(spark, n=20_000, seed=7):
    rng = np.random.default_rng(seed)
    vals = rng.lognormal(mean=1.0, sigma=1.2, size=n)
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double")
    return df, np.sort(vals)


def _rank_error(sorted_vals: np.ndarray, estimate: float,
                p: float) -> float:
    rank = np.searchsorted(sorted_vals, estimate) / len(sorted_vals)
    return abs(rank - p)


def _estimates(summary, probs=PROBS):
    rows = quantile_estimate(summary, probs).collect()
    return {round(r["probability"], 6): r["quantile"] for r in rows}


def test_accuracy_and_exact_endpoints(spark):
    df, svals = _lognormal_df(spark)
    summary = quantile_summary(df, "v")
    est = _estimates(summary)
    assert est[0.0] == pytest.approx(svals[0], abs=0.0)
    assert est[1.0] == pytest.approx(svals[-1], abs=0.0)
    for p in (0.1, 0.25, 0.5, 0.75, 0.9):
        assert _rank_error(svals, est[p], p) < 0.015, p
    # k1 scale function: tails tighter than the middle
    for p in (0.01, 0.99):
        assert _rank_error(svals, est[p], p) < 0.005, p
    # monotone across probabilities
    qs = [est[p] for p in sorted(est)]
    assert qs == sorted(qs)
    # exact count
    row = summary.collect()[0]
    assert row["count"] == 20_000


def test_centroid_count_bounded(spark):
    df, _ = _lognormal_df(spark, n=50_000)
    for compression in (50, 200):
        row = quantile_summary(df, "v",
                               compression=compression).collect()[0]
        assert len(row["means"]) <= compression + 1
        assert len(row["means"]) == len(row["weights"])
        assert sum(row["weights"]) == pytest.approx(50_000)
        assert row["means"] == sorted(row["means"])


def test_merge_matches_single_pass_band(spark):
    df, svals = _lognormal_df(spark)
    batches = [df.filter(F.pmod(F.col("id"), F.lit(3)) == i)
               for i in range(3)]
    merged = merge_quantile_summaries(
        *[quantile_summary(b, "v") for b in batches])
    est = _estimates(merged)
    assert est[0.0] == svals[0]
    assert est[1.0] == svals[-1]
    for p in (0.1, 0.5, 0.9):
        assert _rank_error(svals, est[p], p) < 0.015, p
    assert merged.collect()[0]["count"] == 20_000


def test_layout_invariance_band(spark):
    df, svals = _lognormal_df(spark, n=10_000)
    for layout in (df.coalesce(1), df.repartition(13)):
        est = _estimates(quantile_summary(layout, "v"))
        for p in (0.25, 0.5, 0.75):
            assert _rank_error(svals, est[p], p) < 0.015, p


def test_artifact_parquet_round_trip_and_growth(spark, tmp_path):
    df, _ = _lognormal_df(spark, n=5_000)
    old = df.filter(F.col("id") < 4_000)
    fresh = df.filter(F.col("id") >= 4_000)
    path = str(tmp_path / "qdigest")
    quantile_summary(old, "v").write.parquet(path)
    reloaded = spark.read.parquet(path)
    grown = merge_quantile_summaries(reloaded,
                                     quantile_summary(fresh, "v"))
    row = grown.collect()[0]
    assert row["count"] == 5_000
    whole = quantile_summary(df, "v").collect()[0]
    assert row["min"] == whole["min"]
    assert row["max"] == whole["max"]
    est_grown = _estimates(grown)
    est_whole = _estimates(quantile_summary(df, "v"))
    spread = whole["max"] - whole["min"]
    for p in (0.25, 0.5, 0.75):
        assert abs(est_grown[p] - est_whole[p]) < 0.05 * spread


def test_grouped_incl_null_group(spark):
    rng = np.random.default_rng(3)
    rows = []
    data = {}
    for g, (mu, n) in {"a": (0.0, 4000), "b": (2.0, 4000),
                       None: (4.0, 1000)}.items():
        vals = rng.normal(mu, 1.0, size=n)
        data[g] = np.sort(vals)
        rows += [(g, float(v)) for v in vals]
    df = spark.createDataFrame(rows, "g string, v double") \
        .repartition(8)
    summary = quantile_summary(df, "v", group_cols=["g"])
    assert summary.count() == 3
    est = quantile_estimate(summary, [0.5]).collect()
    for r in est:
        svals = data[r["g"]]
        assert _rank_error(svals, r["quantile"], 0.5) < 0.02, r["g"]
    counts = {r["g"]: r["count"] for r in summary.collect()}
    assert counts == {"a": 4000, "b": 4000, None: 1000}


def test_null_and_nan_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0),
         (4, None), (5, float("nan"))],
        "id long, v double")
    row = quantile_summary(df, "v").collect()[0]
    assert row["count"] == 3
    assert row["min"] == 1.0 and row["max"] == 3.0
    est = _estimates(quantile_summary(df, "v"), [0.5])
    assert est[0.5] == pytest.approx(2.0, abs=0.5)


def test_all_null_group_well_formed(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", None)],
        "g string, v double")
    summary = quantile_summary(df, "v", group_cols=["g"])
    rows = {r["g"]: r for r in summary.collect()}
    assert rows["b"]["count"] == 0
    assert rows["b"]["min"] is None
    est = quantile_estimate(summary, [0.5]).collect()
    got = {r["g"]: r["quantile"] for r in est}
    assert got["b"] is None
    assert got["a"] == pytest.approx(1.5, abs=0.51)


def test_report_one_shot_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = quantile_report(docs, "n_chars", [0.0, 0.5, 1.0],
                          group_cols=["source"])
    exact = docs.groupBy("source").agg(
        F.min("n_chars").alias("lo"),
        F.expr("percentile(n_chars, 0.5)").alias("med"),
        F.max("n_chars").alias("hi"))
    got = {(r["source"], r["probability"]): r["quantile"]
           for r in rep.collect()}
    for r in exact.collect():
        s = r["source"]
        assert got[(s, 0.0)] == r["lo"]
        assert got[(s, 1.0)] == r["hi"]
        span = max(r["hi"] - r["lo"], 1.0)
        assert abs(got[(s, 0.5)] - r["med"]) < 0.05 * span


def test_validation_errors(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="compression"):
        quantile_summary(df, "v", compression=5)
    summary = quantile_summary(df, "v")
    with pytest.raises(ValueError, match="non-empty"):
        quantile_estimate(summary, [])
    with pytest.raises(ValueError, match="outside"):
        quantile_estimate(summary, [1.5])
    with pytest.raises(ValueError, match="at least"):
        merge_quantile_summaries()


def test_build_plan_single_digest_shuffle(spark):
    """quantile_summary's only Exchange carries per-partition digest
    rows to the per-group merge — raw values never shuffle."""
    import re
    df, _ = _lognormal_df(spark, n=2_000)
    plan = quantile_summary(df, "v") \
        ._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) <= 1


def test_psi_from_digests_parity_with_raw_drift(spark):
    """Artifact-based PSI tracks the raw-data drift monitor: near
    zero on an identically distributed pair, parity within a small
    absolute band on a planted one-sigma shift, and above the 0.25
    alert threshold on a two-sigma shift — same edges convention,
    same smoothing."""
    from big_data_bowl___2023_spark.operators.drift import psi_report
    from big_data_bowl___2023_spark.operators.quantiles import (
        psi_from_digests,
    )

    rng = np.random.default_rng(17)
    ref_vals = rng.normal(0.0, 1.0, size=12_000)
    same = rng.normal(0.0, 1.0, size=12_000)
    shift1 = rng.normal(1.0, 1.0, size=12_000)
    shift2 = rng.normal(2.0, 1.0, size=12_000)

    def df_of(vals):
        return spark.createDataFrame(
            [(float(v),) for v in vals], "v double")

    ref = df_of(ref_vals)
    dig_ref = quantile_summary(ref, "v")
    for cur_vals, lo, hi in ((same, 0.0, 0.02),
                             (shift1, 0.25, None),
                             (shift2, 0.25, None)):
        cur = df_of(cur_vals)
        raw = psi_report(ref, cur, ["v"]).collect()[0]["psi"]
        art = psi_from_digests(dig_ref,
                               quantile_summary(cur, "v")) \
            .collect()[0]
        assert art["n_ref"] == 12_000 and art["n_cur"] == 12_000
        assert lo <= art["psi"], (raw, art["psi"])
        if hi is not None:
            assert art["psi"] <= hi
        assert abs(art["psi"] - raw) < 0.08, (raw, art["psi"])


def test_psi_from_digests_grouped_and_missing_side(spark):
    from big_data_bowl___2023_spark.operators.quantiles import (
        psi_from_digests,
    )

    rng = np.random.default_rng(4)
    rows_ref = [("a", float(v)) for v in rng.normal(0, 1, 3000)] \
        + [("gone", float(v)) for v in rng.normal(0, 1, 500)]
    rows_cur = [("a", float(v)) for v in rng.normal(3, 1, 3000)] \
        + [("new", float(v)) for v in rng.normal(0, 1, 500)]
    ref = spark.createDataFrame(rows_ref, "g string, v double")
    cur = spark.createDataFrame(rows_cur, "g string, v double")
    rep = {r["g"]: r for r in psi_from_digests(
        quantile_summary(ref, "v", ["g"]),
        quantile_summary(cur, "v", ["g"]),
        group_cols=["g"]).collect()}
    assert rep["a"]["psi"] > 0.25          # three-sigma shift: alert
    assert rep["gone"]["psi"] is None and rep["gone"]["n_cur"] == 0
    assert rep["new"]["psi"] is None and rep["new"]["n_ref"] == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_buckets"):
        psi_from_digests(quantile_summary(ref, "v"),
                         quantile_summary(cur, "v"), n_buckets=1)
