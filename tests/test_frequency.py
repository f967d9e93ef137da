"""Count-min sketch frequency artifacts (operators/frequency.py).

Contracts under test:
* one-sided soundness — estimate ≥ true count for EVERY key (exact
  guarantee, not probabilistic);
* error envelope — overestimate ≤ ε·N on a zipf-ish workload;
* merged per-batch artifacts equal the single-pass sketch CELL-WISE
  (sums are associative), and an append-only parquet dir of
  summaries reads back as the merged sketch;
* layout invariance (counter sums are deterministic);
* weighted build == exploded unweighted build;
* parquet round trip, empty-input self-description, mixed-parameter
  refusal, NULL-key exclusion/probe-NULL, map-side probe plan.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.frequency import (
    CmsParams,
    cms_matrix,
    cms_parameters,
    cms_summary,
    estimate_counts,
    frequency_report,
    merge_cms,
)


def _zipf_df(spark, n=20_000, n_keys=500, seed=11):
    rng = np.random.default_rng(seed)
    ks = rng.zipf(1.3, size=n) % n_keys
    return spark.createDataFrame(
        [(int(i), f"key{int(k)}") for i, k in enumerate(ks)],
        "id long, k string")


def test_cms_parameters_math():
    p = cms_parameters(1e-4, 0.01)
    assert p.width == 27183  # ceil(e / 1e-4)
    assert p.depth == 5      # ceil(ln 100)
    with pytest.raises(ValueError):
        cms_parameters(0.0, 0.01)
    with pytest.raises(ValueError):
        cms_parameters(1e-4, 1.5)
    with pytest.raises(ValueError):
        cms_parameters(1e-9, 0.01)  # blows the cell guard


def test_soundness_and_error_envelope(spark):
    df = _zipf_df(spark)
    n = df.count()
    w, d = cms_parameters(1e-3, 0.01)
    summary = cms_summary(df, "k", w, d)
    exact = df.groupBy("k").count() \
        .withColumnRenamed("count", "true_n")
    est = estimate_counts(exact, "k", summary)
    rows = est.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["freq_estimate"] >= r["true_n"], r["k"]
    # ε=1e-3, N=20k -> envelope 20 per key w.p. 0.99; assert all
    # within 5× the envelope to keep the test deterministic-safe
    worst = max(r["freq_estimate"] - r["true_n"] for r in rows)
    assert worst <= 5 * 1e-3 * n
    # total mass is exact: each sketch row sums all weights
    cells, _ = cms_matrix(summary)
    assert (cells.sum(axis=1) == n).all()


def test_merge_equals_single_pass_and_append_dir(spark, tmp_path):
    df = _zipf_df(spark, n=6_000)
    w, d = cms_parameters(1e-3, 0.05)
    batches = [df.filter(F.pmod(F.col("id"), F.lit(3)) == i)
               for i in range(3)]
    whole = cms_summary(df, "k", w, d)
    merged = merge_cms(*[cms_summary(b, "k", w, d)
                         for b in batches])
    wc, wp = cms_matrix(whole)
    mc, mp = cms_matrix(merged)
    assert wp == mp == CmsParams(w, d)
    assert (wc == mc).all()
    # append-only dir: per-batch summaries written with append read
    # back as ONE artifact == the merged sketch
    path = str(tmp_path / "cms_dir")
    for b in batches:
        cms_summary(b, "k", w, d).write.mode("append").parquet(path)
    ac, ap = cms_matrix(spark.read.parquet(path))
    assert ap == wp and (ac == wc).all()


def test_layout_invariance_exact(spark):
    df = _zipf_df(spark, n=4_000)
    w, d = cms_parameters(1e-3, 0.05)
    one, _ = cms_matrix(cms_summary(df.coalesce(1), "k", w, d))
    many, _ = cms_matrix(cms_summary(df.repartition(13), "k", w, d))
    assert (one == many).all()


def test_weighted_build_equals_exploded(spark):
    w, d = cms_parameters(1e-2, 0.05)
    weighted = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 0), ("d", None)],
        "k string, n int")
    exploded = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3, "k string")
    cw, _ = cms_matrix(cms_summary(weighted, "k", w, d,
                                   weight_col="n"))
    ce, _ = cms_matrix(cms_summary(exploded, "k", w, d))
    assert (cw == ce).all()


def test_round_trip_empty_mixed_null(spark, tmp_path):
    w, d = cms_parameters(1e-2, 0.05)
    df = spark.createDataFrame(
        [("a",), ("a",), (None,)], "k string")
    summary = cms_summary(df, "k", w, d)
    path = str(tmp_path / "cms")
    summary.write.parquet(path)
    rc, rp = cms_matrix(spark.read.parquet(path))
    oc, op = cms_matrix(summary)
    assert rp == op and (rc == oc).all()
    # NULL excluded from the build: total mass 2, not 3
    assert rc.sum(axis=1).tolist() == [2] * d
    # probe: NULL key -> NULL estimate
    probed = estimate_counts(df, "k", summary).collect()
    by_k = {r["k"]: r["freq_estimate"] for r in probed}
    assert by_k[None] is None
    assert by_k["a"] >= 2
    # empty input still self-describing
    empty = spark.createDataFrame([], "k string")
    ec, ep = cms_matrix(cms_summary(empty, "k", w, d))
    assert ep == CmsParams(w, d) and ec.sum() == 0
    # mixed parameters refuse to dense
    other = cms_summary(df, "k", w + 1, d)
    with pytest.raises(ValueError, match="mixes parameters"):
        cms_matrix(merge_cms(summary, other))
    with pytest.raises(ValueError, match="at least"):
        merge_cms()


def test_probe_plan_is_map_side(spark):
    w, d = cms_parameters(1e-2, 0.05)
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    summary = cms_summary(df, "k", w, d)
    plan = estimate_counts(df, "k", summary) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_frequency_report_on_documents(spark, sf_dir):
    """IDF-style probe: sketch the corpus' lang values, estimate
    each distinct lang's frequency — estimates ≥ exact and close at
    this tiny key cardinality."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = docs.groupBy("lang").count()
    rep = frequency_report(docs, "lang", exact, "lang",
                           epsilon=1e-3, delta=0.01)
    for r in rep.collect():
        assert r["freq_estimate"] >= r["count"]
        assert r["freq_estimate"] <= r["count"] + 5


def test_build_plan_single_bounded_shuffle(spark):
    """cms_summary's only Exchange is the bounded cell-keyed sum —
    the per-partition build never shuffles input rows."""
    import re
    w, d = cms_parameters(1e-2, 0.05)
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    plan = cms_summary(df, "k", w, d) \
        ._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) <= 1


def test_invalid_weights_fail_loudly(spark):
    """Negative weights would decrement shared cells (breaking the
    one-sided guarantee); fractional weights would silently truncate.
    Both fail the build instead."""
    w, d = cms_parameters(1e-2, 0.05)
    neg = spark.createDataFrame([("a", -1)], "k string, n int")
    with pytest.raises(Exception, match="negative weight"):
        cms_matrix(cms_summary(neg, "k", w, d, weight_col="n"))
    frac = spark.createDataFrame([("a", 2.7)], "k string, n double")
    with pytest.raises(Exception, match="non-integer weight"):
        cms_matrix(cms_summary(frac, "k", w, d, weight_col="n"))


def test_grouped_sketches_per_group_exact(spark):
    """group_cols builds one independent sketch per group: each
    group's cells equal an ungrouped build over that group's rows,
    NULL groups kept, and cms_matrix refuses the grouped artifact
    (densifying would sum unrelated groups)."""
    w, d = cms_parameters(1e-2, 0.05)
    df = spark.createDataFrame(
        [("a", "k1"), ("a", "k1"), ("a", "k2"),
         ("b", "k1"), (None, "k9"), ("a", None)],
        "g string, k string")
    grouped = cms_summary(df, "k", w, d, group_cols=["g"])
    for g, n_rows in (("a", 3), ("b", 1), (None, 1)):
        sub = grouped.filter(F.col("g").eqNullSafe(F.lit(g))) \
            .drop("g")
        ref = cms_summary(df.filter(F.col("g").eqNullSafe(F.lit(g))),
                          "k", w, d)
        gc, gp = cms_matrix(sub)
        rc, rp = cms_matrix(ref)
        assert gp == rp and (gc == rc).all(), g
        assert (gc.sum(axis=1) == n_rows).all(), g
    with pytest.raises(ValueError, match="grouped cms artifact"):
        cms_matrix(grouped)


def test_grouped_probe_per_group_estimates(spark):
    """estimate_counts_grouped probes each key against ITS group's
    sketch: per-group sound estimates, NULL for unknown groups and
    NULL keys/groups, map-side plan."""
    from big_data_bowl___2023_spark.operators.frequency import (
        estimate_counts_grouped,
    )
    w, d = cms_parameters(1e-2, 0.05)
    corpus = spark.createDataFrame(
        [("a", "k1")] * 5 + [("a", "k2")] * 2 + [("b", "k1")] * 3,
        "g string, k string")
    summary = cms_summary(corpus, "k", w, d, group_cols=["g"])
    probe = spark.createDataFrame(
        [("a", "k1", 5), ("a", "k2", 2), ("b", "k1", 3),
         ("zzz", "k1", None), (None, "k1", None), ("a", None, None)],
        "g string, k string, true_n int")
    got = {(r["g"], r["k"]): r["freq_estimate"]
           for r in estimate_counts_grouped(probe, "k", "g",
                                            summary).collect()}
    assert got[("a", "k1")] >= 5
    assert got[("a", "k2")] >= 2
    assert got[("b", "k1")] >= 3
    # cross-group isolation: b's sketch has mass 3, so its k1
    # estimate cannot include a's 5 occurrences beyond collisions
    assert got[("b", "k1")] <= 3
    assert got[("zzz", "k1")] is None    # group never sketched
    assert got[(None, "k1")] is None
    assert got[("a", None)] is None
    plan = estimate_counts_grouped(probe, "k", "g", summary) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_grouped_probe_exact_above_double_precision(spark):
    """Round-8 (r7 ADVICE #4): grouped CMS estimates ride a nullable
    Int64 Arrow batch, not a float64-with-NaN round-trip — counts
    above 2^53 must come back EXACT. Built by scaling a real
    sketch's int64 cells past the double mantissa; the old DoubleType
    path returned 2^54 for 2^54+1."""
    from big_data_bowl___2023_spark.operators.frequency import (
        estimate_counts_grouped,
    )
    w, d = cms_parameters(0.01, 0.01)
    df = spark.createDataFrame([("x", "g1")], "k string, g string")
    summary = cms_summary(df, "k", w, d, group_cols=["g"]) \
        .withColumn("count",
                    F.col("count") * F.lit((1 << 54)) + F.lit(1))
    probe = spark.createDataFrame(
        [("x", "g1"), ("x", "nosuchgroup"), (None, "g1")],
        "k string, g string")
    rows = {(r["k"], r["g"]): r["freq_estimate"]
            for r in estimate_counts_grouped(
                probe, "k", "g", summary).collect()}
    assert rows[("x", "g1")] == (1 << 54) + 1       # exact, not 2^54
    assert rows[("x", "nosuchgroup")] is None       # unsketched group
    assert rows[(None, "g1")] is None               # NULL key


def test_key_type_recorded_and_probe_refusal(spark):
    """The artifact records the sketched key's Spark type; a probe
    with a differently-typed key is collision noise, not an
    estimate, and must refuse (estimate_counts, grouped probe, and
    the densify path on a mixed-type artifact)."""
    from big_data_bowl___2023_spark.operators.frequency import (
        estimate_counts_grouped,
    )

    ints = spark.createDataFrame(
        [(5, "g1"), (6, "g1")], "k long, g string")
    strs = spark.createDataFrame(
        [("5", "g1"), ("6", "g1")], "k string, g string")
    summ = cms_summary(ints, "k", 256, 3)
    assert [r["key_type"] for r in
            summ.select("key_type").distinct().collect()] == ["bigint"]
    with pytest.raises(ValueError, match="built over bigint"):
        estimate_counts(strs, "k", summ)
    gsumm = cms_summary(ints, "k", 256, 3, group_cols=["g"])
    with pytest.raises(ValueError, match="built over bigint"):
        estimate_counts_grouped(strs, "k", "g", gsumm)
    # same-typed probes pass and stay sound
    got = {r["k"]: r["freq_estimate"]
           for r in estimate_counts(ints, "k", summ).collect()}
    assert got[5] >= 1 and got[6] >= 1
    # a mixed-type union (append-only dir of incompatible batches)
    # refuses at densify time — merge_cms keeps the types separate
    mixed = merge_cms(summ, cms_summary(strs, "k", 256, 3))
    with pytest.raises(ValueError, match="mixes key types"):
        cms_matrix(mixed)
    # legacy artifacts (column dropped) probe unchecked
    legacy = summ.drop("key_type")
    got = {r["k"]: r["freq_estimate"]
           for r in estimate_counts(ints, "k", legacy).collect()}
    assert got[5] >= 1
    # 'key_type' is reserved for the artifact's own record
    with pytest.raises(ValueError, match="reserved"):
        cms_summary(ints.withColumnRenamed("g", "key_type"),
                    "k", 256, 3, group_cols=["key_type"])


def test_key_type_survives_merge_and_parquet(spark, tmp_path):
    a = spark.createDataFrame([("x",), ("y",)], "k string")
    b = spark.createDataFrame([("x",), ("z",)], "k string")
    merged = merge_cms(cms_summary(a, "k", 256, 3),
                       cms_summary(b, "k", 256, 3))
    path = str(tmp_path / "cms")
    merged.write.parquet(path)
    back = spark.read.parquet(path)
    assert [r["key_type"] for r in
            back.select("key_type").distinct().collect()] == ["string"]
    cells, params = cms_matrix(back)
    assert (cells.sum(axis=1) == 4).all()
