"""Round-3 oracle-ization layer: engine-portable md5 split, closed-form
OLS (vs MLlib's LinearRegression on the same data), and the
significance-stats surface staying consistent with the p-value one."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.ml import closed_form as cf
from big_data_bowl___2023_spark.operators.sampling import (
    portable_split_col,
    portable_split_cut,
    portable_train_test_split,
)
from big_data_bowl___2023_spark.sources.io import load_table


def test_portable_split_partitions_and_matches_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tr, te = portable_train_test_split(docs, 0.8, "doc_id")
    n, ntr, nte = docs.count(), tr.count(), te.count()
    assert ntr + nte == n                    # exact partition
    assert abs(ntr / n - 0.8) < 0.05         # ~fraction
    # the SAME predicate evaluated by DuckDB selects the SAME rows
    ids = {r.doc_id for r in tr.select("doc_id").collect()}
    cut = portable_split_cut(0.8)
    con = duckdb.connect()
    oracle = {r[0] for r in con.sql(
        f"SELECT doc_id FROM '{sf_dir}/documents.parquet' "
        f"WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) >= '{cut}'"
    ).fetchall()}
    assert ids == oracle


def test_portable_split_cut_edges():
    assert portable_split_cut(1.0) == "0000"   # keep everything
    assert portable_split_cut(0.0) == "g"      # keep nothing
    assert portable_split_cut(0.8) == "3333"
    with pytest.raises(ValueError):
        portable_split_cut(1.5)


def test_portable_split_is_scanside_filter(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (docs.filter(portable_split_col("doc_id", 0.5))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan              # no shuffle — pure filter


def test_closed_form_matches_mllib(spark, sf_dir):
    """The Cramer solve must agree with MLlib's LinearRegression
    (normal solver) on the same training frame — the equivalence the
    ml_expected_value_model docstring claims."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    li = load_table(spark, sf_dir, "lineitem")
    df = (li.groupBy("l_orderkey")
          .agg(F.count(F.lit(1)).cast("double").alias("x1"),
               F.sum("l_quantity").alias("x2"),
               F.sum("l_extendedprice").alias("y")))
    lr = LinearRegression(featuresCol="f", labelCol="y", solver="normal")
    m = lr.fit(VectorAssembler(inputCols=["x1", "x2"], outputCol="f")
               .transform(df))
    row = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").alias("s1"), F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y")).collect()[0]
    b0, b1, b2 = cf.solve_ols2(*[row[c] for c in
                                 ("n", "s1", "s2", "s11", "s12", "s22",
                                  "sy", "s1y", "s2y")])
    assert b0 == pytest.approx(m.intercept, rel=1e-6)
    assert b1 == pytest.approx(m.coefficients[0], rel=1e-6)
    assert b2 == pytest.approx(m.coefficients[1], rel=1e-6)


def test_significance_stats_agree_with_pvalue_surface(spark, sf_dir):
    """The hash-checkable statistics and the p-value surface are the
    same tests on the same data — statistics must agree to the shared
    rounding (values are 2-decimal, so quantization is lossless)."""
    from big_data_bowl___2023_spark.ml.stats import (
        significance_stats,
        significance_tests,
    )
    ev = load_table(spark, sf_dir, "events")
    got = {(r.test, r.group_a, r.group_b): (r.statistic, r.df)
           for r in significance_stats(spark, ev, "event_type",
                                       "value").collect()}
    ref = {(r.test, r.group_a, r.group_b): (r.statistic, r.df)
           for r in significance_tests(spark, ev, "event_type",
                                       "value").collect()}
    assert set(got) == set(ref)
    for k in got:
        assert got[k][0] == pytest.approx(ref[k][0], abs=2e-6), k
        assert got[k][1] == ref[k][1]
