"""Driver-checked ML-surface queries (SURVEY.md §2.10 M1–M11).

All rows-only: model internals (seeded RNG streams, tree structure)
and special-function p-values are engine-specific by nature — SURVEY
§7.8. The full Q7 pipeline with the NFL feature semantics runs under
pytest (ml.models); these queries exercise the same surface on the
star schema so the driver sees the ML layer execute end-to-end.

(Registry curation note: the driver checks the first 50 registered
queries; the standalone M1 split query was folded into
``ml_expected_value_model`` — which now fits on the seeded 80% train
split, covering M1+M3+M4+M8 in one row — to stay within the checked
set. ``train_test_split`` itself remains pytest-covered.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ml import closed_form as cf
from ..operators.sampling import portable_split_col, portable_split_cut
from ..registry import query
from ._util import load_table

TRAIN_FRAC = 0.8
_CUT = portable_split_cut(TRAIN_FRAC)            # '3333'

# Shared oracle fragments: integer-exact order features + train split.
# Quantities are integral and money is 2-decimal, so x1/x2/yc are
# exact BIGINTs; DuckDB sums them in HUGEINT, Spark in DECIMAL(38,0)
# — both exact, so the double conversions below are bit-identical.
_FEATS_SQL = """
feats AS (
  SELECT o.o_orderkey, o.o_totalprice,
         CAST(COUNT(*) AS BIGINT) AS x1,
         CAST(SUM(l.l_quantity) AS BIGINT) AS x2,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS yc
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_totalprice),
tr AS (
  SELECT * FROM feats
  WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) >= '{cut}')
""".format(cut=_CUT)


def _order_features(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    feats = (li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
             .agg(F.count(F.lit(1)).cast("double").alias("n_items"),
                  F.sum("l_quantity").alias("total_qty")))
    return o.select("o_orderkey", "o_totalprice").join(feats, ["o_orderkey"])


def _int_features(df):
    """Integer-scaled view: x1 = item count, x2 = total qty (integral
    by data contract), yc = price in cents. Exact on both engines."""
    return df.select(
        "o_orderkey", "o_totalprice", "n_items", "total_qty",
        F.col("n_items").cast("bigint").alias("x1"),
        F.col("total_qty").cast("bigint").alias("x2"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("yc"))


_MOMENTS2 = {
    "n": "CAST(COUNT(*) AS DOUBLE)",
    "s1": "CAST(SUM(x1) AS DOUBLE)",
    "s2": "CAST(SUM(x2) AS DOUBLE)",
    "s11": "CAST(SUM(x1*x1) AS DOUBLE)",
    "s12": "CAST(SUM(x1*x2) AS DOUBLE)",
    "s22": "CAST(SUM(x2*x2) AS DOUBLE)",
    "sy": "CAST(SUM(yc) AS DOUBLE)/100",
    "s1y": "CAST(SUM(x1*yc) AS DOUBLE)/100",
    "s2y": "CAST(SUM(x2*yc) AS DOUBLE)/100",
}


def _moments2(df):
    """The nine 2-feature moment sums, DECIMAL(38,0)-exact, as Python
    floats converted exactly as the oracle's HUGEINT→DOUBLE casts."""
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("x1"))).alias("s1"),
        F.sum(d(F.col("x2"))).alias("s2"),
        F.sum(d(F.col("x1") * F.col("x1"))).alias("s11"),
        F.sum(d(F.col("x1") * F.col("x2"))).alias("s12"),
        F.sum(d(F.col("x2") * F.col("x2"))).alias("s22"),
        F.sum(d(F.col("yc"))).alias("syc"),
        F.sum(d(F.col("x1") * F.col("yc"))).alias("s1yc"),
        F.sum(d(F.col("x2") * F.col("yc"))).alias("s2yc"),
        F.sum(d(F.col("yc") * F.col("yc"))).alias("syyc"),
    ).collect()[0]
    return {"n": float(row["n"]),
            "s1": float(row["s1"]), "s2": float(row["s2"]),
            "s11": float(row["s11"]), "s12": float(row["s12"]),
            "s22": float(row["s22"]),
            "sy": float(row["syc"]) / 100,
            "s1y": float(row["s1yc"]) / 100,
            "s2y": float(row["s2yc"]) / 100,
            "syy": float(row["syyc"]) / 100 / 100}


_DET, _D0, _D1, _D2 = cf.solve_ols2_sql(**_MOMENTS2)
_EXPECTED_VALUE_ORACLE = """
WITH {feats}
, m AS (SELECT
    ({d0}) / ({det}) AS b0,
    ({d1}) / ({det}) AS b1,
    ({d2}) / ({det}) AS b2
  FROM tr)
SELECT f.o_orderkey, f.o_totalprice,
       ROUND(m.b0 + m.b1*CAST(f.x1 AS DOUBLE)
             + m.b2*CAST(f.x2 AS DOUBLE), 2) AS expected_price,
       ROUND(f.o_totalprice - (m.b0 + m.b1*CAST(f.x1 AS DOUBLE)
             + m.b2*CAST(f.x2 AS DOUBLE)), 2) AS residual
FROM feats f CROSS JOIN m
""".format(feats=_FEATS_SQL, det=_DET, d0=_D0, d1=_D1, d2=_D2)


@query("ml_expected_value_model", oracle=_EXPECTED_VALUE_ORACLE)
def ml_expected_value_model(spark, sf_dir):
    """M1/M3/M4/M8: deterministic 80/20 split → least-squares fit on
    the train split → residuals scored over ALL rows — the xPZs/dPZs
    shape (MC:19, 33-35) on order features (n_items, total_qty →
    o_totalprice).

    Hash-checkable by construction: the split is the engine-portable
    md5 split (operators/sampling.py — randomSplit is partition-layout
    dependent), and the fit is the closed form of the scale+LR
    pipeline (ml/closed_form.py — scaling without centering is a
    reparametrization, so OLS β gives the identical predictions MLlib
    converges to). One distributed aggregation for the moments, one
    driver-side 3x3 Cramer solve, projection for scoring."""
    data = _int_features(_order_features(spark, sf_dir))
    train = data.filter(portable_split_col("o_orderkey", TRAIN_FRAC))
    m = _moments2(train)
    b0, b1, b2 = cf.solve_ols2(
        m["n"], m["s1"], m["s2"], m["s11"], m["s12"], m["s22"],
        m["sy"], m["s1y"], m["s2y"])
    pred = (F.lit(b0) + F.lit(b1) * F.col("x1").cast("double")
            + F.lit(b2) * F.col("x2").cast("double"))
    return data.select(
        "o_orderkey", "o_totalprice",
        F.round(pred, 2).alias("expected_price"),
        F.round(F.col("o_totalprice") - pred, 2).alias("residual"))


@query("ml_significance_tests")
def ml_significance_tests(spark, sf_dir):
    """M11 (WIP.R:295-299): pooled pairwise t-tests (Bonferroni) +
    tie-corrected Kruskal-Wallis over event_type groups of value —
    the ``pairwise.t.test(Zone, label)`` / ``kruskal.test`` shape.
    Sufficient statistics and midranks are distributed aggregations;
    p-values come from the engine's own incomplete-beta/gamma
    implementations (ml.stats; closed-form cases pinned in pytest)."""
    from ..ml.stats import significance_tests

    ev = load_table(spark, sf_dir, "events")
    return significance_tests(spark, ev, "event_type", "value")


@query("ml_rfe_selection")
def ml_rfe_selection(spark, sf_dir):
    """M10 (WIP.R:241-274): explicit best-subset-per-size feature
    selection with seeded 3-fold CV RMSE over {n_items, total_qty};
    the winning size is flagged ``selected`` (caret rfe sizes=1:2)."""
    from ..ml.models import rfe_selection

    data = _order_features(spark, sf_dir)
    rows = rfe_selection(data, ["n_items", "total_qty"], "o_totalprice")
    return spark.createDataFrame(rows).select(
        "n_features", "feature_set", "cv_rmse", "selected")
