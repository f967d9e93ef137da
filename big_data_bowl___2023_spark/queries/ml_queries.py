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

from ..registry import query
from ._util import load_table


def _order_features(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    feats = (li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
             .agg(F.count(F.lit(1)).cast("double").alias("n_items"),
                  F.sum("l_quantity").alias("total_qty")))
    return o.select("o_orderkey", "o_totalprice").join(feats, ["o_orderkey"])


@query("ml_expected_value_model")
def ml_expected_value_model(spark, sf_dir):
    """M1/M3/M4/M8: seeded 80/20 split (WIP.R:255, seed 5675) → scale
    → linear regression on the train split → residuals scored over
    ALL rows — the xPZs/dPZs shape (MC:19, 33-35) on order features
    (n_items, total_qty → o_totalprice). Single distributed fit
    (normal-equation LSQ); transform is a lazy projection."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml.regression import LinearRegression

    from ..ml.models import SPLIT_SEED, train_test_split

    data = _order_features(spark, sf_dir)
    train, _test = train_test_split(data, 0.8, SPLIT_SEED)

    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=["n_items", "total_qty"],
                        outputCol="features_raw"),
        StandardScaler(inputCol="features_raw", outputCol="features",
                       withMean=False, withStd=True),
        LinearRegression(featuresCol="features", labelCol="o_totalprice",
                         predictionCol="expected_price"),
    ])
    model = pipe.fit(train.localCheckpoint())
    scored = model.transform(data)
    return scored.select(
        "o_orderkey", "o_totalprice",
        F.round("expected_price", 2).alias("expected_price"),
        F.round(F.col("o_totalprice") - F.col("expected_price"), 2)
         .alias("residual"))


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
