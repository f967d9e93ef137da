"""Q7 ``expected_metric_model`` (SURVEY.md §2.10 M1–M9): the xPZs /
dPZs residual layer, re-expressed as a ``pyspark.ml`` Pipeline.

Reference (Model Construction.R:14-41): caret repeated 10-fold CV over
{stepwise-LM, random forest, xgbTree, xgbLinear} on two features
(Blockers_All + is_play_action), then RF predictions become xPZs and
dPZs = actual − xPZs. Spark mapping: VectorAssembler → StandardScaler
(caret ``preProcess="scale"``) → {LinearRegression, RandomForest,
GBT} → CrossValidator(numFolds=10) → ``model.transform`` residuals.
Training distributes per tree/fold; transform is a lazy projection.

Seeds pinned (MC:15 set.seed(99); WIP.R:255 set.seed(5675)) —
driver-side checks are rows-only (SURVEY §7.8).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.regression import (
    GBTRegressor,
    LinearRegression,
    RandomForestRegressor,
)
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURES = ["Blockers_All", "is_play_action"]   # MC:19-24
TARGET = "Percent_to_Pressure_Zone_per_s"
SEED = 99                                        # MC:15
SPLIT_SEED = 5675                                # WIP.R:255


def train_test_split(df: DataFrame, train_frac: float = 0.8,
                     seed: int = SPLIT_SEED) -> tuple[DataFrame, DataFrame]:
    """M1 (WIP.R:255-262): seeded 80/20 split."""
    train, test = df.randomSplit([train_frac, 1 - train_frac], seed=seed)
    return train, test


def _pipeline(regressor) -> Pipeline:
    """M3: assemble + scale (caret preProcess='scale') + fit."""
    return Pipeline(stages=[
        VectorAssembler(inputCols=FEATURES, outputCol="features_raw"),
        StandardScaler(inputCol="features_raw", outputCol="features",
                       withMean=False, withStd=True),
        regressor,
    ])


def _regressors() -> dict[str, object]:
    common = dict(featuresCol="features", labelCol=TARGET,
                  predictionCol="xPZs")
    return {
        # M4: stepwise-AIC LM — with 2 features, exhaustive subset
        # search is trivial; plain LR is the chosen-model equivalent.
        "linear": LinearRegression(**common),
        # M5 (the production model, MC:33)
        "random_forest": RandomForestRegressor(seed=SEED, **common),
        # M6: xgbTree stand-in
        "gbt": GBTRegressor(seed=SEED, **common),
    }


def fit_expected_metric_model(train: DataFrame,
                              model: str = "random_forest",
                              num_folds: int = 10,
                              use_cv: bool = True) -> PipelineModel:
    """M2: repeated-CV model fit (caret repeatedcv 10×3 → Spark
    CrossValidator(numFolds=10); repeats are re-seeded runs and add
    nothing under a fixed seed). ``use_cv=False`` fits the pipeline
    directly — with an empty param grid CV only re-estimates the
    generalization error, it cannot change the selected model, so the
    direct fit is the cheap equivalent when that error isn't needed."""
    reg = _regressors()[model]
    pipe = _pipeline(reg)
    # Tree training runs dozens of small RDD jobs over the input;
    # localCheckpoint truncates the (deep) metric-pipeline lineage so
    # each job reads materialized partitions instead of re-walking the
    # plan. Distributed — no driver collect.
    data = train.select(*FEATURES, TARGET).localCheckpoint()
    if not use_cv:
        return pipe.fit(data)
    evaluator = RegressionEvaluator(labelCol=TARGET, predictionCol="xPZs",
                                    metricName="rmse")
    cv = CrossValidator(estimator=pipe,
                        estimatorParamMaps=ParamGridBuilder().build(),
                        evaluator=evaluator, numFolds=num_folds,
                        seed=SEED, parallelism=2)
    return cv.fit(data).bestModel


def compare_models(train: DataFrame,
                   num_folds: int = 10) -> dict[str, float]:
    """M7 (MC:27-30): CV RMSE per model family."""
    evaluator = RegressionEvaluator(labelCol=TARGET, predictionCol="xPZs",
                                    metricName="rmse")
    data = train.select(*FEATURES, TARGET).localCheckpoint()
    out = {}
    for name, reg in _regressors().items():
        cv = CrossValidator(estimator=_pipeline(reg),
                            estimatorParamMaps=ParamGridBuilder().build(),
                            evaluator=evaluator, numFolds=num_folds,
                            seed=SEED, parallelism=2)
        out[name] = float(min(cv.fit(data).avgMetrics))
    return out


def attach_expected_metric(rushers_final: DataFrame,
                           model: PipelineModel,
                           players: DataFrame,
                           plays: DataFrame) -> DataFrame:
    """M8 (MC:33-41): xPZs prediction + dPZs residual, then attach
    display names (broadcast dim) and play context."""
    scored = model.transform(rushers_final)
    scored = scored.withColumn("dPZs", F.col(TARGET) - F.col("xPZs"))
    scored = scored.drop("features_raw", "features")
    scored = scored.join(
        F.broadcast(players.select("nflId", "displayName")), ["nflId"])  # MC:36
    ctx = plays.select("gameId", "playId", "down", "yardsToGo").distinct()
    return scored.join(F.broadcast(ctx), ["gameId", "playId"])           # MC:37


def feature_importances(model: PipelineModel) -> dict[str, float]:
    """M9 (WIP.R:287-289)."""
    reg = model.stages[-1]
    imps = getattr(reg, "featureImportances", None)
    if imps is None:
        return {}
    return {f: float(imps[i]) for i, f in enumerate(FEATURES)}


def rfe_selection(data: DataFrame, features: list[str], target: str,
                  num_folds: int = 3, seed: int = SEED,
                  sizes: list[int] | None = None) -> list[dict]:
    """M10 recursive feature elimination (WIP.R:241-274: caret
    ``rfe(..., sizes = c(1:2), rfFuncs, cv)``).

    With d features the caret search space is the best subset per
    size; here that subset search is explicit: every combination of
    each requested size is scored by seeded k-fold CV RMSE, the best
    subset per size is reported, and the globally best subset is
    flagged ``selected``. Each CV fit is a distributed MLlib job;
    the loop is O(subsets) driver-side orchestration only — with the
    reference's d = 2 that is 3 fits, and the generic path stays
    usable for small d (caret's rfe is likewise exponential-ish in
    practice via per-size rankings).

    Returns one dict per size: n_features, feature_set (csv),
    cv_rmse, selected."""
    from itertools import combinations

    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    sizes = sizes or list(range(1, len(features) + 1))
    train = data.select(*features, target).localCheckpoint()
    evaluator = RegressionEvaluator(labelCol=target,
                                    predictionCol="prediction",
                                    metricName="rmse")

    def cv_rmse(subset: tuple[str, ...]) -> float:
        pipe = Pipeline(stages=[
            VectorAssembler(inputCols=list(subset),
                            outputCol="features_raw"),
            StandardScaler(inputCol="features_raw", outputCol="features",
                           withMean=False, withStd=True),
            LinearRegression(featuresCol="features", labelCol=target),
        ])
        cv = CrossValidator(estimator=pipe,
                            estimatorParamMaps=ParamGridBuilder().build(),
                            evaluator=evaluator, numFolds=num_folds,
                            seed=seed, parallelism=2)
        return float(cv.fit(train).avgMetrics[0])

    per_size = []
    for size in sizes:
        scored = sorted(
            ((cv_rmse(sub), sub) for sub in combinations(features, size)),
            key=lambda x: (x[0], x[1]))
        best_rmse, best_sub = scored[0]
        per_size.append({"n_features": size,
                         "feature_set": ",".join(best_sub),
                         "cv_rmse": round(best_rmse, 6)})
    winner = min(per_size, key=lambda r: r["cv_rmse"])["n_features"]
    for r in per_size:
        r["selected"] = r["n_features"] == winner
    return per_size


def blockers_with_dpzs(blockers_metric: DataFrame,
                       rushers_scored: DataFrame,
                       players: DataFrame) -> DataFrame:
    """MC:39-41: blockers pick up their rusher's residual via the
    role-playing FK, then display names."""
    r = rushers_scored.select(
        "playId", "gameId",
        F.col("nflId").alias("pff_nflIdBlockedPlayer"), "dPZs")
    out = blockers_metric.join(r, ["playId", "gameId",
                                   "pff_nflIdBlockedPlayer"])
    return out.join(F.broadcast(players.select("nflId", "displayName")),
                    ["nflId"])
