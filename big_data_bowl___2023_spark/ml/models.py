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

from ..session import pin

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
    data = pin(train.select(*FEATURES, TARGET))
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
    data = pin(train.select(*FEATURES, TARGET))
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
    ``rfe(..., sizes = c(1:2), rfFuncs, cv)``) — Spark-first.

    Every (feature subset × CV fold) linear model is derived from ONE
    distributed aggregation: per fold, the moment matrix M = Σ zzᵀ
    with z = [1, f₁..f_d, y]. Then, driver-side on k tiny matrices:
    train-fold normal equations (X'X)β = X'y come from M_total − M_j
    restricted to the subset's rows/columns, and the held-out RMSE is
    the quadratic form (y'y − 2βᵀX'y + βᵀX'Xβ)/n_j from M_j alone.
    OLS is exactly what MLlib's unregularized LinearRegression solves
    (caret's ``preProcess="scale"`` is a reparametrization that leaves
    predictions unchanged), so the scores match a CrossValidator loop
    — for 27 scheduled fits' cost collapsed into one job. Folds are
    assigned by a seeded hash of the row, so scoring is deterministic
    and partitioning-independent.

    Returns one dict per size (best subset of that size):
    n_features, feature_set (csv), cv_rmse, selected."""
    from itertools import combinations

    import numpy as np

    cols = [F.lit(1.0).alias("_b")] + \
        [F.col(c).cast("double").alias(c) for c in features] + \
        [F.col(target).cast("double").alias("_y")]
    z = data.select(*cols).withColumn(
        "_fold", F.pmod(F.xxhash64(*[F.col(c) for c in
                                     [*features, "_y"]], F.lit(seed)),
                        F.lit(num_folds)))
    names = ["_b", *features, "_y"]
    d = len(names)
    aggs = [F.sum(F.col(a) * F.col(b)).alias(f"m_{i}_{j}")
            for i, a in enumerate(names)
            for j, b in enumerate(names) if j >= i]
    per_fold = z.groupBy("_fold").agg(F.count(F.lit(1)).alias("n"),
                                      *aggs).collect()

    def matrix(row) -> tuple[np.ndarray, float]:
        m = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                m[i, j] = m[j, i] = row[f"m_{i}_{j}"]
        return m, row["n"]

    folds = [matrix(r) for r in per_fold]
    total = sum(m for m, _ in folds)

    def cv_rmse(subset: tuple[str, ...]) -> float:
        idx = [0] + [names.index(f) for f in subset]   # bias + subset
        yi = d - 1
        sq_sum, n_sum = 0.0, 0
        for m_j, n_j in folds:
            tr = total - m_j
            try:
                beta = np.linalg.solve(tr[np.ix_(idx, idx)], tr[idx, yi])
            except np.linalg.LinAlgError:
                # Collinear subset on this fold: minimum-norm OLS.
                beta = np.linalg.lstsq(tr[np.ix_(idx, idx)],
                                       tr[idx, yi], rcond=None)[0]
            xt_y = m_j[idx, yi]
            sse = (m_j[yi, yi] - 2.0 * beta @ xt_y
                   + beta @ m_j[np.ix_(idx, idx)] @ beta)
            sq_sum += max(sse, 0.0)
            n_sum += n_j
        # caret averages per-fold RMSE; pooled SSE/N is the
        # equal-fold-size limit of that and is what we report.
        return float(np.sqrt(sq_sum / n_sum))

    sizes = sizes or list(range(1, len(features) + 1))
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
