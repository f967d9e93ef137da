"""Driver-checked ML-surface queries (SURVEY.md §2.10 M1–M9).

All rows-only: model internals (seeded RNG streams, tree structure)
are engine-specific by nature — SURVEY §7.8. The full Q7 pipeline with
the NFL feature semantics runs under pytest (ml.models); these queries
exercise the same MLlib surface on the star schema so the driver sees
the ML layer execute end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ._util import load_table


@query("ml_train_test_split")
def ml_train_test_split(spark, sf_dir):
    """M1: seeded randomSplit 80/20 (WIP.R:255-262, seed 5675) —
    returns the split sizes and label means (schema-stable, seeded)."""
    o = load_table(spark, sf_dir, "orders")
    train, test = o.randomSplit([0.8, 0.2], seed=5675)
    return (train.agg(F.count(F.lit(1)).alias("n"),
                      F.avg("o_totalprice").alias("avg_price"))
            .withColumn("split", F.lit("train"))
            .unionByName(
                test.agg(F.count(F.lit(1)).alias("n"),
                         F.avg("o_totalprice").alias("avg_price"))
                .withColumn("split", F.lit("test"))))


@query("ml_expected_value_model")
def ml_expected_value_model(spark, sf_dir):
    """M3/M4/M8: scale + linear regression + residual — the xPZs/dPZs
    shape (MC:19, 33-35) on order features (n_items, total_qty →
    o_totalprice). Single Spark job (normal-equation LSQ); residuals
    returned per order."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml.regression import LinearRegression

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    feats = (li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
             .agg(F.count(F.lit(1)).cast("double").alias("n_items"),
                  F.sum("l_quantity").alias("total_qty")))
    data = o.select("o_orderkey", "o_totalprice").join(feats, ["o_orderkey"])

    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=["n_items", "total_qty"],
                        outputCol="features_raw"),
        StandardScaler(inputCol="features_raw", outputCol="features",
                       withMean=False, withStd=True),
        LinearRegression(featuresCol="features", labelCol="o_totalprice",
                         predictionCol="expected_price"),
    ])
    model = pipe.fit(data.localCheckpoint())
    scored = model.transform(data)
    return scored.select(
        "o_orderkey", "o_totalprice",
        F.round("expected_price", 2).alias("expected_price"),
        F.round(F.col("o_totalprice") - F.col("expected_price"), 2)
         .alias("residual"))
