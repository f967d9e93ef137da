"""E39 — parquet aggregate pushdown: MIN/MAX/COUNT must be answered
by the scan (PushedAggregation in the DSv2 plan) with values identical
to the ordinary full-scan path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.session import enable_aggregate_pushdown


@pytest.fixture
def pushdown_session(spark):
    prev = spark.conf.get("spark.sql.sources.useV1SourceList")
    enable_aggregate_pushdown(spark)
    yield spark
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
    spark.conf.set("spark.sql.sources.useV1SourceList", prev)


def test_footer_aggregates_match_full_scan(pushdown_session, sf_dir):
    spark = pushdown_session
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    q = df.agg(F.min("o_orderkey").alias("lo"),
               F.max("o_orderkey").alias("hi"),
               F.count(F.lit(1)).alias("n"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregation: [MIN(" in plan
    pushed = q.collect()[0]

    spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
    plain = (spark.read.parquet(f"{sf_dir}/orders.parquet")
             .agg(F.min("o_orderkey").alias("lo"),
                  F.max("o_orderkey").alias("hi"),
                  F.count(F.lit(1)).alias("n")))
    # v2 scan still prints an EMPTY PushedAggregation list when the
    # switch is off — the aggregate no longer reaches the scan
    assert "PushedAggregation: [MIN(" not in (
        plain._jdf.queryExecution().executedPlan().toString())
    assert plain.collect()[0] == pushed
