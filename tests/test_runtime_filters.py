"""E31 — runtime bloom-filter join pruning: with the size gate lowered
(locally tables are tiny; at scale the default 10 GB gate passes on
any real fact table), Catalyst must inject a bloom_filter_agg built
from the selective dim side into the fact side of a shuffle join —
and the filtered plan must return identical results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.session import enable_runtime_filters
from big_data_bowl___2023_spark.sources.io import load_table


@pytest.fixture
def shuffle_join_session(spark):
    """Force shuffle joins + lowered bloom gate; restore after."""
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    enable_runtime_filters(spark, application_side_min_bytes=0)
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold", "10GB")


def _join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderpriority") == "1-URGENT"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .select("l_orderkey", "l_extendedprice"))


def test_bloom_filter_injected_and_correct(shuffle_join_session, sf_dir):
    spark = shuffle_join_session
    j = _join(spark, sf_dir)
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in plan
    n_filtered = j.count()

    # same query with the gate back at its default: no injection,
    # identical result — the filter is pure pruning, never semantics
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold", "10GB")
    j2 = _join(spark, sf_dir)
    assert "bloom_filter_agg" not in (
        j2._jdf.queryExecution().optimizedPlan().toString())
    assert j2.count() == n_filtered
    enable_runtime_filters(spark, application_side_min_bytes=0)
