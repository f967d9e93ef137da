"""E52 — plan report: known queries produce the plan shapes their
docstrings claim, expressed as report fields (broadcasts on the star
join, no nested-loop joins anywhere in the headline registry query,
pushdown visible, the round-1 anti-pattern detectable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.plans.explain import plan_report
from big_data_bowl___2023_spark.registry import all_queries
from big_data_bowl___2023_spark.sources.io import load_table


def test_star_join_report(spark, sf_dir):
    q = all_queries()["j3_broadcast_dim_revenue"](spark, sf_dir)
    r = plan_report(q)
    assert r["n_broadcast_joins"] >= 3   # three explicit dim broadcasts
    assert not r["has_cartesian"] and r["n_bnl_joins"] == 0


def test_pushdown_visible_in_report(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = (li.filter(F.col("l_quantity") < 10)
         .select("l_orderkey", "l_quantity"))
    r = plan_report(q)
    assert r["n_scans"] >= 1
    assert r["scans_with_pushed_filters"] >= 1
    assert r["n_exchanges"] == 0         # pure scan+filter: no shuffle


def test_detects_nested_loop_anti_pattern(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("va"))
    b = emb.select(F.col("vec_id").alias("vb"))
    bad = a.join(b, F.col("va") < F.col("vb"))  # inequality-only join
    r = plan_report(bad)
    assert r["n_bnl_joins"] >= 1 or r["has_cartesian"]
