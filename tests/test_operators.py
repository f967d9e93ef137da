"""Property tests for the relational operator core (SURVEY.md §5.2.4):
semi+anti partition the keyset, pivot preserves totals with zero fill,
window lag NULLs per partition boundary, top-k determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators import (
    aggregates as agg,
    filters as flt,
    joins as jn,
    setops as setop,
    sorts as srt,
    windows as win,
)
from big_data_bowl___2023_spark.sources.io import load_table


def test_semi_anti_partition_keyset(spark, sf_dir):
    """left_semi ∪ left_anti == left, disjointly (J7/J8)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"))
    semi = jn.semi_join(c, o, ["c_custkey"])
    anti = jn.anti_join(c, o, ["c_custkey"])
    assert semi.count() + anti.count() == c.count()
    assert semi.join(anti, ["c_custkey"], "inner").count() == 0


def test_pivot_preserves_totals(spark, sf_dir):
    """A11: pivoted row sums equal the unpivoted grouped sums, and
    absent combos read 0 not NULL (SURVEY §7.5)."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    piv = agg.pivot_sum(ev, ["user_id"], "event_type", kinds, "value")
    total_wide = piv.select(
        F.sum(sum(F.col(k) for k in kinds)).alias("t")).first()["t"]
    total_long = ev.select(F.sum("value").alias("t")).first()["t"]
    assert abs(total_wide - total_long) < 1e-6
    nulls = piv.select(
        sum(F.when(F.col(k).isNull(), 1).otherwise(0) for k in kinds)
        .alias("n")).agg(F.sum("n")).first()[0]
    assert nulls == 0


def test_window_lag_null_per_partition(spark, sf_dir):
    """W1: exactly one NULL lag per partition (its first row) — the
    boundary correctness the reference lacks (SURVEY §7.1)."""
    ev = load_table(spark, sf_dir, "events")
    w = win.ordered_window(["user_id"], ["ts", "event_id"])
    lagged = win.lag_delta(ev, "value", w, "d")
    n_null = lagged.filter(F.col("d").isNull()).count()
    n_users = ev.select("user_id").distinct().count()
    assert n_null == n_users


def test_first_per_group_is_min(spark, sf_dir):
    """W3 row_number==1 equals the groupBy-min + join-back result."""
    ev = load_table(spark, sf_dir, "events")
    first = win.first_per_group(ev, ["user_id"], ["ts", "event_id"])
    mins = ev.groupBy("user_id").agg(F.min("ts").alias("ts"))
    joined = first.select("user_id", "ts").join(mins, ["user_id", "ts"])
    assert joined.count() == first.count() == mins.count()


def test_top_k_deterministic(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    a = srt.top_k(c, [F.desc("c_acctbal"), F.asc("c_custkey")], 5).collect()
    b = srt.top_k(c.repartition(13), [F.desc("c_acctbal"),
                                      F.asc("c_custkey")], 5).collect()
    assert a == b


def test_union_all_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "view")
    assert setop.union_all(a, b).count() == a.count() + b.count()


def test_filter_not_in_null_semantics(spark, sf_dir):
    """P8: engine's explicit NULL handling vs R's silent NA drop."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "et", F.nullif("event_type", F.lit("error")))
    dropped = flt.filter_not_in(ev, "et", ["click"])
    kept = flt.filter_not_in(ev, "et", ["click"], keep_nulls=True)
    n_null = ev.filter(F.col("et").isNull()).count()
    assert kept.count() == dropped.count() + n_null


def test_bucketed_join_no_shuffle(spark, sf_dir):
    """J-layout: tables bucketed on the join key must join with no
    Exchange in the plan (co-located join, SURVEY §4.3)."""
    from big_data_bowl___2023_spark import plans

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    jn.write_bucketed(li, "b_lineitem", ["l_orderkey"], 8)
    jn.write_bucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
                      "b_orders", ["l_orderkey"], 8)
    # Force SMJ (the planner prefers broadcast at this toy size —
    # at real fact⋈fact scale SMJ is what the bucketing serves).
    joined = spark.table("b_lineitem").hint("merge").join(
        spark.table("b_orders"), ["l_orderkey"])
    plan = plans.formatted_plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan[:1500]
    assert joined.count() == li.count()


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must not change join semantics, only key distribution."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("avg_v"))
    plain = ev.join(dim, ["event_type"]).select("event_id", "avg_v")
    salted = jn.salted_join(ev, dim, ["event_type"],
                            salt_on="event_id").select("event_id", "avg_v")
    assert plain.count() == salted.count()
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0
