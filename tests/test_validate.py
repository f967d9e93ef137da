"""Data-quality suite: metrics cross-checked against DuckDB on the
same parquet, single-aggregation-pass plan asserted, and gate behavior
on a fixture with known violations."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.validate import (
    Suite, check_all_passed,
)
from big_data_bowl___2023_spark.sources.io import load_table


def test_suite_metrics_match_duckdb(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    res = (Suite(exact_unique=True)
           .non_empty()
           .is_complete("o_orderkey")
           .is_unique("o_orderkey")
           .is_complete("o_orderdate", min_ratio=0.5)
           .in_range("o_totalprice", 0.0, 1e9)
           .satisfies("priority_known",
                      F.col("o_orderpriority").isNotNull())
           .run(orders))
    got = {(r.check, r.column): (round(r.metric, 9), r.passed)
           for r in res.collect()}

    con = duckdb.connect()
    n, nk_nonnull, nk_distinct, nc_nonnull, bad_price, prio_null = \
        con.execute(f"""
            SELECT count(*),
                   count(o_orderkey),
                   count(DISTINCT o_orderkey),
                   count(o_orderdate),
                   sum(CASE WHEN o_totalprice < 0
                             OR o_totalprice > 1e9 THEN 1 ELSE 0 END),
                   sum(CASE WHEN o_orderpriority IS NULL
                            THEN 1 ELSE 0 END)
            FROM read_parquet('{sf_dir}/orders.parquet')
        """).fetchone()
    con.close()

    assert got[("non_empty", "*")] == (float(n), True)
    assert got[("complete", "o_orderkey")] == (
        round(nk_nonnull / n, 9), nk_nonnull == n)
    assert got[("unique", "o_orderkey")] == (
        round(nk_distinct / n, 9), nk_distinct == n)
    assert got[("complete", "o_orderdate")][0] == round(nc_nonnull / n, 9)
    assert got[("in_range", "o_totalprice")] == (
        float(bad_price), bad_price == 0)
    assert got[("satisfies", "priority_known")] == (
        float(prio_null), prio_null == 0)


def test_suite_single_aggregation_pass(spark, sf_dir):
    """All agg-style checks must fold into one job: the physical plan
    for the combined aggregate has exactly one pair of hash-aggregate
    levels (partial + final), i.e. one Exchange."""
    orders = load_table(spark, sf_dir, "orders")
    suite = (Suite()
             .is_complete("o_orderkey")
             .in_range("o_totalprice", 0.0, 1e9)
             .satisfies("s", F.col("o_orderstatus").isin("O", "F", "P")))
    exprs = []
    for i, (_, _, metric, _, passed) in enumerate(suite._aggs):
        exprs.append(metric.alias(f"m{i}"))
        exprs.append(passed.alias(f"p{i}"))
    plan = (orders.agg(*exprs)._jdf.queryExecution()
            .executedPlan().toString())
    assert plan.count("Exchange") == 1


def test_foreign_key_and_gate(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    ok = (Suite()
          .has_foreign_key("c_nationkey", nation, "n_nationkey")
          .run(customer))
    assert check_all_passed(ok)

    # inject orphans: a customer pointing at a nonexistent nation
    broken = customer.limit(3).withColumn("c_nationkey", F.lit(9999))
    res = (Suite()
           .has_foreign_key("c_nationkey", nation, "n_nationkey")
           .run(customer.unionByName(broken)))
    row = res.collect()[0]
    assert row.check == "foreign_key" and row.metric == 3.0
    assert not row.passed
    assert not check_all_passed(res)


def test_suite_on_empty_frame_reports_not_raises(spark, sf_dir):
    """Regression: sum-based metrics are null on an empty input; the
    suite must report them as zero violations / pass, not raise
    TypeError on float(None)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.lit(False))
    res = (Suite()
           .non_empty()
           .in_range("o_totalprice", 0.0, 1e9)
           .satisfies("priority_known",
                      F.col("o_orderpriority").isNotNull())
           .run(orders))
    by_check = {r.check: r for r in res.collect()}
    assert by_check["in_range"].metric == 0.0
    assert by_check["in_range"].passed
    assert by_check["satisfies"].metric == 0.0
    assert by_check["satisfies"].passed
    assert not by_check["non_empty"].passed  # empty still fails this
    assert not check_all_passed(res)


def test_corr_matrix_constant_column_yields_nan(spark):
    from big_data_bowl___2023_spark.operators import aggregates as agg
    import math
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)],
                               ["x", "c"])
    got = {(r.col_a, r.col_b): r.corr
           for r in agg.corr_matrix(df, ["x", "c"]).collect()}
    assert got[("x", "x")] == 1.0
    assert math.isnan(got[("x", "c")])  # zero variance: no corr
    assert math.isnan(got[("c", "c")])


def test_gate_fails_on_duplicates_and_range(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    dupes = docs.unionByName(docs.limit(10))
    res = (Suite(exact_unique=True)
           .is_unique("doc_id")
           .in_range("doc_id", 0, -1)   # impossible range: all violate
           .run(dupes))
    by_check = {r.check: r for r in res.collect()}
    assert not by_check["unique"].passed
    assert by_check["in_range"].metric == dupes.count()
    assert not by_check["in_range"].passed
