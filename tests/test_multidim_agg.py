"""ROLLUP / CUBE / GROUPING SETS verified cell-level against DuckDB's
implementation of the same OLAP constructs, with per-key GROUPING
indicators so subtotal NULLs and genuine NULL keys can't alias."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.aggregates import (
    cube_agg, grouping_sets_agg, rollup_agg,
)
from big_data_bowl___2023_spark.sources.io import load_table


def _spark_rows(df):
    return {(r.g_o_orderpriority, r.g_o_orderstatus,
             r.o_orderpriority, r.o_orderstatus, r.revenue, r.n)
            for r in df.collect()}


def _duck_rows(sf_dir, modifier):
    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT CAST(GROUPING(o_orderpriority) AS INT),
               CAST(GROUPING(o_orderstatus) AS INT),
               o_orderpriority, o_orderstatus,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2)))
                    AS DECIMAL(18, 2)) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM read_parquet('{sf_dir}/orders.parquet')
        GROUP BY {modifier}
    """).fetchall()
    con.close()
    return {(ga, gb, a, b, rev, n) for ga, gb, a, b, rev, n in rows}


def _aggs():
    return dict(
        revenue=F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("decimal(18,2)"),
        n=F.count(F.lit(1)),
    )


def test_rollup_matches_duckdb(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    got = _spark_rows(
        rollup_agg(orders, ["o_orderpriority", "o_orderstatus"], **_aggs()))
    want = _duck_rows(sf_dir, "ROLLUP (o_orderpriority, o_orderstatus)")
    assert got == want
    # grand-total row present exactly once
    assert sum(1 for r in got if r[0] == 1 and r[1] == 1) == 1


def test_cube_matches_duckdb(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    got = _spark_rows(
        cube_agg(orders, ["o_orderpriority", "o_orderstatus"], **_aggs()))
    want = _duck_rows(sf_dir, "CUBE (o_orderpriority, o_orderstatus)")
    assert got == want
    # cube adds the (status-only) marginal rollup lacks
    assert any(r[0] == 1 and r[1] == 0 for r in got)


def test_grouping_sets_match_duckdb(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    got = _spark_rows(grouping_sets_agg(
        orders,
        [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
        ["o_orderpriority", "o_orderstatus"], **_aggs()))
    want = _duck_rows(
        sf_dir,
        "GROUPING SETS ((o_orderpriority, o_orderstatus),"
        " (o_orderpriority), ())")
    assert got == want


def test_rollup_is_single_shuffle(spark, sf_dir):
    """The whole rollup must compile to one Expand + one Exchange —
    not one scan per grouping level."""
    orders = load_table(spark, sf_dir, "orders")
    plan = (rollup_agg(orders, ["o_orderpriority", "o_orderstatus"],
                       **_aggs())
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
    assert "Expand" in plan
