"""Range join: bucketed equi-join plan must equal the naive
inequality join semantics (DuckDB oracle) without the nested loop."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from big_data_bowl___2023_spark import plans
from big_data_bowl___2023_spark.operators.range_join import range_join
from big_data_bowl___2023_spark.sources.io import load_table


def _sides(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    points = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"))
    intervals = (ev.filter(F.col("event_type").isin("view", "purchase"))
                 .groupBy("user_id")
                 .agg(F.min("ts").alias("win_start"),
                      F.max("ts").alias("win_end")))
    return points, intervals


def test_range_join_matches_duckdb(spark, sf_dir):
    points, intervals = _sides(spark, sf_dir)
    got = range_join(points, intervals, ["user_id"], "ts",
                     "win_start", "win_end",
                     bucket_seconds=6 * 3600).collect()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    ref = con.execute("""
        WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                           user_id, event_type FROM events),
        p AS (SELECT user_id, ts, event_id AS click_id FROM ev
              WHERE event_type = 'click'),
        i AS (SELECT user_id, MIN(ts) AS win_start, MAX(ts) AS win_end
              FROM ev WHERE event_type IN ('view', 'purchase')
              GROUP BY user_id)
        SELECT p.user_id, p.ts, p.click_id, i.win_start, i.win_end
        FROM p JOIN i ON p.user_id = i.user_id
         AND p.ts >= i.win_start AND p.ts <= i.win_end
    """).fetchall()

    got_rows = sorted((r.user_id, r.ts, r.click_id,
                       r.win_start, r.win_end) for r in got)
    assert got_rows == sorted(ref)
    assert got_rows, "range join matched nothing"


def test_range_join_plan_is_equi_not_nested_loop(spark, sf_dir):
    points, intervals = _sides(spark, sf_dir)
    df = range_join(points, intervals, ["user_id"], "ts",
                    "win_start", "win_end")
    plan = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_time_rollup_matches_per_resolution_aggs(spark, sf_dir):
    """One-shuffle multi-resolution rollup == separate per-resolution
    rollups (and DuckDB agrees on the day level)."""
    from big_data_bowl___2023_spark.operators.aggregates import (
        time_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    rolled = time_rollup(
        ev, "ts", ["hour", "day"], ["event_type"],
        n=F.count(F.lit(1)),
        total=F.sum(F.col("value").cast("decimal(18,2)")).cast("double"))
    got = {(r.resolution, r.bucket, r.event_type): (r.n, round(r.total, 6))
           for r in rolled.collect()}

    for res in ["hour", "day"]:
        single = (ev.groupBy(F.date_trunc(res, "ts").alias("bucket"),
                             "event_type")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum(F.col("value").cast("decimal(18,2)"))
                        .cast("double").alias("total"))).collect()
        for r in single:
            assert got[(res, r.bucket, r.event_type)] == \
                (r.n, round(r.total, 6))
    assert len(got) > 10
