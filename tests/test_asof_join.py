"""As-of join verified against DuckDB's native ASOF JOIN (the oracle
engine implements the operator natively — the strongest available
cross-check for an operator Spark lacks)."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.asof import asof_join
from big_data_bowl___2023_spark.sources.io import load_table


def _sides(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"))
    # Dedup right per (user, ts) so the as-of match is well-defined
    # under timestamp ties (both engines then agree deterministically).
    right = (ev.filter(F.col("event_type") == "click")
             .groupBy("user_id", "ts")
             .agg(F.max("value").alias("click_value")))
    return left, right


def test_asof_join_matches_duckdb(spark, sf_dir):
    left, right = _sides(spark, sf_dir)
    got = asof_join(left, right, ["user_id"], "ts").collect()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    ref = con.execute("""
        WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                           user_id, event_type, value FROM events),
        l AS (SELECT user_id, ts, event_id AS purchase_id FROM ev
              WHERE event_type = 'purchase'),
        r AS (SELECT user_id, ts, MAX(value) AS click_value FROM ev
              WHERE event_type = 'click' GROUP BY user_id, ts)
        SELECT l.user_id, l.ts, l.purchase_id,
               r.click_value, r.ts AS matched_ts
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """).fetchall()

    norm = lambda rows: sorted(
        (r[0], r[1], r[2],
         None if r[3] is None else round(r[3], 6), r[4])
        for r in rows)
    got_rows = [(r.user_id, r.ts, r.purchase_id,
                 r.click_value_asof, r.matched_ts) for r in got]
    assert norm(got_rows) == norm(ref)


def test_asof_tolerance_nulls_stale_matches(spark, sf_dir):
    left, right = _sides(spark, sf_dir)
    loose = asof_join(left, right, ["user_id"], "ts")
    tight = asof_join(left, right, ["user_id"], "ts",
                      tolerance_seconds=60.0)
    n_loose = loose.filter(F.col("matched_ts").isNotNull()).count()
    n_tight = tight.filter(F.col("matched_ts").isNotNull()).count()
    assert n_tight <= n_loose
    # every surviving match is within tolerance
    gaps = tight.filter(F.col("matched_ts").isNotNull()).select(
        ((F.unix_micros("ts") - F.unix_micros("matched_ts")) / 1e6)
        .alias("gap")).collect()
    assert all(0 <= r.gap <= 60.0 for r in gaps)
