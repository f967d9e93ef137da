"""Batch sessionization + cohort retention (operators/sessions.py):
hand-built session boundaries, DuckDB oracle parity on the real
events table, single-shuffle plan, and retention-matrix invariants."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb

from big_data_bowl___2023_spark.operators.sessions import (
    cohort_retention,
    session_stats,
    sessionize,
)
from big_data_bowl___2023_spark.sources.io import load_table


def _fixture(spark):
    t = datetime
    rows = [
        # user 1: two sessions (40-min gap between event 3 and 4)
        (1, t(2024, 1, 1, 10, 0), 1),
        (2, t(2024, 1, 1, 10, 10), 1),
        (3, t(2024, 1, 1, 10, 20), 1),
        (4, t(2024, 1, 1, 11, 0), 1),
        # user 2: one session
        (5, t(2024, 1, 1, 9, 0), 2),
        (6, t(2024, 1, 1, 9, 29), 2),
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id"])


def test_sessionize_hand_fixture(spark):
    out = {r.event_id: (r.session_idx, r.session_id)
           for r in sessionize(_fixture(spark), 30).collect()}
    assert out[1] == (1, "1-1") and out[2] == (1, "1-1")
    assert out[3] == (1, "1-1")
    assert out[4] == (2, "1-2")          # 40 min > 30 min gap
    assert out[5] == (1, "2-1") and out[6] == (1, "2-1")


def test_session_stats_hand_fixture(spark):
    stats = {(r.user_id, r.session_idx): (r.n_events, r.duration_s)
             for r in session_stats(_fixture(spark), 30).collect()}
    assert stats[(1, 1)] == (3, 1200)
    assert stats[(1, 2)] == (1, 0)
    assert stats[(2, 1)] == (2, 29 * 60)


def test_sessionize_single_shuffle(spark, sf_dir):
    """Gap flag + running index share one window partition: exactly
    one shuffle exchange in the whole plan."""
    import re

    from big_data_bowl___2023_spark.plans.explain import formatted_plan

    ev = load_table(spark, sf_dir, "events")
    plan = formatted_plan(sessionize(ev, 30))
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1


def test_sessionize_matches_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {r.event_id: r.session_idx
           for r in sessionize(ev, 30).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    ref = dict(con.execute("""
        WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                           user_id FROM events),
        flags AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN LAG(ts) OVER w IS NULL
                      OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                      THEN 1 ELSE 0 END AS new_s
          FROM ev WINDOW w AS (PARTITION BY user_id
                               ORDER BY ts, event_id))
        SELECT event_id,
               SUM(new_s) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS session_idx
        FROM flags""").fetchall())
    assert got == ref


def test_cohort_retention_matches_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {(str(r.cohort)[:10], r.period_offset): r.n_users
           for r in cohort_retention(ev, "week").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    ref = {(str(c)[:10], o): n for c, o, n in con.execute("""
        WITH ev AS (SELECT user_id,
                           date_trunc('week', CAST(ts AS TIMESTAMP))
                             AS p FROM events),
        coh AS (SELECT user_id, p,
                       MIN(p) OVER (PARTITION BY user_id) AS cohort
                FROM ev)
        SELECT cohort,
               CAST((epoch(p) - epoch(cohort)) / (7*86400) AS BIGINT)
                 AS period_offset,
               COUNT(DISTINCT user_id) AS n_users
        FROM coh GROUP BY 1, 2""").fetchall()}
    assert got == ref
    # offset-0 row exists for every cohort (every user is active in
    # their own first period by construction)
    cohorts = {c for c, _ in got}
    assert all((c, 0) in got for c in cohorts)


def test_rolling_counts_matches_duckdb(spark, sf_dir):
    from big_data_bowl___2023_spark.operators.sessions import (
        rolling_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    got = {r.event_id: (r.n_in_window, r.value_in_window)
           for r in rolling_counts(
               ev, 60, value_col="value",
               value_type="decimal(18,2)").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    ref = {e: (n, v) for e, n, v in con.execute("""
        WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                           user_id, value FROM events)
        SELECT event_id,
               COUNT(*) OVER w AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w
                    AS DOUBLE) AS v
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                     RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        """).fetchall()}
    assert got == ref


def test_rolling_counts_hand_fixture(spark):
    from big_data_bowl___2023_spark.operators.sessions import (
        rolling_counts,
    )

    base = datetime(2024, 1, 1, 12, 0)
    rows = [(1, base, 1), (2, base + timedelta(minutes=30), 1),
            (3, base + timedelta(minutes=59), 1),
            (4, base + timedelta(minutes=120), 1)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    got = {r.event_id: r.n_in_window
           for r in rolling_counts(df, 60).collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 1}


def test_rolling_counts_subsecond_ties(spark):
    """Granularity contract: the RANGE frame keys on whole seconds, so
    events inside the same second count each other regardless of
    sub-second order, and the window boundary is second-aligned."""
    from big_data_bowl___2023_spark.operators.sessions import (
        rolling_counts,
    )

    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # two events in the same second, microseconds apart
        (1, base.replace(microsecond=100), 1),
        (2, base.replace(microsecond=900000), 1),
        # 59m59s later: inside a 60-min trailing window of both
        (3, base + timedelta(minutes=59, seconds=59), 1),
        # 60m00s later: the second-aligned frame (3599s preceding)
        # excludes the base-second events
        (4, base + timedelta(minutes=60), 1),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    got = {r.event_id: r.n_in_window
           for r in rolling_counts(df, 60).collect()}
    # 1 and 2 share a second: both see both (sub-second order ignored)
    assert got[1] == 2 and got[2] == 2
    assert got[3] == 3
    assert got[4] == 2          # events 3 and 4 only


def test_rolling_counts_sum_precision_default(spark):
    """Default value_type=None sums at the column's own type — no
    silent 2-dp rounding, no decimal-overflow-to-NULL."""
    from big_data_bowl___2023_spark.operators.sessions import (
        rolling_counts,
    )

    base = datetime(2024, 1, 1, 12, 0)
    rows = [(1, base, 1, 0.001), (2, base + timedelta(minutes=1), 1, 0.002),
            (3, base + timedelta(minutes=2), 1, 1e16)]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "value"])
    got = {r.event_id: r.value_in_window
           for r in rolling_counts(df, 60, value_col="value").collect()}
    assert abs(got[2] - 0.003) < 1e-12      # not rounded away
    assert got[3] == 1e16 + 0.003           # not NULL-skipped


def test_cohort_retention_dst_safe_offsets(spark):
    """Calendar (datediff) offsets: a week spanning a fall-back DST
    transition still lands on offset 1 under a DST session timezone
    (the epoch-seconds formulation would truncate 604800+3600 s to
    offset 1 only by luck of the division direction — spring-forward
    weeks are 601200 s and would floor to 0)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone",
                   "America/New_York")
    try:
        rows = [
            # US spring-forward 2024-03-10: week of Mar 4 -> week of
            # Mar 11 is 604800-3600 s in local wall time
            (1, datetime(2024, 3, 5, 10, 0)),
            (1, datetime(2024, 3, 12, 10, 0)),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts"])
        got = {r.period_offset: r.n_users
               for r in cohort_retention(df, "week").collect()}
        assert got == {0: 1, 1: 1}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
