"""E43 — hopping windows: stream/batch parity, every event covered by
exactly width/slide windows, and a DuckDB oracle reconstructing the
overlapping-window fan-out with generate_series."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.sources.io import load_table
from big_data_bowl___2023_spark.streaming import (
    read_event_stream,
    run_available_now,
)
from big_data_bowl___2023_spark.streaming.events import hopping_counts

WIDTH, SLIDE = "1 day", "6 hours"


def test_stream_batch_parity(spark, sf_dir):
    stream_out = run_available_now(
        hopping_counts(read_event_stream(spark, sf_dir), WIDTH, SLIDE),
        spark).collect()
    batch = hopping_counts(load_table(spark, sf_dir, "events"),
                           WIDTH, SLIDE).collect()
    key = lambda r: (r.window_start, r.event_type, r.n)
    assert sorted(map(key, stream_out)) == sorted(map(key, batch))
    assert len(batch) > 0


def test_fanout_and_duckdb_oracle(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = hopping_counts(ev, WIDTH, SLIDE)
    # every event is in exactly 24/6 = 4 windows
    assert (out.agg(F.sum("n")).collect()[0][0]
            == ev.count() * 4)

    got = {(r.window_start, r.event_type, r.n) for r in out.collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW ev AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'")
    # a window starting at s covers s <= ts < s + 1 day, with starts
    # on every 6-hour boundary: fan each event to its 4 covering
    # window starts
    oracle = con.sql("""
        WITH fan AS (
          SELECT event_type,
                 time_bucket(INTERVAL 6 HOUR, CAST(ts AS TIMESTAMP))
                   - g.i * INTERVAL 6 HOUR AS window_start
          FROM ev, (SELECT unnest(range(4)) AS i) g)
        SELECT window_start, event_type, COUNT(*) AS n
        FROM fan GROUP BY 1, 2""").fetchall()
    assert got == {(w, t, n) for w, t, n in oracle}
