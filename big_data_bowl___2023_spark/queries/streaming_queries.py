"""Driver-checked Structured Streaming queries (SURVEY.md §2.9).

Each runs the streaming plan to completion with an ``availableNow``
trigger into a memory sink — processing exactly the data a batch query
would see — so the DuckDB batch SQL is an exact oracle. This is the
strongest correctness statement a one-shot check can make about a
streaming operator: stream/batch parity.
"""

from __future__ import annotations

from ..registry import query
from ..streaming import (
    read_event_stream,
    run_available_now,
    session_windows,
    tumbling_counts,
)
from ._util import EVENTS_CTE


@query(
    "stream_tumbling_counts",
    f"""{EVENTS_CTE}
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS window_start,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_value
        FROM ev GROUP BY 1, 2""",
)
def stream_tumbling_counts(spark, sf_dir):
    """Tumbling 1-day windows per event type, executed as a stream
    (streaming.events.tumbling_counts). Day-aligned windows start at
    day boundaries, so the oracle is a date_trunc rollup."""
    stream = read_event_stream(spark, sf_dir)
    return run_available_now(tumbling_counts(stream, "1 day"), spark)


@query(
    "stream_session_windows",
    f"""{EVENTS_CTE},
        flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN ts - LAG(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                      >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
          FROM ev),
        sessions AS (
          SELECT user_id, ts, event_id,
                 SUM(brk) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess
          FROM flagged)
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events,
               MIN(event_id) AS first_event_id
        FROM sessions GROUP BY user_id, sess""",
)
def stream_session_windows(spark, sf_dir):
    """Per-user session windows (30 min gap) as a stream — the
    reference's per-play event-sequence state machine (MBE:22-30)
    generalized. Oracle re-derives sessions with the lag/cumsum break
    construction; Spark merges events strictly closer than the gap, so
    the break condition is diff >= gap."""
    stream = read_event_stream(spark, sf_dir)
    return run_available_now(session_windows(stream, "30 minutes"),
                             spark)
