"""Batch event-stream analytics: sessionization and cohort retention.

The streaming layer already sessionizes with ``session_window``
(streaming/events.py); these are the BATCH counterparts every
event-analytics user expects — assign a stable session id to each
event row (so sessions can be joined, sampled, exported), summarize
sessions, and build the cohort-retention matrix.

Reference lineage: the reference delimits plays by scanning ordered
event sequences per (game, play) — ball_snap opens, pass_forward
closes (Main Body Exploration.R:21-30). ``sessionize`` is that same
ordered-scan shape generalized from a fixed open/close vocabulary to
a time-gap rule.

Scale shape: one window partition (entity, ordered by time) does both
the gap flag and the running session index — ONE shuffle on the
entity key, no self-join, no join-back. Cohort retention adds one
aggregation shuffle on (cohort, offset). Entity skew (one user with
millions of events) is bounded by the per-entity row count, the same
contract as every per-entity window in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """Events + (session_idx, session_id): a new session starts at an
    entity's first event and whenever the gap since the previous
    event is > ``gap_minutes``. Both window expressions share one
    (user, ts, id)-ordered partition — a single shuffle; the unique
    id tie-break makes equal-timestamp ordering deterministic."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_s = gap_minutes * 60
    prev = F.lag(F.col(ts_col)).over(w)
    new_s = (prev.isNull()
             | ((F.unix_timestamp(F.col(ts_col))
                 - F.unix_timestamp(prev)) > gap_s))
    return (events
            .withColumn("session_idx",
                        F.sum(new_s.cast("long")).over(
                            w.rowsBetween(Window.unboundedPreceding, 0)))
            .withColumn("session_id",
                        F.concat_ws("-", F.col(user_col).cast("string"),
                                    F.col("session_idx").cast("string"))))


def session_stats(events: DataFrame, gap_minutes: int = 30,
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id") -> DataFrame:
    """One row per session: bounds, duration, event count. The
    groupBy key extends the sessionize window's partition key, so
    with matching partitioning the aggregation reuses locality."""
    s = sessionize(events, gap_minutes, user_col, ts_col, id_col)
    return (s.groupBy(user_col, "session_idx")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 (F.unix_timestamp(F.max(ts_col))
                  - F.unix_timestamp(F.min(ts_col)))
                 .alias("duration_s"),
                 F.count(F.lit(1)).alias("n_events")))


def cohort_retention(events: DataFrame, period: str = "week",
                     user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """(cohort, period_offset, n_users): how many of the users whose
    FIRST activity fell in ``cohort`` were active again
    ``period_offset`` periods later — the retention matrix.

    The cohort assignment is a min-over-user window (shares the
    aggregation's user partitioning, no join-back), then one
    distinct-count aggregation on (cohort, offset).

    The offset is CALENDAR arithmetic (``datediff`` of the truncated
    periods over whole days), not epoch-seconds division — so a week
    containing a DST transition (604800±3600 s) still lands on the
    right offset under any session timezone."""
    per = F.date_trunc(period, F.col(ts_col))
    w = Window.partitionBy(user_col)
    days = {"week": 7, "day": 1}
    if period not in days:
        raise ValueError(f"period must be one of {sorted(days)}")
    with_cohort = (events
                   .select(F.col(user_col), per.alias("__p"))
                   .withColumn("__cohort", F.min("__p").over(w)))
    offset = F.floor(
        F.datediff(F.col("__p"), F.col("__cohort")) / days[period])
    return (with_cohort
            .select(F.col("__cohort").alias("cohort"),
                    offset.alias("period_offset"),
                    F.col(user_col))
            .groupBy("cohort", "period_offset")
            .agg(F.countDistinct(user_col).alias("n_users")))


def rolling_counts(events: DataFrame, window_minutes: int = 60,
                   user_col: str = "user_id", ts_col: str = "ts",
                   value_col: str | None = None,
                   value_type: str | None = None) -> DataFrame:
    """Events + trailing-window activity: for every event, how many
    of the same entity's events (and optionally how much value) fell
    in the preceding ``window_minutes`` including this one — the
    batch counterpart of the streaming hopping windows, at per-event
    grain (rate limiting, burst detection, velocity features).

    A RANGE frame over unix seconds: one shuffle on the entity key,
    state bounded by the frame — no self-join, no explode to
    per-window rows.

    Granularity contract: the frame key is ``unix_timestamp`` —
    WHOLE-SECOND resolution. Events in the same second are mutually
    "within the window" regardless of sub-second order (events.ts
    carries microseconds; they are intentionally ignored — the frame
    boundary is second-aligned). Fine for minutes-scale windows; a
    sub-second window would need an epoch-micros ordering key.

    ``value_type``: optional cast applied to ``value_col`` before the
    windowed sum. Default (None) sums at the column's own type —
    doubles stay doubles, full precision. Pass e.g.
    ``"decimal(18,2)"`` for money semantics (2-dp rounding,
    order-insensitive exact addition); note a decimal cast silently
    rounds to its scale and values beyond its precision overflow to
    NULL, which the sum then skips."""
    w = (Window.partitionBy(user_col)
         .orderBy(F.unix_timestamp(F.col(ts_col)))
         .rangeBetween(-(window_minutes * 60 - 1), 0))
    out = events.withColumn("n_in_window",
                            F.count(F.lit(1)).over(w))
    if value_col is not None:
        v = F.col(value_col)
        if value_type is not None:
            v = v.cast(value_type)
        out = out.withColumn(
            "value_in_window", F.sum(v).over(w).cast("double"))
    return out
