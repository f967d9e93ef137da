"""Driver-checked queries for the window-function surface (SURVEY.md
§2.5 W1–W4) on the ``events`` time-series table (user_id ≈ player,
ts ≈ frame clock — FIXTURES.md §B mapping).

All windows partition by ``user_id`` and order by ``(ts, event_id)`` —
the unique tie-breaker makes every result deterministic under any
partitioning (SURVEY §4.3.5). The reference instead globally sorts and
lags across group boundaries (DLC:37 + MBE:47-50, divergence documented
in operators.windows).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import windows as win
from ..registry import query
from ._util import EVENTS_CTE, load_table, r6

_ORDER = """PARTITION BY user_id ORDER BY ts, event_id"""


def _w():
    return win.ordered_window(["user_id"], ["ts", "event_id"])


# Registry curation (round 2): w2_second_difference and
# w1_gap_seconds were folded into w1_lag_delta — all three share one
# window spec, so the merged query is STILL one shuffle + one sorted
# scan, and every lag column keeps its own driver-checked values.

@query(
    "w1_lag_delta",
    f"""{EVENTS_CTE}
        SELECT event_id, user_id,
               ROUND(d, 6) AS value_delta,
               (EPOCH_US(ts) - LAG(EPOCH_US(ts), 1) OVER ({_ORDER}))
                   / 1000000.0 AS gap_seconds,
               (d > LAG(d, 1) OVER ({_ORDER})) AND (d > 0) AS rising
        FROM (SELECT *, value - LAG(value, 1) OVER ({_ORDER}) AS d
              FROM ev)""",
)
def w1_lag_delta(spark, sf_dir):
    """W1 + W2 on one ordered window: LAG(1) value delta (discrete
    acceleration ``a_direction = s - lag(s)``, MBE:47-49), the
    inter-event gap in exact integer microseconds ÷ 1e6 (the 10 Hz
    frame-delta arithmetic MBE:99 on real timestamps), and the
    lag-of-lag "speed rising again" detector ``a_dir > lag(a_dir) &
    a_dir > 0`` (MBE:50). All three columns share one window spec —
    one shuffle, one sorted scan; NULL on each partition's first
    rows."""
    ev = load_table(spark, sf_dir, "events")
    w = _w()
    out = win.lag_delta(ev, "value", w, "d")
    out = win.second_difference_rising(out, "d", w, "rising")
    us = F.unix_micros(F.col("ts"))
    return out.select(
        "event_id", "user_id",
        r6(F.col("d")).alias("value_delta"),
        ((us - F.lag(us, 1).over(w)) / F.lit(1000000.0))
            .alias("gap_seconds"),
        "rising")


@query(
    "w3_first_per_group",
    f"""{EVENTS_CTE}
        SELECT event_id, user_id, ts, event_type FROM (
            SELECT *, ROW_NUMBER() OVER ({_ORDER}) AS rn FROM ev
        ) WHERE rn = 1""",
)
def w3_first_per_group(spark, sf_dir):
    """W3: first-event-per-group — pressure start / drop start / set
    point detection (MBE:39, 52, 85-86). row_number over the ordered
    window: single pass, no groupBy-min + join-back."""
    ev = load_table(spark, sf_dir, "events")
    out = win.first_per_group(ev, ["user_id"], ["ts", "event_id"])
    return out.select("event_id", "user_id", "ts", "event_type")


@query(
    "w4_running_sum",
    f"""{EVENTS_CTE}
        SELECT event_id, user_id,
               ROUND(SUM(value) OVER ({_ORDER}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                   AS running_value
        FROM ev""",
)
def w4_running_sum(spark, sf_dir):
    """Engine extension (SURVEY §2.5 notes rank/frames absent in the
    reference): cumulative sum over the ordered event stream. The
    prefix-sum order is fully determined by the unique ordering, so
    doubles match the oracle bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    out = win.running(ev, F.sum("value"), _w(), "running_value")
    return out.select("event_id", "user_id",
                      r6(F.col("running_value")).alias("running_value"))


