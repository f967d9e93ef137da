"""Streaming distinct-count monitoring (windowed HLL sketches).

"Distinct users / URLs / documents per window, continuously" — the
streaming face of ``operators.cardinality``. ``COUNT(DISTINCT)`` is
not incrementally maintainable as raw state (the distinct-key set is
unbounded), but an HLL sketch is: Spark's ``hll_sketch_agg`` is a
declarative aggregate, so a watermarked windowed groupBy carries one
bounded (~KB) sketch per (window, group) as streaming state — no
custom stateful operator needed, and the same update-mode/watermark
semantics as every other windowed aggregation in
``streaming.events``.

The emitted rows carry BOTH the estimate (monitoring reads it
directly) and the sketch bytes: persisted per-window sketches merge
across windows — or across days of archived emissions — via
``operators.cardinality.merge_cardinality(emissions,
group_cols=())``, giving corpus-lifetime distinct counts without
rescanning the stream (``group_cols`` must be explicit here: the
emissions carry window/estimate columns that are NOT group keys).
NULL keys are ignored (SQL COUNT(DISTINCT) semantics), same as the
batch operator.

Reference scope note: north-star extension (SURVEY.md §2 extensions);
the reference has no streaming surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_distinct_counts(stream: DataFrame, key_col: str,
                             ts_col: str, window: str,
                             slide: str | None = None,
                             group_cols: Sequence[str] = (),
                             watermark: str | None = None,
                             lg_config_k: int = 12) -> DataFrame:
    """(window, group_cols..., distinct_estimate, sketch): one HLL
    sketch + estimate per (window, group) per emission. ``slide``
    makes the windows hopping (``None`` = tumbling); ``watermark``
    (e.g. ``"10 minutes"``) bounds state by closing windows past the
    lateness horizon — without it, complete/update mode keeps every
    window's sketch forever (each is ~KB, so even that is often
    acceptable for coarse windows; set the watermark anyway at
    100 TB/day rates). Works identically on a batch DataFrame — the
    parity the tests pin."""
    gcols = list(group_cols)
    src = stream
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    win = (F.window(ts_col, window, slide) if slide
           else F.window(ts_col, window))
    return (src.groupBy(win.alias("window"), *gcols)
            .agg(F.hll_sketch_agg(key_col, lg_config_k)
                 .alias("sketch"))
            .select("window", *gcols,
                    F.hll_sketch_estimate("sketch")
                    .alias("distinct_estimate"),
                    "sketch"))
