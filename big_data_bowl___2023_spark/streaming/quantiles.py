"""Streaming windowed quantiles (t-digest state).

"p50/p99 latency / token-count / quality-score per window,
continuously" — the streaming face of ``operators.quantiles``, and
the distribution member of the streaming-sketch trio
(``streaming.cardinality`` = distincts, ``streaming.trending`` =
heavy keys).

A windowed ``percentile_approx`` would answer one-shot windowed
quantiles, but its sketch never leaves the aggregation — the window's
distribution cannot be persisted, merged across windows, or folded
into a corpus-lifetime artifact. Here each (window, group) owns ONE
bounded t-digest carried across micro-batches via
``applyInPandasWithState`` (the ``streaming.trending`` pattern), and
every emission is a full ``operators.quantiles`` artifact row:
downstream either reads estimates directly (monitoring) or merges
archived window digests into lifetime distributions with
``merge_quantile_summaries`` — without rescanning the stream.

Emissions are UPDATE-mode: a window re-emits its refreshed digest
every micro-batch that touches it, tagged with a monotonically
increasing ``emit_seq``. Because t-digest merge ADDS weights (not
idempotent like HLL union), merging archived emissions must take only
the LATEST emission per (window, group) — :func:`latest_window_
digests` does exactly that; feeding raw emissions to a merge
double-counts every earlier micro-batch.

State is one digest per (window, group): O(compression) centroids,
~KB — bounded per window without eviction, same documented posture as
``streaming.cardinality`` (window count grows with stream lifetime;
at 100 TB/day rates archive-and-restart or widen windows). Tumbling
windows only: each event updates exactly one state key (hopping
windows would need an explode fan-out — compose upstream if needed).
NULL/NaN values are excluded (batch-operator semantics); NULL group
keys are kept (SQL GROUP BY semantics — keyed state hashes the
window, which is never NULL).

Reference scope note: north-star extension (SURVEY.md §2 extensions);
the reference has no streaming surface.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import (
    GroupState,
    GroupStateTimeout,
)

from ..operators.quantiles import _clean_values, _compress

_STATE_SCHEMA = T.StructType([
    T.StructField("means", T.ArrayType(T.DoubleType())),
    T.StructField("weights", T.ArrayType(T.DoubleType())),
    T.StructField("count", T.LongType()),
    T.StructField("min", T.DoubleType()),
    T.StructField("max", T.DoubleType()),
    T.StructField("emit_seq", T.LongType()),
])

_DIGEST_OUT_FIELDS = [
    T.StructField("means", T.ArrayType(T.DoubleType())),
    T.StructField("weights", T.ArrayType(T.DoubleType())),
    T.StructField("count", T.LongType()),
    T.StructField("min", T.DoubleType()),
    T.StructField("max", T.DoubleType()),
    T.StructField("emit_seq", T.LongType()),
]


def windowed_quantile_digests(stream: DataFrame, value_col: str,
                              ts_col: str, window: str,
                              group_cols: Sequence[str] = (),
                              watermark: str | None = None,
                              compression: int = 200) -> DataFrame:
    """(window_start, group_cols..., means, weights, count, min, max,
    emit_seq): one t-digest artifact row per (tumbling window, group)
    per micro-batch that touches it. On a BATCH DataFrame (Spark
    rejects ``applyInPandasWithState`` outside streaming) the same
    result comes from the batch operator grouped by window —
    emit_seq 1 everywhere; the stream/batch parity the tests pin."""
    gcols = list(group_cols)
    win_start = F.window(ts_col, window)["start"].alias(
        "window_start")
    src = stream
    if watermark is not None and stream.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    src = src.select(win_start, *gcols, value_col)
    if not stream.isStreaming:
        from ..operators.quantiles import quantile_summary

        return quantile_summary(src, value_col,
                                ["window_start", *gcols],
                                compression) \
            .withColumn("emit_seq", F.lit(1).cast("long"))
    key_fields = [T.StructField("window_start", T.TimestampType())] \
        + [src.schema[c] for c in gcols]
    out_schema = T.StructType(key_fields + _DIGEST_OUT_FIELDS)

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState):
        if state.exists:
            means, weights, count, vmin, vmax, seq = state.get
            means = np.asarray(means, dtype=float)
            weights = np.asarray(weights, dtype=float)
        else:
            means = np.empty(0)
            weights = np.empty(0)
            count, vmin, vmax, seq = 0, None, None, 0
        fresh = [
            _clean_values(pdf[value_col]) for pdf in pdfs
        ]
        fresh = [v for v in fresh if len(v)]
        if fresh:
            raw = np.concatenate(fresh)
            count += len(raw)
            lo, hi = float(raw.min()), float(raw.max())
            vmin = lo if vmin is None else min(vmin, lo)
            vmax = hi if vmax is None else max(vmax, hi)
            means, weights = _compress(
                np.concatenate([means, raw]),
                np.concatenate([weights, np.ones(len(raw))]),
                compression)
        seq += 1
        state.update((means.tolist(), weights.tolist(), int(count),
                      vmin, vmax, int(seq)))
        row = {c.name: [k] for c, k in zip(key_fields, key)}
        row.update({"means": [means.tolist()],
                    "weights": [weights.tolist()],
                    "count": [int(count)], "min": [vmin],
                    "max": [vmax], "emit_seq": [int(seq)]})
        yield pd.DataFrame(row)

    return (src.groupBy("window_start", *gcols)
            .applyInPandasWithState(update, out_schema,
                                    _STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))


def latest_window_digests(emissions: DataFrame,
                          group_cols: Sequence[str] = ()
                          ) -> DataFrame:
    """The CURRENT digest per (window, group) from archived
    update-mode emissions: max-emit_seq row wins. This is the only
    correct input to a cross-window merge — t-digest weights add, so
    summing every emission would count each micro-batch's rows once
    per later re-emission."""
    from ._emissions import latest_by_emit_seq

    return latest_by_emit_seq(emissions,
                              ["window_start", *group_cols])


def windows_as_quantile_summary(latest: DataFrame,
                                group_cols: Sequence[str] = (),
                                compression: int = 200) -> DataFrame:
    """Fold the latest per-window digests into one
    ``operators.quantiles`` artifact per group (drop the window
    axis): corpus-lifetime distributions from archived window
    emissions, never rescanning the stream. Output schema matches
    ``quantile_summary(df, v, group_cols)``."""
    from ..operators.quantiles import merge_quantile_summaries

    gcols = list(group_cols)
    pruned = latest.select(*gcols, "means", "weights", "count",
                           "min", "max")
    return merge_quantile_summaries(pruned, group_cols=gcols,
                                    compression=compression)
