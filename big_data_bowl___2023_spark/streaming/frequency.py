"""Streaming windowed frequency sketches (count-min state).

"How often is each URL / domain / fingerprint hitting us per window,
continuously — including keys we never declared interesting" — the
streaming face of ``operators.frequency``, completing the
streaming-sketch quartet (``cardinality`` = distincts, ``trending`` =
heavy keys, ``quantiles`` = distributions).

``trending`` keeps a bounded CANDIDATE set (Misra-Gries forgets the
tail by design); this module keeps a bounded COUNTER MATRIX instead,
so any key — heavy or tail — can be point-queried after the fact
with the one-sided guarantee (estimate ≥ true, ≤ true + ε·N w.p.
1−δ). One d×w int64 matrix per (tumbling window, group) rides as
``applyInPandasWithState`` state (~11 KB at the streaming defaults
ε=1e-2/δ=0.05; size with :func:`~..operators.frequency.
cms_parameters`); each micro-batch folds its rows in with the SAME
JVM-hash positions the batch module uses, so a window's final
emission is bit-identical to a batch ``cms_summary`` over the
window's rows (the parity the tests pin).

Emissions are UPDATE-mode sparse artifact rows (the batch module's
(row_idx, col_idx, count, width, depth) schema plus window_start and
``emit_seq``): downstream probes them with ``cms_matrix`` /
``estimate_counts`` directly. Counters ADD on merge, so — exactly as
with the windowed t-digests — archived emissions must pass through
:func:`latest_window_sketches` (max emit_seq per window wins) before
any cross-window fold; :func:`windows_as_cms_summary` then collapses
the window axis into one corpus-lifetime sketch.

State is per-window and never evicted (same documented posture as
the other window-state modules: ~KB per window, archive-and-restart
at extreme window counts). Tumbling windows only. NULL keys are
excluded (batch-module semantics); NULL group keys are kept.

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

from ..dedup.bloom import _hash_cols, _positions
from ..operators.frequency import MAX_CELLS

_STATE_SCHEMA = T.StructType([
    T.StructField("cells", T.ArrayType(T.LongType())),
    T.StructField("emit_seq", T.LongType()),
])

_SKETCH_OUT_FIELDS = [
    T.StructField("row_idx", T.IntegerType()),
    T.StructField("col_idx", T.LongType()),
    T.StructField("count", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("depth", T.IntegerType()),
    T.StructField("emit_seq", T.LongType()),
]


def windowed_cms_sketches(stream: DataFrame, key_col: str,
                          ts_col: str, window: str, width: int,
                          depth: int,
                          group_cols: Sequence[str] = (),
                          watermark: str | None = None) -> DataFrame:
    """(window_start, group_cols..., row_idx, col_idx, count, width,
    depth, emit_seq, key_type): the non-zero cells of each (tumbling
    window, group)'s count-min sketch, re-emitted per micro-batch
    that touches the window. On a BATCH DataFrame the same rows come from
    the batch operator grouped by window (emit_seq 1) — the
    stream/batch parity the tests pin."""
    if width * depth > MAX_CELLS:
        raise ValueError(f"width*depth {width * depth} exceeds "
                         f"{MAX_CELLS}; this matrix rides per-window "
                         f"as stream state — size it DOWN for "
                         f"streaming")
    gcols = list(group_cols)
    if "key_type" in gcols:
        # enforce the batch module's reserved name HERE too: on the
        # streaming path the trailing withColumn would silently
        # overwrite the group column and merge unrelated groups
        raise ValueError("windowed_cms_sketches: 'key_type' is "
                         "reserved for the artifact's own key-type "
                         "record — rename the group column")
    win_start = F.window(ts_col, window)["start"].alias(
        "window_start")
    # the key's Spark type is known at plan time; emissions carry it
    # like the batch artifact so downstream probes can refuse a
    # cross-type use (operators.frequency module docstring)
    key_type = stream.schema[key_col].dataType.simpleString()
    src = stream
    if watermark is not None and stream.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    # the batch module's exact hash columns (same seeds, same JVM
    # function) so window emissions are bit-identical to cms_summary;
    # NULL keys are excluded HERE — xxhash64(NULL) yields the
    # hash-of-nothing constant, not NULL, so filtering the hash
    # would not work
    src = (src.select(win_start, *gcols,
                      F.col(key_col).alias("__k"))
              .filter(F.col("__k").isNotNull()))
    src = _hash_cols(src, "__k").drop("__k")
    if not stream.isStreaming:
        from ..operators.frequency import cms_summary

        # one grouped pass through the batch kernel: same hashing,
        # same cells, NULL-key exclusion and NULL windows/groups
        # handled by the kernel's pandas groupby (dropna=False) —
        # bit-parity with the streaming path by construction
        plain = stream.select(win_start, *gcols, key_col)
        return cms_summary(plain, key_col, width, depth,
                           group_cols=["window_start", *gcols]) \
            .withColumn("emit_seq", F.lit(1).cast("long")) \
            .select("window_start", *gcols, "row_idx", "col_idx",
                    "count", "width", "depth", "emit_seq",
                    "key_type")

    key_fields = [T.StructField("window_start", T.TimestampType())] \
        + [src.schema[c] for c in gcols]
    out_schema = T.StructType(key_fields + _SKETCH_OUT_FIELDS)

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState):
        if state.exists:
            flat, seq = state.get
            cells = np.asarray(flat, dtype=np.int64) \
                .reshape(depth, width)
        else:
            cells = np.zeros((depth, width), dtype=np.int64)
            seq = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            h1 = pdf["__h1"].to_numpy()
            h2 = pdf["__h2"].to_numpy()
            for i, pos in enumerate(_positions(h1, h2, width,
                                               depth)):
                np.add.at(cells[i], pos,
                          np.ones(len(pos), dtype=np.int64))
        seq += 1
        state.update((cells.ravel().tolist(), int(seq)))
        r, c = np.nonzero(cells)
        if len(r) == 0:                    # emit an anchor cell
            r = np.array([0])
            c = np.array([0])
        row = {f.name: [k] * len(r)
               for f, k in zip(key_fields, key)}
        row.update({
            "row_idx": pd.array(r, dtype="int32"),
            "col_idx": pd.array(c, dtype="int64"),
            "count": pd.array(cells[r, c], dtype="int64"),
            "width": pd.array([width] * len(r), dtype="int64"),
            "depth": pd.array([depth] * len(r), dtype="int32"),
            "emit_seq": pd.array([seq] * len(r), dtype="int64"),
        })
        yield pd.DataFrame(row)

    return (src.groupBy("window_start", *gcols)
            .applyInPandasWithState(update, out_schema,
                                    _STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout)
            .withColumn("key_type", F.lit(key_type)))


def latest_window_sketches(emissions: DataFrame,
                           group_cols: Sequence[str] = ()
                           ) -> DataFrame:
    """The CURRENT sketch cells per (window, group) from archived
    update-mode emissions (max emit_seq wins) — the double-count
    guard before any cross-window fold, counters being additive."""
    from ._emissions import latest_by_emit_seq

    return latest_by_emit_seq(emissions,
                              ["window_start", *group_cols])


def windows_as_cms_summary(latest: DataFrame,
                           group_cols: Sequence[str] = ()
                           ) -> DataFrame:
    """Collapse the window axis of latest-per-window sketch rows into
    one ``operators.frequency`` artifact PER GROUP (corpus-lifetime
    key frequencies from archived window emissions, stream never
    rescanned) — pass the same ``group_cols`` the stream used, or
    groups would silently sum into one sketch. Ungrouped output
    probes with ``estimate_counts`` directly; grouped output is one
    sketch per group (filter to a group before densifying —
    ``cms_matrix`` enforces this)."""
    from ..operators.frequency import merge_cms

    gcols = list(group_cols)
    # key_type rides along when the emissions carry it (archives
    # written before the column existed stay legacy-untyped)
    kt = ["key_type"] if "key_type" in latest.columns else []
    pruned = latest.select(*gcols, "row_idx", "col_idx", "count",
                           "width", "depth", *kt)
    if not gcols:
        return merge_cms(pruned)
    return (pruned
            .groupBy(*gcols, "row_idx", "col_idx", "width", "depth",
                     *kt)
            .agg(F.sum("count").alias("count"))
            .select(*gcols, "row_idx", "col_idx", "count", "width",
                    "depth", *kt))