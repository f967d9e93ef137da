"""Streaming windowed uniform samples (bottom-k state).

"Show me representative examples from the last hour, continuously" —
the streaming face of ``operators.bottomk``, and the INSPECTABLE
member of the streaming-sketch family (the others emit aggregates;
this one emits actual keys + payloads).

Each (tumbling window, group) owns a bounded bottom-k sample carried
across micro-batches as ``applyInPandasWithState`` state: the k
distinct keys with the smallest ``xxhash64(seed, key)`` seen in the
window so far, each with the least payload tuple observed. Because
the hash is a pure function of the key, the state update is
IDEMPOTENT and the final window emission is EXACTLY the batch
``bottomk_summary`` over the window's rows (bit-parity pinned) — a
monitoring dashboard samples the live window, and archived window
emissions merge downstream with ``merge_bottomk`` (idempotent, so no
latest-per-window guard is NEEDED for correctness — but
:func:`latest_window_samples` still prunes superseded emissions so
archives don't hold every intermediate).

State is k rows per window (~KB); window count grows with stream
lifetime (the family's documented posture). Tumbling windows only.
NULL keys are excluded (batch semantics); NULL group keys are kept.

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

from ..operators.bottomk import HASH_COL, MAX_K


def windowed_samples(stream: DataFrame, key_col: str, ts_col: str,
                     window: str, k: int,
                     group_cols: Sequence[str] = (),
                     payload_cols: Sequence[str] = (),
                     seed: int = 0,
                     watermark: str | None = None) -> DataFrame:
    """(window_start, group_cols..., key_col, kmv_hash,
    payload_cols..., kmv_k, kmv_seed, emit_seq): each (tumbling
    window, group)'s current bottom-k sample rows, re-emitted per
    touching micro-batch. On a BATCH DataFrame the same rows come
    from ``bottomk_summary`` grouped by window (emit_seq 1) — the
    parity the tests pin."""
    if not (0 < k <= MAX_K):
        raise ValueError(f"k must be in (0, {MAX_K}], got {k}")
    gcols = list(group_cols)
    pcols = list(payload_cols)
    # same collision contract on BOTH branches (the batch fallback
    # inherits bottomk_summary's check; the streaming path must not
    # silently overwrite a user column with its bookkeeping)
    reserved = {HASH_COL, "kmv_k", "kmv_seed", "window_start",
                "emit_seq"}
    clash = (reserved | {key_col}) & set(pcols) | \
        (reserved & set(gcols + [key_col]))
    if clash:
        raise ValueError(f"column collision {clash}: payload must "
                         f"not repeat the key, and "
                         f"{sorted(reserved)} are reserved")
    win_start = F.window(ts_col, window)["start"].alias(
        "window_start")
    if not stream.isStreaming:
        from ..operators.bottomk import bottomk_summary

        plain = stream.select(win_start, *gcols, key_col, *pcols)
        return bottomk_summary(plain, key_col, k,
                               group_cols=["window_start", *gcols],
                               payload_cols=pcols, seed=seed) \
            .withColumn("emit_seq", F.lit(1).cast("long"))

    src = stream
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    src = (src.select(win_start, *gcols, key_col, *pcols)
              .filter(F.col(key_col).isNotNull())
              .withColumn(HASH_COL,
                          F.xxhash64(F.lit(seed), F.col(key_col))))
    key_fields = [T.StructField("window_start", T.TimestampType())] \
        + [src.schema[c] for c in gcols]
    sample_fields = [src.schema[key_col],
                     T.StructField(HASH_COL, T.LongType())] \
        + [src.schema[c] for c in pcols]
    out_schema = T.StructType(
        key_fields + sample_fields
        + [T.StructField("kmv_k", T.IntegerType()),
           T.StructField("kmv_seed", T.LongType()),
           T.StructField("emit_seq", T.LongType())])
    # state carries the sample COLUMNS as typed arrays (JSON/string
    # encodings would corrupt int64 hashes past 2^53)
    sample_cols = [key_col, HASH_COL, *pcols]
    state_schema = T.StructType(
        [T.StructField(f"c{i}", T.ArrayType(f.dataType))
         for i, f in enumerate(sample_fields)]
        + [T.StructField("emit_seq", T.LongType())])
    sort_cols = [HASH_COL, key_col, *pcols]
    int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

    def norm_lists(cur: pd.DataFrame) -> list:
        """Per-column Python lists with NaN→None and integral types
        restored: a NULL in an int payload turns the pandas column
        float64 (NaN), which Arrow refuses to pack back into the
        integer state/output fields. The batch operator supports NULL
        payloads, so the stream must too."""
        out = []
        for name, field in zip(sample_cols, sample_fields):
            vals = []
            for v in cur[name]:
                if pd.isna(v):
                    vals.append(None)
                elif isinstance(field.dataType, int_types):
                    vals.append(int(v))
                else:
                    vals.append(v)
            out.append(vals)
        return out

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState):
        if state.exists:
            *arrays, seq = state.get
            cur = pd.DataFrame(dict(zip(sample_cols, arrays)))
        else:
            cur, seq = None, 0
        frames = ([cur] if cur is not None else []) \
            + [pdf[sample_cols] for pdf in pdfs if len(pdf)]
        if frames:
            allr = pd.concat(frames, ignore_index=True)
            # same determinism rule as the batch partial phase:
            # NULLS FIRST payload tie-break, dedup by key, head(k)
            allr = allr.sort_values(sort_cols, kind="mergesort",
                                    na_position="first")
            allr = allr.drop_duplicates(subset=[key_col],
                                        keep="first").head(k)
            cur = allr.reset_index(drop=True)
        seq += 1
        lists = norm_lists(cur)
        cur = pd.DataFrame(
            {c: pd.Series(v, dtype=object)
             for c, v in zip(sample_cols, lists)})
        state.update((*lists, int(seq)))
        row = cur.copy()
        for f, v in reversed(list(zip(key_fields, key))):
            row.insert(0, f.name, [v] * len(row))
        row["kmv_k"] = np.full(len(row), k, dtype=np.int32)
        row["kmv_seed"] = np.full(len(row), seed, dtype=np.int64)
        row["emit_seq"] = np.full(len(row), seq, dtype=np.int64)
        yield row

    return (src.groupBy("window_start", *gcols)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


def latest_window_samples(emissions: DataFrame,
                          group_cols: Sequence[str] = ()
                          ) -> DataFrame:
    """The CURRENT sample per (window, group) from archived
    update-mode emissions (max emit_seq wins). Not required for
    correctness — bottom-k merges are idempotent — but pruning
    superseded emissions keeps archives and downstream merges
    small."""
    from ._emissions import latest_by_emit_seq

    return latest_by_emit_seq(emissions,
                              ["window_start", *group_cols])


def windows_as_sample(latest: DataFrame, key_col: str, k: int,
                      group_cols: Sequence[str] = (),
                      payload_cols: Sequence[str] = ()
                      ) -> DataFrame:
    """Fold per-window samples into one corpus-lifetime
    ``operators.bottomk`` artifact per group (drop the window axis):
    a uniform sample over the stream's whole history, stream never
    rescanned. Accepts raw emissions too (idempotent merge), but
    feed :func:`latest_window_samples` output to keep the fold
    small."""
    from ..operators.bottomk import merge_bottomk

    gcols = list(group_cols)
    pruned = latest.select(*gcols, key_col, HASH_COL, *payload_cols,
                           "kmv_k", "kmv_seed")
    return merge_bottomk(pruned, key_col=key_col, k=k,
                         group_cols=gcols,
                         payload_cols=list(payload_cols))
