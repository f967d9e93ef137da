"""Streaming heavy hitters — trending keys over an unbounded stream.

The batch operator (``operators.heavy``) answers "which keys dominate
this corpus"; this one answers it CONTINUOUSLY — trending domains /
hashtags / user agents over an event stream — with the same
Misra-Gries machinery and the same hard guarantee, carried across
micro-batches as keyed state.

Shape: keys hash into ``n_buckets`` buckets (``pmod(xxhash64)``), and
each bucket owns ONE bounded MG summary updated per micro-batch via
``applyInPandasWithState``. A key lives in exactly one bucket, so the
bucket summary sees that key's FULL stream and the classic bound
applies per bucket: a key absent from its bucket's summary has true
count ≤ bucket_rows/(capacity+1). Any key with global count above
``max_b bucket_rows_b / (capacity+1)`` — roughly n/(B·(c+1)) under
even hashing, TIGHTER than the batch union bound — is guaranteed
present. State is ≤ capacity (key, count) entries per bucket
regardless of stream length: bounded without a watermark, because MG
compaction IS the eviction policy.

Each micro-batch emits the bucket's refreshed summary (update mode):
(bucket, key, lower_bound, bucket_rows). Downstream either reads the
candidates directly (monitoring) or exact-recounts them against the
archived stream with ``operators.heavy.heavy_hitters``-style
verification — the emitted set is a guaranteed superset of the
phi-heavy keys, tested against exact counts.

NULL keys are dropped (a trending query over NULL is meaningless and
keyed state can't hash it); the batch operator keeps SQL NULL-group
semantics where they matter.

Reference scope note: north-star extension (SURVEY.md §2 extensions);
the reference has no streaming surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.heavy import _mg_merge

_HH_OUT = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("key", T.StringType()),
    T.StructField("lower_bound", T.LongType()),
    T.StructField("bucket_rows", T.LongType()),
])

_HH_STATE = T.StructType([
    T.StructField("keys", T.ArrayType(T.StringType())),
    T.StructField("counts", T.ArrayType(T.LongType())),
    T.StructField("rows_seen", T.LongType()),
])


def streaming_heavy_hitters(stream: DataFrame, key_col: str,
                            capacity: int,
                            n_buckets: int = 32) -> DataFrame:
    """(bucket, key, lower_bound, bucket_rows) per micro-batch: each
    bucket's current MG summary. ``capacity`` per bucket bounds both
    state and the absent-key count (see module docstring); size it
    with ``operators.heavy.mg_capacity`` against the target frequency
    ratio. Keys are tracked as strings (state schema is fixed)."""
    import pandas as pd

    keyed = (stream
             .select(F.col(key_col).cast("string").alias("k"))
             .filter(F.col("k").isNotNull())
             .withColumn("bucket",
                         F.pmod(F.xxhash64("k"),
                                F.lit(n_buckets)).cast("int")))

    def update(key, pdfs, state):
        (bucket,) = key
        if state.exists:
            keys, counts, rows = state.get
            mg = dict(zip(keys, counts))
        else:
            mg, rows = {}, 0
        for pdf in pdfs:
            rows += len(pdf)
            vc = pdf["k"].value_counts()
            if len(vc):
                _mg_merge(mg, vc, capacity)
        state.update((list(mg.keys()),
                      [int(v) for v in mg.values()], rows))
        keys = list(mg.keys())
        lbs = [int(v) for v in mg.values()]
        if not keys:
            # an all-singleton bucket legitimately compacts to an
            # EMPTY summary (no key above bucket_rows/(c+1)); emit a
            # NULL-key marker so the bucket's row accounting is still
            # visible downstream (same move as the batch operator's
            # padding row)
            keys, lbs = [None], [0]
        yield pd.DataFrame({
            "bucket": [bucket] * len(keys),
            "key": keys,
            "lower_bound": pd.array(lbs, dtype="int64"),
            "bucket_rows": pd.array([rows] * len(keys),
                                    dtype="int64")})

    return (keyed.groupBy("bucket")
            .applyInPandasWithState(
                update,
                outputStructType=_HH_OUT,
                stateStructType=_HH_STATE,
                outputMode="update",
                timeoutConf="NoTimeout"))


def latest_summaries(emitted: DataFrame) -> DataFrame:
    """Collapse the update-mode emission history to each bucket's
    LATEST summary: ``bucket_rows`` is monotone per bucket, so the
    max-rows emission is the newest. Tiny table (≤ buckets × capacity
    rows per emission) — one window over it is free."""
    from pyspark.sql import Window

    w = Window.partitionBy("bucket")
    return (emitted
            .withColumn("__mx", F.max("bucket_rows").over(w))
            .filter(F.col("bucket_rows") == F.col("__mx"))
            .drop("__mx"))


def summaries_as_batch(latest: DataFrame) -> DataFrame:
    """Adapt :func:`latest_summaries` output to the batch summary
    schema (key, lower_bound, is_null_key, part_rows) so the
    monitor→exact-recount loop closes as ONE pipeline:

        stream → streaming_heavy_hitters → latest_summaries
               → summaries_as_batch
               → operators.heavy.heavy_hitters_from_summary(archive, …)

    Each bucket plays the role of a batch partition: its summary saw
    that bucket's FULL keyspace slice, so the per-bucket MG bound maps
    exactly onto the per-partition bound ``heavy_hitters_from_summary``
    relies on. ``bucket_rows`` is carried as ``part_rows`` on one row
    per bucket (0 on the rest) so a plain sum recovers n; the NULL-key
    marker an emptied bucket emits becomes a padding row (lower_bound
    0, is_null_key False — the streaming operator drops NULL keys, so
    a NULL-key CANDIDATE cannot exist and the archived stream must be
    filtered to non-NULL keys the same way before the recount). Keys
    stay strings (the streaming state schema); cast the archive's key
    column to string for the recount join. Tiny input (≤ buckets ×
    capacity rows) — the window is free."""
    from pyspark.sql import Window

    w = (Window.partitionBy("bucket")
         .orderBy(F.col("key").asc_nulls_last())
         .rowsBetween(Window.unboundedPreceding,
                      Window.currentRow))
    return (latest
            .withColumn("__rn", F.count(F.lit(1)).over(w))
            .select(
                F.col("key"),
                F.coalesce(F.col("lower_bound"), F.lit(0))
                .alias("lower_bound"),
                F.lit(False).alias("is_null_key"),
                F.when(F.col("__rn") == 1, F.col("bucket_rows"))
                .otherwise(F.lit(0)).alias("part_rows")))
