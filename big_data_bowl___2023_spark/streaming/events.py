"""Structured Streaming over the ``events`` table (SURVEY.md §2.9 /
§7.1.7 stretch scope).

The reference is pure batch, but its per-play event sequences
(ball_snap → pass_forward, MBE:22-30) are session shapes and its 10 Hz
frame clock is event time — this module maps both to Structured
Streaming: tumbling windows for the calendar rollups and
``session_window`` for the snap→throw sessionization.

Batch-parity design: every transformation here takes a DataFrame
(streaming or batch — the API is identical by construction), so the
driver-checked queries run the SAME code through a one-shot
``availableNow`` trigger into a memory sink and compare against a
batch SQL oracle. In production the trigger/sink switch to continuous
micro-batches + kafka/delta with a watermark; the logical plan is
unchanged.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _event_stream_schema(ts_type: T.DataType) -> T.StructType:
    """Stream schema with the ts field pinned to whatever the parquet
    files actually carry (LongType under nanosAsLong for legacy
    TIMESTAMP(NANOS) files, TimestampType/NTZ for micros files)."""
    return T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])


def _stage_dir(sf_dir: str) -> str:
    """The file stream source monitors a *directory*; stage the single
    events.parquet into a stable per-sf temp dir (symlink — no copy)."""
    import hashlib
    import os
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    d = os.path.join(
        "/tmp", f"spark_stream_{hashlib.md5(src.encode()).hexdigest()[:10]}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        try:
            os.symlink(src, link)
        except OSError:
            import shutil
            shutil.copyfile(src, link)
    return d


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet, type-adaptive on the
    ts encoding exactly like the batch reader (sources.io.load_table):
    legacy TIMESTAMP(NANOS) files arrive as raw nanos (nanosAsLong)
    and are truncated to microseconds; TIMESTAMP(MICROS) files are
    cast straight to a session-tz TimestampType. A one-off batch scan
    of the footer picks the stream schema (streams must pre-declare
    theirs — no inference at 100 TB anyway)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    staged = _stage_dir(sf_dir)
    ts_type = spark.read.parquet(staged).schema["ts"].dataType
    stream = (spark.readStream
              .schema(_event_stream_schema(ts_type))
              .parquet(staged))
    if isinstance(ts_type, T.LongType):
        return stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, width: str = "1 day",
                    watermark: str | None = None) -> DataFrame:
    """Per-window, per-type counts and exact-decimal value sums — the
    streaming form of the calendar rollup (f9_datetime_rollup).
    ``watermark`` bounds state for late data in continuous mode."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (events
            .groupBy(F.window("ts", width).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n", "total_value"))


def hopping_counts(events: DataFrame, width: str = "1 day",
                   slide: str = "6 hours",
                   watermark: str | None = None) -> DataFrame:
    """Sliding (hopping) windows: every event lands in width/slide
    overlapping windows — the moving-average / rolling-rate shape
    (e.g. "events per trailing day, updated every 6 hours"). Same
    plan as tumbling but the window expression fans each row out to
    its covering windows map-side; state per key is width/slide
    window entries, still bounded by the watermark."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (events
            .groupBy(F.window("ts", width, slide).alias("w"),
                     "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n"))


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str | None = None) -> DataFrame:
    """Per-user activity sessions via ``session_window`` — the
    state-machine shape of the reference's snap→throw play delimiting
    (MBE:22-30), expressed with the built-in session operator instead
    of custom state. A session extends while consecutive events are
    < gap apart; window end = last event + gap."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (events
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("event_id").alias("first_event_id"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "first_event_id"))


_FUNNEL_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("first_purchase_event", T.LongType()),
    T.StructField("views_before", T.LongType()),
])

_FUNNEL_STATE = T.StructType([
    T.StructField("views", T.LongType()),
    T.StructField("fired", T.BooleanType()),
])


def funnel_detect(events: DataFrame, min_views: int = 3) -> DataFrame:
    """CUSTOM stateful operator (applyInPandasWithState): per-user
    funnel detection — emit the first ``purchase`` that follows at
    least ``min_views`` ``view`` events. This is the reference's
    snap→throw play state machine (MBE:22-30) in its general form: a
    per-key sequence detector whose state (view count, fired flag)
    survives across micro-batches — not expressible with
    session_window or tumbling aggregation.

    State is two scalars per user → bounded; at 100 TB the state
    store shards by user_id across executors like any keyed state.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState

    def detect(key, pdfs, state: GroupState):
        (user_id,) = key
        views, fired = state.get if state.exists else (0, False)
        # The per-key iterator arrives in arbitrary chunks; order is
        # only defined after concatenating the batch (event-time order
        # across micro-batches is an in-order-source assumption,
        # standard for this detector shape).
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        out = []
        for _, row in batch.iterrows():
            if fired:
                break
            if row["event_type"] == "view":
                views += 1
            elif row["event_type"] == "purchase" and views >= min_views:
                fired = True
                out.append((user_id, int(row["event_id"]), views))
        state.update((views, fired))
        if out:
            yield pd.DataFrame(out, columns=["user_id",
                                             "first_purchase_event",
                                             "views_before"])

    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                detect,
                outputStructType=_FUNNEL_SCHEMA,
                stateStructType=_FUNNEL_STATE,
                outputMode="append",
                timeoutConf="NoTimeout"))


def funnel_detect_batch(events: DataFrame, min_views: int = 3) -> DataFrame:
    """Batch oracle for funnel_detect: same semantics via windows —
    running view count per user, first qualifying purchase."""
    from pyspark.sql import Window

    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    flagged = (events
               .withColumn("views_before",
                           F.count(F.when(F.col("event_type") == "view", 1))
                            .over(w))
               .filter((F.col("event_type") == "purchase")
                       & (F.col("views_before") >= min_views)))
    first = (Window.partitionBy("user_id").orderBy("ts", "event_id"))
    return (flagged.withColumn("rn", F.row_number().over(first))
            .filter(F.col("rn") == 1)
            .select("user_id",
                    F.col("event_id").alias("first_purchase_event"),
                    "views_before"))


def run_available_now(result: DataFrame, spark: SparkSession,
                      output_mode: str = "complete") -> DataFrame:
    """Execute a streaming aggregation to completion over the data
    available now (one-shot), returning the final result table.

    Memory sink + complete mode: every window is emitted regardless of
    watermark progress, giving exact batch parity for the driver's
    oracle comparison. Append mode is for operators that only emit
    finalized rows (applyInPandasWithState). Production deployments
    swap this for a durable sink.
    """
    name = f"q_{uuid.uuid4().hex[:12]}"
    q = (result.writeStream
         .format("memory")
         .queryName(name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(name)
