"""Streaming windowed bottom-k samples (streaming/samples.py).

Contracts under test:
* cross-micro-batch state carry — a window fed by 3 batches ends
  with EXACTLY the batch bottomk_summary over the window's rows
  (hash-identical rows, payloads included);
* int64 hashes survive the state round trip bit-exactly (typed
  array state, not a string encoding);
* latest_window_samples prunes superseded emissions;
* windows_as_sample folds archived windows into one lifetime
  sample equal to the single-pass sketch over the whole stream;
* batch invocation parity (emit_seq 1) via the fallback path.
"""

from __future__ import annotations

import datetime as dt
import tempfile
import time
import uuid

import pytest

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.bottomk import (
    bottomk_summary,
)
from big_data_bowl___2023_spark.streaming.samples import (
    latest_window_samples,
    windowed_samples,
    windows_as_sample,
)

pytestmark = pytest.mark.slow

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)
K = 8


def _rows(spec):
    return [(T0 + dt.timedelta(minutes=w, seconds=(i % 50) + 1),
             key, len(key))
            for w, keys in spec for i, key in enumerate(keys)]


def _write_batch(spark, path, rows):
    (spark.createDataFrame(rows, "ts timestamp, k string, n int")
     .coalesce(1).write.mode("append").parquet(path))
    time.sleep(1.1)


def _run_stream(spark, path):
    schema = spark.read.parquet(path).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(path))
    out = windowed_samples(stream, "k", "ts", "1 minute", K,
                           payload_cols=["n"])
    name = f"q_{uuid.uuid4().hex[:12]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def _sample_rows(df):
    return sorted((r["k"], r["kmv_hash"], r["n"])
                  for r in df.collect())


def test_state_carry_equals_batch_sketch(spark):
    w0 = [f"doc{i}" for i in range(40)]
    w1 = [f"page{i}" for i in range(30)]
    batches = [
        _rows([(0, w0[:15]), (1, w1[:10])]),
        _rows([(0, w0[15:30]), (1, w1[10:20])]),
        _rows([(0, w0[30:]), (1, w1[20:])]),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/events"
        for b in batches:
            _write_batch(spark, path, b)
        emissions = _run_stream(spark, path)
        latest = latest_window_samples(emissions)

        for start, keys in [(T0, w0),
                            (T0 + dt.timedelta(minutes=1), w1)]:
            win = latest.filter(F.col("window_start") == start)
            ref = bottomk_summary(
                spark.createDataFrame(
                    [(x, len(x)) for x in keys], "k string, n int"),
                "k", K, payload_cols=["n"])
            assert _sample_rows(
                win.select("k", "kmv_hash", "n")) == \
                _sample_rows(ref.select("k", "kmv_hash", "n"))
            # int64 hashes survived state round trips bit-exactly
            for r in win.collect():
                assert isinstance(r["kmv_hash"], int)

        # emit_seq reflects the touching batches; latest pruned
        seqs = {r["window_start"]: r["emit_seq"] for r in
                latest.select("window_start", "emit_seq")
                .distinct().collect()}
        assert seqs[T0] == 3
        assert emissions.count() > latest.count()

        # lifetime fold == single-pass sketch over the whole stream
        life = windows_as_sample(latest, "k", K,
                                 payload_cols=["n"])
        whole = bottomk_summary(
            spark.createDataFrame(
                [(x, len(x)) for x in w0 + w1], "k string, n int"),
            "k", K, payload_cols=["n"])
        assert _sample_rows(life.select("k", "kmv_hash", "n")) == \
            _sample_rows(whole.select("k", "kmv_hash", "n"))

        # batch-invocation parity
        batch_df = spark.read.parquet(path)
        bres = windowed_samples(batch_df, "k", "ts", "1 minute", K,
                                payload_cols=["n"])
        for start in seqs:
            a = _sample_rows(
                latest.filter(F.col("window_start") == start)
                .select("k", "kmv_hash", "n"))
            b = _sample_rows(
                bres.filter(F.col("window_start") == start)
                .select("k", "kmv_hash", "n"))
            assert a == b
        assert {r["emit_seq"] for r in bres.collect()} == {1}


def test_null_payloads_and_collision_guard(spark):
    """NULL int payloads survive the typed-array state round trip
    (batch parity holds on inputs the batch contract supports), and
    reserved-name collisions raise on the streaming path exactly as
    the batch path does."""
    rows = [(T0 + dt.timedelta(seconds=1), "dup", None),
            (T0 + dt.timedelta(seconds=2), "dup", 7),
            (T0 + dt.timedelta(seconds=3), "solo", 5)]
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/events"
        # two batches so the NULL-payload row crosses a state
        # round trip
        _write_batch(spark, path, rows[:1])
        _write_batch(spark, path, rows[1:])
        emissions = _run_stream(spark, path)
        latest = latest_window_samples(emissions)
        got = {r["k"]: r["n"] for r in latest.collect()}
        ref = bottomk_summary(
            spark.createDataFrame([(k, n) for _, k, n in rows],
                                  "k string, n int"),
            "k", K, payload_cols=["n"])
        want = {r["k"]: r["n"] for r in ref.collect()}
        assert got == want
        assert got["dup"] is None          # NULLS-FIRST tie-break

    df = spark.createDataFrame(rows, "ts timestamp, k string, n int")
    stream_like = df  # batch branch shares the guard
    with pytest.raises(ValueError, match="collision"):
        windowed_samples(stream_like, "k", "ts", "1 minute", K,
                         payload_cols=["emit_seq"])
    with pytest.raises(ValueError, match="collision"):
        windowed_samples(stream_like, "k", "ts", "1 minute", K,
                         payload_cols=["k"])
