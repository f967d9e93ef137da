"""Streaming windowed count-min sketches (streaming/frequency.py).

Contracts under test:
* cross-micro-batch state carry — a window fed by 3 batches ends
  with the sketch of ALL its rows, BIT-IDENTICAL to a batch
  cms_summary over the window's rows (same hashes, same cells);
* latest_window_sketches picks the newest emission per window (the
  double-count guard — counters add);
* windows_as_cms_summary folds archived windows into one
  corpus-lifetime sketch whose estimates are sound and whose total
  mass is exact;
* batch invocation parity via the fallback path, incl. NULL keys
  excluded on both sides;
* oversized matrices refused for stream state.
"""

from __future__ import annotations

import datetime as dt
import tempfile
import time
import uuid

import numpy as np
import pytest

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.frequency import (
    cms_matrix,
    cms_summary,
    estimate_counts,
)
from big_data_bowl___2023_spark.streaming.frequency import (
    latest_window_sketches,
    windowed_cms_sketches,
    windows_as_cms_summary,
)

pytestmark = pytest.mark.slow

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)
W, D = 512, 3


def _rows(spec):
    return [(T0 + dt.timedelta(minutes=w, seconds=(i % 50) + 1), k)
            for w, keys in spec for i, k in enumerate(keys)]


def _write_batch(spark, path, rows):
    (spark.createDataFrame(rows, "ts timestamp, k string")
     .coalesce(1).write.mode("append").parquet(path))
    time.sleep(1.1)


def _run_stream(spark, path):
    schema = spark.read.parquet(path).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(path))
    out = windowed_cms_sketches(stream, "k", "ts", "1 minute", W, D)
    name = f"q_{uuid.uuid4().hex[:12]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def test_state_carry_bit_identical_to_batch(spark):
    w0 = ["alpha"] * 30 + [f"t{i}" for i in range(40)]
    w1 = ["beta"] * 20 + [f"u{i}" for i in range(30)]
    batches = [
        _rows([(0, w0[:30]), (1, w1[:20])]),
        _rows([(0, w0[30:60]), (1, w1[20:])]),
        _rows([(0, w0[60:]), (1, None or [])]),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/events"
        for b in batches:
            _write_batch(spark, path, b)
        emissions = _run_stream(spark, path)
        latest = latest_window_sketches(emissions)

        batch_df = spark.read.parquet(path)
        for start, keys in [(T0, w0),
                            (T0 + dt.timedelta(minutes=1), w1)]:
            win = latest.filter(F.col("window_start") == start) \
                .select("row_idx", "col_idx", "count", "width",
                        "depth")
            ref = cms_summary(
                spark.createDataFrame([(k,) for k in keys],
                                      "k string"), "k", W, D)
            got_c, got_p = cms_matrix(win)
            ref_c, ref_p = cms_matrix(ref)
            assert got_p == ref_p
            assert (got_c == ref_c).all()      # bit-identical

        # emit_seq counts the touching batches per window
        seqs = {r["window_start"]: r["emit_seq"]
                for r in latest.select("window_start", "emit_seq")
                .distinct().collect()}
        assert seqs[T0] == 3
        assert seqs[T0 + dt.timedelta(minutes=1)] == 2

        # double-count guard: raw emissions' anchor-dedup'd mass
        # exceeds the latest-only mass
        raw_mass = emissions.agg(F.sum("count")).collect()[0][0]
        latest_mass = latest.agg(F.sum("count")).collect()[0][0]
        assert raw_mass > latest_mass

        # lifetime fold: sound estimates, exact total mass
        life = windows_as_cms_summary(latest)
        cells, _ = cms_matrix(life)
        assert (cells.sum(axis=1) == len(w0) + len(w1)).all()
        probe = spark.createDataFrame(
            [("alpha", 30), ("beta", 20)], "k string, true_n int")
        for r in estimate_counts(probe, "k", life).collect():
            assert r["freq_estimate"] >= r["true_n"]

        # batch-invocation parity: same latest cells (emit_seq 1)
        bemit = windowed_cms_sketches(batch_df, "k", "ts",
                                      "1 minute", W, D)
        for start in seqs:
            a = cms_matrix(
                latest.filter(F.col("window_start") == start)
                .select("row_idx", "col_idx", "count", "width",
                        "depth"))[0]
            b = cms_matrix(
                bemit.filter(F.col("window_start") == start)
                .select("row_idx", "col_idx", "count", "width",
                        "depth"))[0]
            assert (a == b).all()


def test_null_keys_excluded_and_size_guard(spark):
    df = spark.createDataFrame(
        [(T0, "a"), (T0, None), (T0, "a")],
        "ts timestamp, k string")
    out = windowed_cms_sketches(df, "k", "ts", "1 minute", W, D)
    cells, _ = cms_matrix(out.select("row_idx", "col_idx", "count",
                                     "width", "depth"))
    assert (cells.sum(axis=1) == 2).all()      # NULL key dropped
    with pytest.raises(ValueError, match="stream state"):
        windowed_cms_sketches(df, "k", "ts", "1 minute",
                              70_000_000, 1)
