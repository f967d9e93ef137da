"""Streaming windowed t-digest quantiles (streaming/quantiles.py).

Contracts under test:
* cross-micro-batch state carry — a window fed by 3 batches ends
  with the digest of ALL its values (count/min/max exact, median in
  the rank-error band), emit_seq counting its updates;
* latest_window_digests picks exactly the newest emission per
  window (the double-count guard for non-idempotent digest merges);
* windows_as_quantile_summary folds archived windows into a
  corpus-lifetime artifact whose count is exact and whose median
  tracks the whole stream;
* batch invocation == streaming result (parity via the batch
  fallback path);
* grouped windows keep per-group digests.
"""

from __future__ import annotations

import datetime as dt
import tempfile
import time
import uuid

import numpy as np
import pytest

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.streaming.quantiles import (
    latest_window_digests,
    windowed_quantile_digests,
    windows_as_quantile_summary,
)
from big_data_bowl___2023_spark.operators.quantiles import (
    quantile_estimate,
)

pytestmark = pytest.mark.slow

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _rows(spec):
    """spec: list of (window_index, values). Events land mid-window."""
    return [(T0 + dt.timedelta(minutes=w, seconds=(i % 50) + 1),
             float(v))
            for w, vals in spec for i, v in enumerate(vals)]


def _write_batch(spark, path, rows):
    (spark.createDataFrame(rows, "ts timestamp, v double")
     .coalesce(1).write.mode("append").parquet(path))
    time.sleep(1.1)


def _run_stream(spark, path):
    schema = spark.read.parquet(path).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(path))
    out = windowed_quantile_digests(stream, "v", "ts", "1 minute")
    name = f"q_{uuid.uuid4().hex[:12]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def test_multi_batch_state_carry_and_parity(spark):
    rng = np.random.default_rng(5)
    w0 = rng.normal(10.0, 2.0, size=900)
    w1 = rng.normal(50.0, 5.0, size=600)
    batches = [
        _rows([(0, w0[:300]), (1, w1[:200])]),
        _rows([(0, w0[300:600]), (1, w1[200:400])]),
        _rows([(0, w0[600:]), (1, w1[400:])]),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/events"
        for b in batches:
            _write_batch(spark, path, b)
        emissions = _run_stream(spark, path).collect()
        batch_df = spark.read.parquet(path)

        latest = latest_window_digests(
            spark.createDataFrame(emissions))
        rows = {r["window_start"]: r for r in latest.collect()}
        assert len(rows) == 2
        for start, vals in [(T0, w0),
                            (T0 + dt.timedelta(minutes=1), w1)]:
            r = rows[start]
            assert r["count"] == len(vals)          # all 3 batches
            assert r["min"] == pytest.approx(vals.min())
            assert r["max"] == pytest.approx(vals.max())
            assert r["emit_seq"] == 3               # one per batch
        # median in the rank-error band per window
        est = quantile_estimate(
            latest.drop("window_start", "emit_seq"), [0.5]).collect()
        # (digest cols only -> one row per window in arbitrary order)
        meds = sorted(r["quantile"] for r in est)
        assert abs(meds[0] - np.median(w0)) < 0.5
        assert abs(meds[1] - np.median(w1)) < 1.5

        # double-count guard: raw emissions across 3 batches carry
        # MORE digest weight than the latest-only view
        total_raw = sum(r["count"] for r in emissions)
        total_latest = sum(r["count"] for r in latest.collect())
        assert total_latest == 1500
        assert total_raw > total_latest

        # corpus-lifetime fold: exact count, median tracks stream
        life = windows_as_quantile_summary(latest)
        lrow = life.collect()[0]
        assert lrow["count"] == 1500
        assert lrow["min"] == pytest.approx(min(w0.min(), w1.min()))
        assert lrow["max"] == pytest.approx(max(w0.max(), w1.max()))
        allv = np.concatenate([w0, w1])
        med = quantile_estimate(life, [0.5]).collect()[0]["quantile"]
        rank = np.searchsorted(np.sort(allv), med) / len(allv)
        assert abs(rank - 0.5) < 0.02

        # batch invocation parity: same windows, same exact fields
        bres = {r["window_start"]: r for r in
                windowed_quantile_digests(batch_df, "v", "ts",
                                          "1 minute").collect()}
        assert set(bres) == set(rows)
        for start in rows:
            assert bres[start]["count"] == rows[start]["count"]
            assert bres[start]["min"] == rows[start]["min"]
            assert bres[start]["max"] == rows[start]["max"]
            assert bres[start]["emit_seq"] == 1


def test_grouped_windows_keep_per_group_digests(spark):
    rows = [(T0 + dt.timedelta(seconds=i % 50), g, float(v))
            for g, base in (("a", 0.0), ("b", 100.0))
            for i, v in enumerate(np.arange(base, base + 50))]
    df = spark.createDataFrame(rows, "ts timestamp, g string, v double")
    out = windowed_quantile_digests(df, "v", "ts", "1 minute",
                                    group_cols=["g"])
    got = {r["g"]: r for r in out.collect()}
    assert got["a"]["count"] == 50 and got["b"]["count"] == 50
    assert got["a"]["max"] == 49.0
    assert got["b"]["min"] == 100.0
    latest = latest_window_digests(out, group_cols=["g"])
    assert latest.count() == 2
    life = windows_as_quantile_summary(latest, group_cols=["g"])
    per_g = {r["g"]: r["count"] for r in life.collect()}
    assert per_g == {"a": 50, "b": 50}
