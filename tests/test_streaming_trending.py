"""Streaming heavy hitters: multi-micro-batch state carry, bounded
state, superset guarantee vs exact counts, and lower-bound soundness."""

from __future__ import annotations

import collections
import tempfile
import time
import uuid

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.heavy import mg_capacity
from big_data_bowl___2023_spark.streaming.trending import (
    latest_summaries,
    streaming_heavy_hitters,
)

pytestmark = pytest.mark.slow

CAP = 8
BUCKETS = 4


def _write_batch(spark, path, keys):
    (spark.createDataFrame([(k,) for k in keys], ["k"])
     .coalesce(1).write.mode("append").parquet(path))
    time.sleep(1.1)  # distinct mtimes: file source processes in order


def _run(spark, path):
    schema = spark.read.parquet(path).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(path))
    out = streaming_heavy_hitters(stream, "k", CAP, BUCKETS)
    name = f"q_{uuid.uuid4().hex[:12]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    return latest_summaries(spark.table(name)).collect()


def test_streaming_heavy_hitters_guarantees(spark):
    # heavy keys spread across 3 micro-batches, tail churn throughout
    b1 = ["hot_a"] * 40 + ["hot_b"] * 10 + [f"t{i}" for i in range(60)]
    b2 = ["hot_a"] * 30 + ["hot_b"] * 30 + [f"u{i}" for i in range(60)]
    b3 = ["hot_b"] * 40 + ["hot_a"] * 10 + [f"v{i}" for i in range(60)]
    exact = collections.Counter(b1 + b2 + b3)

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/keys"
        for b in (b1, b2, b3):
            _write_batch(spark, path, b)
        final = _run(spark, path)

    # bounded state: each bucket holds <= CAP entries (+ marker rows)
    per_bucket = collections.Counter(r.bucket for r in final)
    assert all(c <= CAP for c in per_bucket.values())

    # per-bucket row accounting sums to the stream length (NULL-key
    # marker rows keep emptied buckets visible)
    rows = {r.bucket: r.bucket_rows for r in final}
    assert sum(rows.values()) == sum(exact.values())

    # superset guarantee: any key with count > bucket_rows/(CAP+1)
    # for EVERY bucket is certainly present; hot_a (80) and hot_b (80)
    # tower over max_bucket_rows/(CAP+1)
    cand = {r.key for r in final if r.key is not None}
    bound = max(rows.values()) / (CAP + 1)
    assert exact["hot_a"] > bound and exact["hot_b"] > bound
    assert {"hot_a", "hot_b"} <= cand

    # lower bounds are sound and within the MG error of exact
    for r in final:
        if r.key is None:
            continue
        assert 0 < r.lower_bound <= exact[r.key]
        assert exact[r.key] - r.lower_bound <= rows[r.bucket] / (CAP + 1)


def test_streaming_state_survives_batches(spark):
    """A key that is NEVER heavy within a single micro-batch but heavy
    across the stream must surface — the cross-batch state carry that
    a per-batch groupBy cannot express."""
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/keys"
        # 'slow' appears 6x per batch amid 40 distinct decoys; any
        # single batch would decrement it away without carried counts
        for i in range(4):
            _write_batch(spark, path,
                         ["slow"] * 6 + [f"d{i}_{j}" for j in range(40)])
        final = _run(spark, path)
    assert "slow" in {r.key for r in final}


def test_capacity_sizing_helper():
    assert mg_capacity(0.1) == 20


def test_stream_to_batch_exact_recount_pipeline(spark):
    """The advertised monitor→exact-recount loop as ONE pipeline:
    streaming summaries (3 micro-batches) → latest_summaries →
    summaries_as_batch → heavy_hitters_from_summary against the
    archived stream == naive groupBy over the full archive."""
    import math

    from big_data_bowl___2023_spark.operators.heavy import (
        heavy_hitters_from_summary,
    )
    from big_data_bowl___2023_spark.streaming.trending import (
        summaries_as_batch,
    )

    b1 = ["hot_a"] * 40 + ["hot_b"] * 10 + [f"t{i}" for i in range(60)]
    b2 = ["hot_a"] * 30 + ["hot_b"] * 30 + [f"u{i}" for i in range(60)]
    b3 = ["hot_b"] * 40 + ["hot_a"] * 10 + [f"v{i}" for i in range(60)]
    phi = 0.05
    exact = collections.Counter(b1 + b2 + b3)
    n = sum(exact.values())
    want = {(k, c) for k, c in exact.items()
            if c >= math.ceil(phi * n)}

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/keys"
        for b in (b1, b2, b3):
            _write_batch(spark, path, b)
        schema = spark.read.parquet(path).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(path))
        out = streaming_heavy_hitters(stream, "k", CAP, BUCKETS)
        name = f"q_{uuid.uuid4().hex[:12]}"
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination()
        latest = latest_summaries(spark.table(name))
        summary = summaries_as_batch(latest).localCheckpoint()
        # the archive IS the stream's source files, read as a batch
        archive = spark.read.parquet(path)
        got = {(r.k, r["count"]) for r in
               heavy_hitters_from_summary(archive, summary, "k",
                                          phi).collect()}
    assert got == want
    assert {"hot_a", "hot_b"} == {k for k, _ in got}


def test_null_keys_dropped_contract(spark):
    """Pin the documented batch/stream divergence: the streaming
    operator DROPS NULL keys (keyed state can't hash them) — they are
    excluded from bucket_rows and can never become candidates — while
    the batch operator keeps SQL NULL-group semantics."""
    from big_data_bowl___2023_spark.operators.heavy import (
        heavy_hitters,
    )

    keys = ["x"] * 6 + [None] * 10 + ["y"] * 2
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/keys"
        (spark.createDataFrame([(k,) for k in keys], "k string")
         .coalesce(1).write.parquet(path))
        final = _run(spark, path)

    # NULL rows never reach the state: row accounting excludes them,
    # and every NULL-key row is a marker (lower_bound 0), never a
    # candidate
    assert sum(r.bucket_rows for r in final) == 8
    assert all(r.lower_bound == 0 for r in final if r.key is None)
    assert {r.key for r in final if r.lower_bound > 0} <= {"x", "y"}

    # the batch operator on the same data DOES surface the NULL group
    batch = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {(r.k, r["count"])
           for r in heavy_hitters(batch, "k", 0.3).collect()}
    assert (None, 10) in got


def test_emptied_bucket_emits_null_marker(spark):
    """A bucket whose summary legitimately compacts to empty (all
    singletons, capacity 1) emits the NULL-key marker row so its row
    accounting stays visible downstream."""
    import pandas as pd

    from big_data_bowl___2023_spark.streaming.trending import (
        streaming_heavy_hitters,
    )

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/keys"
        (spark.createDataFrame([("a",), ("b",)], "k string")
         .coalesce(1).write.parquet(path))
        schema = spark.read.parquet(path).schema
        stream = (spark.readStream.schema(schema).parquet(path))
        out = streaming_heavy_hitters(stream, "k", capacity=1,
                                      n_buckets=1)
        name = f"q_{uuid.uuid4().hex[:12]}"
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination()
        rows = spark.table(name).collect()
    assert [(r.key, r.lower_bound, r.bucket_rows) for r in rows] == [
        (None, 0, 2)]
