"""E34 — bounded-state streaming dedup: duplicates within the
watermark horizon are dropped (including within one batch); once the
watermark passes an entry's eviction point, the same fingerprint is
emitted AGAIN — direct evidence the operator's state is bounded by
the horizon rather than by stream history."""

from __future__ import annotations

import pytest

import tempfile
import time
import uuid
from datetime import datetime, timedelta

from big_data_bowl___2023_spark.streaming import (
    incremental_dedup_watermarked,
)

pytestmark = pytest.mark.slow

T0 = datetime(2026, 1, 1, 12, 0, 0)


def _write_batch(spark, path, rows):
    (spark.createDataFrame(rows, ["doc_id", "ts", "text"])
     .coalesce(1).write.mode("append").parquet(path))
    time.sleep(1.1)  # distinct mtimes: file source processes in order


def test_state_bounded_by_watermark_horizon(spark):
    with tempfile.TemporaryDirectory() as tmp:
        data = f"{tmp}/docs"
        # batch 1: duplicate WITHIN the batch + a unique doc
        _write_batch(spark, data, [
            (1, T0, "alpha beta"),
            (2, T0 + timedelta(seconds=1), "alpha beta"),
            (3, T0, "gamma delta"),
        ])
        # batches 2-3: unrelated docs 1h/2h later — watermark updates
        # lag by one batch, so TWO spacer batches guarantee batch 1's
        # entries are evicted before the re-arrival
        _write_batch(spark, data, [
            (4, T0 + timedelta(hours=1), "epsilon zeta"),
        ])
        _write_batch(spark, data, [
            (6, T0 + timedelta(hours=2), "eta theta"),
        ])
        # batch 4: the SAME text as doc 1, 3h later — its state entry
        # was evicted, so it must be emitted again
        _write_batch(spark, data, [
            (5, T0 + timedelta(hours=3), "alpha beta"),
        ])

        schema = spark.read.parquet(data).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(data))
        out = incremental_dedup_watermarked(stream, "ts", "10 seconds")

        name = f"q_{uuid.uuid4().hex[:12]}"
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        got = {r.doc_id for r in spark.table(name).collect()}

        assert {3, 4, 6} <= got
        # in-horizon duplicate dropped: exactly one of 1/2 survives
        assert len(got & {1, 2}) == 1
        # post-eviction duplicate re-emitted: bounded state, not
        # stream-lifetime memory
        assert 5 in got
        assert len(got) == 5
