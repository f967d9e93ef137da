"""Streaming SCD2 loop (streaming/scd_stream.py): batch-wise oracle
identity, exact same-id replay, torn-snapshot invisibility,
redelivery echo filtering, quarantine accounting, batch-grain time
travel, and a real availableNow stream run."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.scd import (
    scd2_apply_with_quarantine,
    scd2_init,
)
from big_data_bowl___2023_spark.streaming.scd_stream import (
    committed_snapshot_ids,
    make_scd2_batch_fn,
    quarantine_log,
    scd2_dim,
)

KEYS = ["entity"]
TS = "effective_ts"


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "entity string, attr string, tier int, effective_ts long")


B0 = [("a", "x", 1, 10), ("b", "y", 1, 10)]
B1 = [("a", "x2", 1, 20), ("c", "z", 2, 20)]
B2 = [("a", "x2", 1, 25),          # no-op churn: suppressed
      ("b", "y", 9, 30),           # tier change
      ("c", "z_late", 2, 15)]      # late: ts <= c's valid_from 20


def _collect(df):
    return sorted(map(tuple, df.collect()))


def _run(spark, tmp_path, batches, name="dim"):
    dim_dir = str(tmp_path / name)
    q_dir = str(tmp_path / f"{name}_q")
    fn = make_scd2_batch_fn(dim_dir, q_dir, KEYS, TS)
    for i, rows in enumerate(batches):
        fn(_batch(spark, rows), i)
    return dim_dir, q_dir, fn


def test_loop_matches_batchwise_oracle(spark, tmp_path):
    dim_dir, q_dir, _ = _run(spark, tmp_path, [B0, B1, B2])
    got = scd2_dim(spark, dim_dir)
    oracle = scd2_init(_batch(spark, B0), KEYS, TS)
    oracle, _ = scd2_apply_with_quarantine(
        oracle, _batch(spark, B1), KEYS, TS)
    oracle, q2 = scd2_apply_with_quarantine(
        oracle, _batch(spark, B2), KEYS, TS)
    assert _collect(got) == _collect(oracle)
    # one current row per key
    cur = got.filter("is_current").groupBy("entity").count().collect()
    assert all(r["count"] == 1 for r in cur)
    # the late c-row is quarantined in batch 2, and it is genuine
    # (not an echo: z_late never matches recorded history)
    qlog = quarantine_log(spark, q_dir)
    assert [(r["entity"], r["attr"], int(r["batch"]))
            for r in qlog.collect()] == [("c", "z_late", 2)]
    assert _collect(qlog.drop("batch")) == _collect(q2)


def test_same_id_replay_is_bit_exact(spark, tmp_path):
    dim_dir, q_dir, fn = _run(spark, tmp_path, [B0, B1, B2])
    before_dim = _collect(scd2_dim(spark, dim_dir))
    before_q = _collect(quarantine_log(spark, q_dir))
    # a genuine recovery replay is always of the LATEST committed
    # batch (foreachBatch is sequential): no-op skip, outputs intact
    fn(_batch(spark, B2), 2)
    assert _collect(scd2_dim(spark, dim_dir)) == before_dim
    assert _collect(quarantine_log(spark, q_dir)) == before_q
    assert committed_snapshot_ids(spark, dim_dir) == [0, 1, 2]
    # an id BEHIND the latest snapshot is checkpoint-reset misuse
    # (silently skipping would discard every new batch forever)
    with pytest.raises(ValueError, match="checkpoint was reset"):
        fn(_batch(spark, B1), 1)


def test_redelivered_data_under_new_id_is_clean(spark, tmp_path):
    """At-least-once upstream: batch 1's DATA shows up again as
    batch 3. The dimension must not change and the echo filter must
    keep the replayed rows out of quarantine."""
    dim_dir, q_dir, fn = _run(spark, tmp_path, [B0, B1, B2])
    before = _collect(scd2_dim(spark, dim_dir))
    fn(_batch(spark, B1), 3)   # same rows, new batch id
    assert _collect(scd2_dim(spark, dim_dir)) == before
    q3 = [r for r in quarantine_log(spark, q_dir).collect()
          if int(r["batch"]) == 3]
    assert q3 == []


def test_genuine_late_change_survives_echo_filter(spark, tmp_path):
    dim_dir, q_dir, fn = _run(spark, tmp_path, [B0, B1])
    # ts 15 is before a's current valid_from 20, and attr "DIFFERENT"
    # does not match the version valid at 15 (attr "x") → quarantined
    fn(_batch(spark, [("a", "DIFFERENT", 1, 15)]), 2)
    q2 = [(r["entity"], r["attr"]) for r in
          quarantine_log(spark, q_dir).collect()
          if int(r["batch"]) == 2]
    assert q2 == [("a", "DIFFERENT")]
    # but a late row matching then-valid history is an echo: dropped
    fn(_batch(spark, [("a", "x", 1, 15)]), 3)
    q3 = [r for r in quarantine_log(spark, q_dir).collect()
          if int(r["batch"]) == 3]
    assert q3 == []


def test_torn_snapshot_is_invisible_and_recovered(spark, tmp_path):
    dim_dir, q_dir, fn = _run(spark, tmp_path, [B0, B1])
    # simulate a crash mid-write of batch 2: parquet-less dir,
    # no _SUCCESS marker
    torn = os.path.join(dim_dir, "batch=2")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet.tmp"), "w") as f:
        f.write("torn")
    assert committed_snapshot_ids(spark, dim_dir) == [0, 1]
    assert _collect(scd2_dim(spark, dim_dir)) == _collect(
        spark.read.parquet(f"{dim_dir}/batch=1"))
    fn(_batch(spark, B2), 2)   # recovery overwrites the torn dir
    assert committed_snapshot_ids(spark, dim_dir) == [0, 1, 2]
    cur = scd2_dim(spark, dim_dir).filter("is_current")
    assert cur.count() == 3


def test_batch_grain_time_travel_and_empty_batches(spark, tmp_path):
    dim_dir, q_dir, fn = _run(spark, tmp_path, [B0])
    fn(_batch(spark, []), 1)                   # empty: writes nothing
    fn(_batch(spark, B1), 2)
    assert committed_snapshot_ids(spark, dim_dir) == [0, 2]
    asof0 = scd2_dim(spark, dim_dir, batch_id=1)   # latest ≤ 1 → 0
    assert _collect(asof0) == _collect(
        scd2_init(_batch(spark, B0), KEYS, TS))
    assert scd2_dim(spark, dim_dir, batch_id=-1) is None
    assert quarantine_log(spark, str(tmp_path / "nope")) is None


def test_bootstrap_null_ts_rows_are_quarantined(spark, tmp_path):
    """scd2_init has no admissibility join, so the loop must split
    malformed NULL-ts rows out BEFORE bootstrap — the module contract
    is that NULL-ts rows ALWAYS stay quarantined, batch 0 included."""
    b0 = [("a", "x", 1, 10), ("bad", "m", 1, None)]
    dim_dir, q_dir, fn = _run(spark, tmp_path, [b0])
    dim = scd2_dim(spark, dim_dir)
    assert [r["entity"] for r in dim.collect()] == ["a"]
    qlog = quarantine_log(spark, q_dir)
    assert [(r["entity"], int(r["batch"])) for r in qlog.collect()] \
        == [("bad", 0)]
    # the malformed row arriving later is quarantined identically
    fn(_batch(spark, [("bad", "m", 1, None)]), 1)
    q1 = [r["entity"] for r in quarantine_log(spark, q_dir).collect()
          if int(r["batch"]) == 1]
    assert q1 == ["bad"]


def test_all_null_bootstrap_does_not_freeze(spark, tmp_path):
    """A first batch of ONLY malformed rows must not commit an empty
    dimension: the next valid batch still bootstraps via scd2_init."""
    dim_dir, q_dir, fn = _run(
        spark, tmp_path, [[("bad", "m", 1, None)]])
    assert scd2_dim(spark, dim_dir) is None
    assert committed_snapshot_ids(spark, dim_dir) == []
    fn(_batch(spark, B0), 1)
    assert _collect(scd2_dim(spark, dim_dir)) == _collect(
        scd2_init(_batch(spark, B0), KEYS, TS))


def test_committed_batch_replay_is_noop(spark, tmp_path):
    """Crash AFTER the snapshot committed but BEFORE the stream
    checkpoint: the replay must SKIP, never delete-and-rewrite a
    committed snapshot under a concurrent reader. Replaying with
    DIFFERENT data proves the skip (a recompute would change it)."""
    dim_dir, q_dir, fn = _run(spark, tmp_path, [B0, B1])
    before = _collect(scd2_dim(spark, dim_dir))
    fn(_batch(spark, [("a", "IMPOSTER", 7, 99)]), 1)
    assert _collect(scd2_dim(spark, dim_dir)) == before
    assert committed_snapshot_ids(spark, dim_dir) == [0, 1]


def test_quarantine_log_is_success_gated(spark, tmp_path):
    """A torn quarantine dir (crash mid-write, no _SUCCESS) must be
    invisible to quarantine_log — same reader contract as the
    snapshots."""
    dim_dir, q_dir, fn = _run(spark, tmp_path, [B0, B1, B2])
    torn = os.path.join(q_dir, "batch=3")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "w") as f:
        f.write("not parquet")
    qlog = quarantine_log(spark, q_dir)
    assert [(r["entity"], int(r["batch"])) for r in qlog.collect()] \
        == [("c", 2)]


def test_stray_nonnumeric_batch_dir_is_ignored(spark, tmp_path):
    """A tooling leftover like batch=2__tmp (even with _SUCCESS) must
    not take down every reader or the processor itself."""
    dim_dir, q_dir, fn = _run(spark, tmp_path, [B0, B1])
    stray = os.path.join(dim_dir, "batch=1__tmp")
    os.makedirs(stray)
    open(os.path.join(stray, "_SUCCESS"), "w").close()
    assert committed_snapshot_ids(spark, dim_dir) == [0, 1]
    fn(_batch(spark, B2), 2)   # processor lists too — must not raise
    assert committed_snapshot_ids(spark, dim_dir) == [0, 1, 2]


def test_real_stream_availablenow(spark, tmp_path):
    """End-to-end through a real file stream: rows land as CDC files,
    availableNow drains them through the loop, the final dim matches
    the batch oracle over all delivered rows."""
    src = str(tmp_path / "cdc_src")
    updates = _batch(spark, B0 + B1)
    updates.write.json(src)
    dim_dir = str(tmp_path / "sdim")
    q_dir = str(tmp_path / "sdim_q")
    stream = (spark.readStream.schema(updates.schema).json(src))
    q = (stream.writeStream
         .foreachBatch(make_scd2_batch_fn(dim_dir, q_dir, KEYS, TS))
         .trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.awaitTermination(120)
    got = scd2_dim(spark, dim_dir)
    assert got is not None
    # stream order within one availableNow drain is one batch: the
    # oracle is scd2_init over everything delivered
    oracle = scd2_init(updates, KEYS, TS)
    assert _collect(got) == _collect(oracle)
