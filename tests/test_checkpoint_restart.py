"""E37 — durable streaming restarts: with a checkpointLocation and a
durable (parquet) sink, a re-started availableNow run processes ONLY
data that arrived since the last run — committed source offsets and
operator state survive the stop. This is the production mode of the
incremental-dedup pipeline: each scheduled run drains the new files
and stops, with exactly-once file-source semantics across runs."""

from __future__ import annotations

import pytest

import tempfile
import time

from big_data_bowl___2023_spark.streaming import incremental_dedup

pytestmark = pytest.mark.slow


def _run_once(spark, data, ckpt, out_dir):
    schema = spark.read.parquet(data).schema
    stream = spark.readStream.schema(schema).parquet(data)
    out = incremental_dedup(stream)
    q = (out.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return {r.doc_id for r in spark.read.parquet(out_dir).collect()}


def test_restart_processes_only_new_files(spark):
    with tempfile.TemporaryDirectory() as tmp:
        data, ckpt, out = f"{tmp}/docs", f"{tmp}/ckpt", f"{tmp}/out"
        (spark.createDataFrame(
            [(1, "first doc"), (2, "second doc")],
            ["doc_id", "text"])
         .coalesce(1).write.mode("append").parquet(data))

        got1 = _run_once(spark, data, ckpt, out)
        assert got1 == {1, 2}

        time.sleep(1.1)
        (spark.createDataFrame(
            [(3, "third doc"),
             (4, "first doc")],   # duplicate text of doc 1
            ["doc_id", "text"])
         .coalesce(1).write.mode("append").parquet(data))

        # run 2 with the SAME checkpoint: only the new file is read.
        # dropDuplicates state also survives via the checkpoint, so
        # doc 4 (text seen in run 1) stays deduplicated — the restart
        # resumes the operator, not just the source offsets.
        got2 = _run_once(spark, data, ckpt, out)
        assert got2 == {1, 2, 3}  # cumulative sink: run 2 added ONLY 3

        # a FRESH checkpoint + sink reprocesses everything from scratch
        got3 = _run_once(spark, data, f"{tmp}/ckpt2", f"{tmp}/out2")
        assert len(got3) == 3  # 1-or-4 (same fingerprint), 2, 3
        assert {2, 3} <= got3 and len(got3 & {1, 4}) == 1
