"""Streaming maintenance of the persistent ANN index.

`similarity.index` gives the batch story (build / append / pruned
search); a production embedding pipeline RECEIVES vectors as a
stream. This is the foreachBatch face: the first non-empty batch
builds the index (meta + cell layout) with the factory's dim /
n_planes, every later batch appends through the SAME recorded planes
— so stream-built and batch-built indexes are byte-compatible and
`ann_index_search` works mid-stream.

Delivery contract — at-least-once in storage, exactly-once in
results: a crash between the parquet append and the checkpoint
commit replays the batch, double-appending rows. That is deliberate:
the replayed rows are bit-identical (same ids, same vectors → same
cells, same cosines) and `ann_index_search` dedupes (query, neighbor) pairs BEFORE its
ranking window, so duplicates can never change a result — they only
cost scan bytes. The batch loop
therefore needs NO ledger, no _SUCCESS gating, and no
snapshot-per-batch machinery (contrast `scd_stream`, where replayed
state would be WRONG, not merely redundant). The reclaim pass is
:func:`compact_index`, which also fixes the other streaming-ingest
pathology: thousands of per-batch small files inside each cell
directory.

Compaction is per-cell `sources.io.compact_parquet` (tmp + backup
swap, stop-the-world per directory — schedule between searches), so
the ≤ 2^n_planes cell directories are each rewritten to
``target_file_mb`` files, optionally deduping replayed ids.

Reference scope note: north-star extension (SURVEY.md §2 extensions,
inventory E113); the reference has no vector or streaming surface.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..similarity.index import _CELLS, _META, append_to_index, build_ann_index
from ..sources.io import compact_parquet


def make_ann_index_batch_fn(index_dir: str, dim: int = 64,
                            n_planes: int = 3,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id"
                            ) -> Callable[[DataFrame, int], None]:
    """foreachBatch processor maintaining a persistent ANN index from
    a vector stream: ``stream.writeStream.foreachBatch(fn)``. First
    non-empty batch builds (dim/n_planes frozen into the meta); later
    batches append with the meta's recorded planes — the factory
    args are only a bootstrap default, an existing index always wins
    (so a restart with different factory args cannot fork the cell
    geometry). Empty batches write nothing."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        jvm = spark._jvm
        # gate on the meta DIRECTORY, not its _SUCCESS marker: with
        # success markers disabled (a common object-store committer
        # setting) a marker gate would see "no index" forever and
        # every batch would REBUILD with overwrite — silent loss of
        # all prior vectors. A directory that exists but is torn
        # fails safe instead: append_to_index's _read_meta raises.
        meta_path = jvm.org.apache.hadoop.fs.Path(
            f"{index_dir}/{_META}")
        fs = meta_path.getFileSystem(
            spark._jsc.hadoopConfiguration())
        if fs.exists(meta_path):
            append_to_index(batch_df, index_dir, vec_col, id_col)
        else:
            build_ann_index(batch_df, index_dir, dim, n_planes,
                            vec_col, id_col)

    return process


def _recover_cell_swaps(jvm, fs, root) -> None:
    """Heal a prior compaction killed mid-swap. `compact_parquet`'s
    in-process rollback never runs on a hard crash (SIGKILL between
    its two renames), which would leave ``cell=X`` MISSING with the
    data stranded at ``cell=X__compact_old`` — a pruned search would
    then silently lose that cell's vectors. Restore the backup when
    the live dir is gone; delete it when the live dir exists (io.py's
    stale-backup rule: live data at the path makes any backup a prior
    run's undeleted copy); always delete staging leftovers."""
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.endswith("__compact_tmp"):
            fs.delete(st.getPath(), True)
        elif name.endswith("__compact_old"):
            live = jvm.org.apache.hadoop.fs.Path(
                root, name[:-len("__compact_old")])
            if fs.exists(live):
                fs.delete(st.getPath(), True)
            elif not fs.rename(st.getPath(), live):
                raise IOError(
                    f"failed to restore stranded cell backup {name}")


def compact_index(spark: SparkSession, index_dir: str,
                  target_file_mb: int = 128,
                  dedupe: bool = False) -> dict:
    """Rewrite every cell directory to ~``target_file_mb`` files;
    ``dedupe=True`` also drops duplicate ids left by at-least-once
    replays (replayed rows are bit-identical, so keeping any one is
    exact). Returns aggregate {"cells", "files_before",
    "files_after", "bytes"}. Per-cell stop-the-world (the
    `compact_parquet` swap caveat); with ≤ 2^n_planes cells the
    driver loop is bounded by construction. Starts by healing any
    crash-stranded swap from a previous run (`_recover_cell_swaps`)
    — searches between a crash and the next compaction do tolerate
    the strays (phantom ``cell=X__compact_old`` partition values
    never match a probed bitstring) but would MISS a cell whose live
    dir vanished mid-swap, so run compaction promptly after a crash."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(f"{index_dir}/{_CELLS}")
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        raise ValueError(f"no index cells at {index_dir}")
    _recover_cell_swaps(jvm, fs, root)
    totals = {"cells": 0, "files_before": 0, "files_after": 0,
              "bytes": 0}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("cell=")
                and "__compact" not in name):
            continue
        rep = compact_parquet(
            spark, st.getPath().toString(), target_file_mb,
            dedupe_by=["neighbor_id"] if dedupe else None)
        totals["cells"] += 1
        totals["files_before"] += rep["files_before"]
        totals["files_after"] += rep["files_after"]
        totals["bytes"] += rep["bytes"]
    return totals
