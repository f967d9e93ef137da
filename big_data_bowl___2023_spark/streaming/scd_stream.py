"""Streaming SCD2 — a CDC dimension maintained by a foreachBatch loop.

The dimension-table counterpart of the curation/semantic ingest
loops (`streaming/curation.py`, `streaming/semantic_stream.py`):
state lives in durable artifacts, never in stream state, and the
layout makes replay exact instead of merely tolerable.

Layout — snapshot per micro-batch, the artifact-store pattern:

    {dim_dir}/batch=N/       full SCD2 snapshot AFTER batch N
    {quarantine_dir}/batch=N/  that batch's inadmissible updates

* The processor reads the LATEST committed snapshot with id < the
  incoming batch_id, applies `scd2_apply_with_quarantine`, and
  overwrites its own two `batch=N` dirs. A Structured-Streaming
  recovery re-invokes the same batch_id with the same data, reads
  the same pre-state, and reproduces both outputs bit-for-bit —
  same-id replay is EXACT by construction, no index needed.
* Snapshots are `_SUCCESS`-gated: a crash mid-write leaves a torn
  `batch=N` dir that no reader (processor or `scd2_dim`) ever
  selects; the recovery overwrite replaces it. foreachBatch is
  sequential, so batch N+1 cannot start before N's snapshot
  committed.
* Old snapshots are free time travel (`scd2_dim(..., batch_id=K)`
  is the dimension as of batch K — orthogonal to the row-level
  `scd2_at` time travel WITHIN a snapshot). Retention: keep at
  least the stream checkpoint horizon so a recovered batch can
  still find its pre-state.

At-least-once upstream REDELIVERY (same rows arriving under a NEW
batch_id) is the second hazard: re-applied updates are inadmissible
(their ts is ≤ the open row's valid_from) so the dimension is
idempotent, but they would land in quarantine as noise. The ECHO
FILTER drops a quarantined row when the version valid at its
timestamp already carries its compare-attributes — which is also
semantically right for a coincidental genuine late row with equal
attributes: applied in order, it would have been suppressed as
no-change anyway. Malformed NULL-ts rows never match a version and
always stay quarantined.

Dimensions are the small side by definition — snapshot-per-batch
trades bounded extra storage (dim size × retained batches) for an
exactly-once accounting story with zero swap/rename machinery.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scd import scd2_apply_with_quarantine, scd2_init


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath, jpath.getFileSystem(
        spark._jsc.hadoopConfiguration())


def committed_snapshot_ids(spark: SparkSession,
                           dim_dir: str) -> list[int]:
    """Sorted batch ids of `_SUCCESS`-committed snapshots. Torn dirs
    (crash mid-write) are invisible here and get overwritten by the
    recovered batch."""
    jvm, jpath, fs = _fs(spark, dim_dir)
    if not fs.exists(jpath):
        return []
    ids = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch="):
            ok = jvm.org.apache.hadoop.fs.Path(st.getPath(),
                                               "_SUCCESS")
            if fs.exists(ok):
                ids.append(int(name.split("=", 1)[1]))
    return sorted(ids)


def scd2_dim(spark: SparkSession, dim_dir: str,
             batch_id: int | None = None) -> DataFrame | None:
    """The committed dimension snapshot: latest by default, or the
    latest with id ≤ ``batch_id`` (dimension time travel at batch
    grain). None when nothing has committed yet."""
    ids = committed_snapshot_ids(spark, dim_dir)
    if batch_id is not None:
        ids = [i for i in ids if i <= batch_id]
    if not ids:
        return None
    return spark.read.parquet(f"{dim_dir}/batch={ids[-1]}")


def _echo_filter(quarantined: DataFrame, dim: DataFrame,
                 keys: list[str], ts_col: str,
                 cmp_cols: list[str]) -> DataFrame:
    """Drop redelivery echoes: a quarantined row whose
    compare-attributes equal the version valid at its timestamp is
    recorded history (or an in-order no-op), not a late change."""
    q = quarantined.alias("q")
    v = dim.alias("v")
    key_eq = [F.col(f"q.{k}").eqNullSafe(F.col(f"v.{k}"))
              for k in keys]
    in_interval = ((F.col(f"q.{ts_col}") >= F.col("v.valid_from"))
                   & (F.col("v.valid_to").isNull()
                      | (F.col(f"q.{ts_col}") < F.col("v.valid_to"))))
    attrs_eq = F.struct(*[F.col(f"q.{c}") for c in cmp_cols]) \
        .eqNullSafe(F.struct(*[F.col(f"v.{c}") for c in cmp_cols]))
    cond = key_eq[0]
    for c in key_eq[1:]:
        cond = cond & c
    # anti join: keep only rows with NO matching valid version —
    # both sides are small (quarantine is per-batch, dim is a
    # dimension); AQE picks the broadcast side
    return q.join(v, cond & in_interval & attrs_eq, "left_anti")


def make_scd2_batch_fn(dim_dir: str, quarantine_dir: str,
                       key_cols: Sequence[str],
                       ts_col: str = "effective_ts",
                       compare_cols: Sequence[str] | None = None
                       ) -> Callable[[DataFrame, int], None]:
    """foreachBatch processor maintaining an SCD2 dimension from a
    CDC update stream: ``stream.writeStream.foreachBatch(fn)``. The
    first non-empty batch bootstraps via `scd2_init`; later batches
    apply with quarantine, echo-filtered (see module docstring).
    Empty batches write nothing (the next batch reads past them)."""
    keys = list(key_cols)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        dim = scd2_dim(spark, dim_dir, batch_id=batch_id - 1)
        attrs = [c for c in batch_df.columns
                 if c not in keys and c != ts_col]
        cmp_cols = (list(compare_cols) if compare_cols is not None
                    else attrs)
        if dim is None:
            new_dim = scd2_init(batch_df, keys, ts_col, compare_cols)
            quarantined = None
        else:
            new_dim, quarantined = scd2_apply_with_quarantine(
                dim, batch_df, keys, ts_col, compare_cols)
            quarantined = _echo_filter(quarantined, dim, keys,
                                       ts_col, cmp_cols)
        # quarantine first: if the snapshot write below crashes, the
        # recovered batch recomputes BOTH from the same pre-state and
        # overwrites both — identical content either way
        if quarantined is not None:
            quarantined.write.mode("overwrite").parquet(
                f"{quarantine_dir}/batch={batch_id}")
        new_dim.write.mode("overwrite").parquet(
            f"{dim_dir}/batch={batch_id}")

    return process


def quarantine_log(spark: SparkSession,
                   quarantine_dir: str) -> DataFrame | None:
    """All quarantined updates across batches, with the ``batch``
    partition column — the operator-attention feed (genuinely late
    or malformed CDC rows that need an `scd2_init` rebuild decision).
    None when nothing was ever quarantined."""
    jvm, jpath, fs = _fs(spark, quarantine_dir)
    if not fs.exists(jpath):
        return None
    return (spark.read.option("basePath", quarantine_dir)
            .parquet(f"{quarantine_dir}/batch=*"))
