"""Streaming ANN index maintenance (streaming/ann_index_stream.py).

Contracts under test:
* the foreachBatch loop (bootstrap build + appends) yields search
  results identical to a one-shot batch build over the same rows;
* factory args are only a bootstrap default — an existing index's
  recorded planes win on restart with different args;
* at-least-once replay is result-exact: double-appended rows never
  change a search (and compaction with dedupe reclaims them);
* compaction shrinks per-cell file counts without changing results;
* a real availableNow file-stream run matches the batch oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.similarity import (
    ann_index_search,
    build_ann_index,
)
from big_data_bowl___2023_spark.sources.io import load_table
from big_data_bowl___2023_spark.streaming.ann_index_stream import (
    compact_index,
    make_ann_index_batch_fn,
)


def _topk(spark, idx, queries):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in ann_index_search(spark, idx, queries, 5).collect())


def test_batch_loop_equals_oneshot_build(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    idx, ref = str(tmp_path / "stream_idx"), str(tmp_path / "ref_idx")
    fn = make_ann_index_batch_fn(idx)
    fn(emb.filter(F.col("vec_id") % 3 == 0), 0)    # bootstrap build
    fn(emb.filter(F.col("vec_id") % 3 == 1), 1)    # appends
    fn(emb.filter(F.col("vec_id") % 3 == 2), 2)
    fn(emb.filter(F.lit(False)), 3)                # empty: no-op
    build_ann_index(emb, ref)
    assert _topk(spark, idx, queries) == _topk(spark, ref, queries)


def test_existing_planes_win_over_factory_args(spark, sf_dir,
                                               tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "idx")
    fn = make_ann_index_batch_fn(idx, n_planes=3)
    fn(emb.filter(F.col("vec_id") % 2 == 0), 0)
    # a restarted stream with DIFFERENT factory args must not fork
    # the cell geometry: the meta's recorded planes rule
    fn2 = make_ann_index_batch_fn(idx, n_planes=5)
    fn2(emb.filter(F.col("vec_id") % 2 == 1), 1)
    meta = spark.read.parquet(f"{idx}/_index_meta").collect()
    assert [(r["dim"], r["n_planes"]) for r in meta] == [(64, 3)]
    ref = str(tmp_path / "ref")
    build_ann_index(emb, ref, n_planes=3)
    queries = emb.filter(F.col("vec_id") < 10)
    assert _topk(spark, idx, queries) == _topk(spark, ref, queries)


def test_replay_is_result_exact_and_compaction_reclaims(
        spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "idx")
    fn = make_ann_index_batch_fn(idx)
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    fn(b1, 0)
    fn(b2, 1)
    before = _topk(spark, idx, queries)
    fn(b2, 1)                       # crash-replay double-append
    assert _topk(spark, idx, queries) == before
    n_rows_dup = spark.read.parquet(f"{idx}/cells").count()
    rep = compact_index(spark, idx, dedupe=True)
    assert rep["cells"] >= 1 and rep["files_after"] <= rep["files_before"]
    n_rows = spark.read.parquet(f"{idx}/cells").count()
    assert n_rows == emb.count() < n_rows_dup
    assert _topk(spark, idx, queries) == before
    with pytest.raises(ValueError, match="no index cells"):
        compact_index(spark, str(tmp_path / "nope"))


def test_real_stream_availablenow(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings").limit(500)
    src = str(tmp_path / "vec_src")
    emb.write.parquet(src)
    idx = str(tmp_path / "idx")
    stream = spark.readStream.schema(emb.schema).parquet(src)
    q = (stream.writeStream
         .foreachBatch(make_ann_index_batch_fn(idx))
         .trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.awaitTermination(120)
    ref = str(tmp_path / "ref")
    build_ann_index(emb, ref)
    queries = emb.filter(F.col("vec_id") < 5)
    assert _topk(spark, idx, queries) == _topk(spark, ref, queries)


def test_crash_stranded_swap_is_healed(spark, sf_dir, tmp_path):
    """A compaction killed between its two renames leaves cell=X
    MISSING with the data at cell=X__compact_old — a pruned search
    would silently lose that cell. compact_index must restore it
    (and clear staging leftovers / stale backups) before compacting."""
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "idx")
    build_ann_index(emb, idx)
    before = _topk(spark, idx, queries)
    cells = f"{idx}/cells"
    victim = next(d for d in os.listdir(cells)
                  if d.startswith("cell="))
    # simulate the mid-swap crash: live dir renamed away, tmp left
    os.rename(f"{cells}/{victim}", f"{cells}/{victim}__compact_old")
    os.makedirs(f"{cells}/{victim}__compact_tmp")
    rep = compact_index(spark, idx)
    assert rep["cells"] >= 1
    assert os.path.isdir(f"{cells}/{victim}")
    assert not os.path.exists(f"{cells}/{victim}__compact_old")
    assert not os.path.exists(f"{cells}/{victim}__compact_tmp")
    spark.catalog.refreshByPath(cells)
    assert _topk(spark, idx, queries) == before
