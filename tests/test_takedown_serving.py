"""Cross-surface takedown composition (verdict r10 #7): a document
taken down via the snapshot-diff path must disappear from EVERY
serving surface at once —

* the curated-corpus read (`read_curated` tombstone anti-join,
  E117), and
* ANN / hybrid retrieval over the persistent index built from its
  embedding (`delete_from_index` markers, E120; surfaced through
  `ann_index_search` and `hybrid_topk(dense="index")`).

The glue is `apply_snapshot_diff(..., ann_index_dirs=(...,))` —
the diff's REMOVED doc ids feed `delete_from_index` inside the same
maintenance action — and this test pins that the mechanisms compose
into one compliance invariant (ingest → index → takedown → every
read excludes), including after the index compaction applies the
markers physically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.similarity import (
    ann_index_search,
    build_ann_index,
)
from big_data_bowl___2023_spark.similarity.fusion import hybrid_topk
from big_data_bowl___2023_spark.streaming import (
    apply_snapshot_diff,
    make_curation_ingest_batch_fn,
    read_curated,
)


def _doc(i):
    # distinct vocab per doc so BM25 has signal; enough words to
    # pass the gate
    return (i, "src", " ".join(
        [f"w{i}tok{j}" for j in range(8)]
        + ["common filler text segment shared by every document"]))


def _vec(i, dim=16):
    v = [0.0] * dim
    v[i % dim] = 1.0
    v[(i + 1) % dim] = 0.5
    return (i, v)


def test_takedown_reaches_curated_and_serving(spark, tmp_path):
    out = str(tmp_path / "curated")
    fp_idx = str(tmp_path / "fp_idx")
    ann_dir = str(tmp_path / "ann")

    docs = spark.createDataFrame(
        [_doc(i) for i in range(1, 7)],
        "doc_id long, source string, text string")
    emb = spark.createDataFrame(
        [_vec(i) for i in range(1, 7)],
        "doc_id long, embedding array<double>")

    # ingest, then index the curated corpus's embeddings
    make_curation_ingest_batch_fn(out, fp_idx, min_words=10)(docs, 0)
    corpus = read_curated(spark, out).join(emb, "doc_id")
    build_ann_index(corpus, ann_dir, dim=16, vec_col="embedding",
                    id_col="doc_id")

    victim = 3
    queries = (emb.filter(F.col("doc_id") == victim)
               .join(docs.select("doc_id", "text"), "doc_id")
               .select(F.col("doc_id").alias("query_id"),
                       F.col("text").alias("query_text"),
                       "embedding"))

    # pre-takedown: the victim's own vector serves it (rank 1 via
    # either surface once self-exclusion is off)
    pre = ann_index_search(spark, ann_dir, queries, 3,
                           id_col="query_id", exclude_self=False)
    assert victim in {r["neighbor_id"] for r in pre.collect()}
    pre_h = hybrid_topk(corpus, queries, k=3, dense="index",
                        index_dir=ann_dir)
    assert victim in {r["doc_id"] for r in pre_h.collect()}

    # the takedown: snapshot 2 removes the victim — ONE call
    # propagates it to the curated view AND the listed ANN index
    snap2 = docs.filter(F.col("doc_id") != victim)
    stats = apply_snapshot_diff(spark, docs, snap2, out, fp_idx,
                                batch_id=1, min_words=10,
                                ann_index_dirs=(ann_dir,))
    assert stats["removed"] == 1
    assert stats["index_deleted"] == {ann_dir: 1}

    # surface 1: the curated read hides it
    live = read_curated(spark, out)
    assert victim not in {r.doc_id for r in live.collect()}

    # surface 2: ANN search over the index hides it, ranks re-close
    post = ann_index_search(spark, ann_dir, queries, 3,
                            id_col="query_id", exclude_self=False)
    post_ids = {r["neighbor_id"] for r in post.collect()}
    assert victim not in post_ids and post_ids

    # surface 3: hybrid serving (BM25 leg fed by the LIVE curated
    # corpus, dense leg by the index) cannot name it either
    live_corpus = live.join(emb, "doc_id")
    post_h = hybrid_topk(live_corpus, queries, k=3, dense="index",
                         index_dir=ann_dir)
    assert victim not in {r["doc_id"] for r in post_h.collect()}

    # and the invariant survives the physical apply
    from big_data_bowl___2023_spark.streaming.ann_index_stream import (
        compact_index,
    )
    compact_index(spark, ann_dir)
    post_c = ann_index_search(spark, ann_dir, queries, 3,
                              id_col="query_id", exclude_self=False)
    assert victim not in {r["neighbor_id"] for r in post_c.collect()}


def test_modified_and_reverted_docs_propagate(spark, tmp_path):
    """Review r11: (a) a MODIFIED doc's old-content embedding stops
    being served (the index describes superseded text); a
    redaction-noop modification keeps serving; (b) a doc REVERTING
    to old content is restored in vector serving too — its curated
    restore never re-ingests, so only the explicit undelete path
    can drop the marker."""
    out = str(tmp_path / "curated")
    fp_idx = str(tmp_path / "fp_idx")
    ann_dir = str(tmp_path / "ann")

    docs = spark.createDataFrame(
        [_doc(i) for i in range(1, 5)],
        "doc_id long, source string, text string")
    emb = spark.createDataFrame(
        [_vec(i) for i in range(1, 5)],
        "doc_id long, embedding array<double>")
    make_curation_ingest_batch_fn(out, fp_idx, min_words=10)(docs, 0)
    corpus = read_curated(spark, out).join(emb, "doc_id")
    build_ann_index(corpus, ann_dir, dim=16, vec_col="embedding",
                    id_col="doc_id")

    def _served():
        q = (emb.select(F.col("doc_id").alias("query_id"),
                        "embedding"))
        return {r["neighbor_id"] for r in ann_index_search(
            spark, ann_dir, q, 4, id_col="query_id",
            exclude_self=False).collect()}

    assert _served() == {1, 2, 3, 4}

    # snapshot 2: doc 2 genuinely modified; doc 3 removed
    snap2 = spark.createDataFrame(
        [_doc(1),
         (2, "src", _doc(2)[2] + " a genuinely new trailing "
          "sentence with plenty of extra words"),
         _doc(4)],
        "doc_id long, source string, text string")
    stats = apply_snapshot_diff(spark, docs, snap2, out, fp_idx,
                                batch_id=1, min_words=10,
                                ann_index_dirs=(ann_dir,))
    # removed 3 + modified 2 both leave vector serving
    assert stats["index_deleted"] == {ann_dir: 2}
    assert _served() == {1, 4}

    # snapshot 3: doc 2 REVERTS to its original text — curated
    # restore + marker drop, served again without re-ingestion
    snap3 = spark.createDataFrame(
        [_doc(1), _doc(2), _doc(4)],
        "doc_id long, source string, text string")
    stats = apply_snapshot_diff(spark, snap2, snap3, out, fp_idx,
                                batch_id=2, min_words=10,
                                ann_index_dirs=(ann_dir,))
    assert stats["restored"] == 1
    assert stats["index_restored"] == {ann_dir: 1}
    assert stats["index_deleted"] == {ann_dir: 0}
    assert 2 in {r.doc_id for r in read_curated(spark, out).collect()}
    assert _served() == {1, 2, 4}


def test_reapplying_a_revert_diff_is_idempotent(spark, tmp_path):
    """Review r11 (second pass): the tombstone-pool `restored` set is
    consumed by the first application of a revert diff — a RE-APPLY
    (the documented crash-recovery procedure) classified the doc
    'modified', re-issued its index marker, and nothing could drop
    it again. The already-current rule decides from durable state,
    so every re-apply converges to the same serving set."""
    out = str(tmp_path / "curated")
    fp_idx = str(tmp_path / "fp_idx")
    ann_dir = str(tmp_path / "ann")
    docs = spark.createDataFrame(
        [_doc(i) for i in range(1, 4)],
        "doc_id long, source string, text string")
    emb = spark.createDataFrame(
        [_vec(i) for i in range(1, 4)],
        "doc_id long, embedding array<double>")
    make_curation_ingest_batch_fn(out, fp_idx, min_words=10)(docs, 0)
    build_ann_index(read_curated(spark, out).join(emb, "doc_id"),
                    ann_dir, dim=16, vec_col="embedding",
                    id_col="doc_id")

    def _served():
        q = emb.select(F.col("doc_id").alias("query_id"),
                       "embedding")
        return {r["neighbor_id"] for r in ann_index_search(
            spark, ann_dir, q, 3, id_col="query_id",
            exclude_self=False).collect()}

    snap2 = spark.createDataFrame(
        [_doc(1),
         (2, "src", _doc(2)[2] + " a genuinely new trailing "
          "sentence with plenty of extra words"),
         _doc(3)],
        "doc_id long, source string, text string")
    apply_snapshot_diff(spark, docs, snap2, out, fp_idx, batch_id=1,
                        min_words=10, ann_index_dirs=(ann_dir,))
    assert _served() == {1, 3}

    # the revert, applied THREE times (first + two recovery re-runs)
    for b in (2, 3, 4):
        stats = apply_snapshot_diff(spark, snap2, docs, out, fp_idx,
                                    batch_id=b, min_words=10,
                                    ann_index_dirs=(ann_dir,))
        assert _served() == {1, 2, 3}, f"re-apply {b} broke serving"
        assert stats["index_deleted"] == {ann_dir: 0}
    assert {r.doc_id for r in read_curated(spark, out).collect()} \
        == {1, 2, 3}
