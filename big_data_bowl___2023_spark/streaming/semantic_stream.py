"""Continuous embedding-space ingestion: the streaming face of
SemDeDup (dedup/semantic.py), mirroring the text-side curation loop
(streaming/curation.py) for vector corpora.

A production embedding corpus grows batch by batch (new documents are
embedded as they arrive); re-running whole-corpus semantic dedup per
batch is O(corpus) work per batch and — worse — RE-SHARDS the
cluster space every run, so yesterday's "kept" representative can
become today's "dropped" duplicate. The streaming contract instead
freezes the cluster boundaries once and admits greedily:

* the CODEBOOK is a versioned artifact (similarity/pq.save_codebooks)
  trained on the bootstrap corpus; every later batch assigns against
  it map-side (broadcast k×dim matrix), so cluster boundaries never
  move between batches;
* WITHIN a batch: pairs under the frozen codebook
  (:func:`pairs_with_centroids` — the semantic_dup_pairs kernel
  chain with pre-trained centroids), connected components, keep the
  min-id member per near-dup group;
* AGAINST history: ``incremental_semantic_pairs(cents=...)`` — ONE
  new×corpus equi-join on the frozen cluster id; a batch row
  matching any corpus row ≥ threshold is rejected. The corpus is
  never re-paired against itself;
* STATE lives in durable artifacts (the corpus parquet dir + the
  codebook file), not stream state — restarts, redeploys, and
  checkpoint loss cannot lose membership, exactly like the curation
  loop's fingerprint index. Replayed batches are idempotent: rows
  whose ``vec_id`` is already in the corpus are dropped by an exact
  id anti-join before any pairing.

Accepted recall trade (documented, inherent to frozen boundaries):
a near-dup pair straddling a frozen cluster boundary is not seen —
the same cross-cluster blindness as batch SemDeDup, plus drift as
the true distribution moves away from the bootstrap codebook. The
periodic batch compaction pass (a full ``semantic_dedup`` +
re-train) is the recovery mechanism, mirroring the bronze→silver
split of the text loop.

Reference scope note: north-star extension (SURVEY.md §2
extensions, E102); the reference has no streaming surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dedup.clusters import connected_components
from ..dedup.embedding import _normalized, _np_prefilter, _verify_exact
from ..dedup.minhash import band_candidates
from ..dedup.semantic import (
    assign_with_centroids,
    incremental_semantic_pairs,
    scaled_k,
)
from ..session import pin


def pairs_with_centroids(df: DataFrame, cents: list, threshold: float,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         max_bucket: int | None = None,
                         assign_kernel: str = "sql",
                         verify_kernel: str = "sql",
                         prefilter_broadcast: bool = False) -> DataFrame:
    """(vec_a, vec_b, cosine ≥ threshold), both in the same cluster
    of a PRE-TRAINED codebook — ``semantic_dup_pairs`` minus the
    Lloyd training, for callers whose cluster boundaries are a frozen
    artifact (the streaming loop; incremental re-checks). Same
    kernel-chain and guards as the batch operator: cluster-keyed band
    candidates (hot-bucket star guard via ``max_bucket``), vectorized
    einsum prefilter, exact verify on survivors."""
    v = pin(assign_with_centroids(
        _normalized(df, vec_col, id_col), cents, kernel=assign_kernel))
    cand = band_candidates(
        v.select("id", "cluster"), max_bucket,
        band_cols=("cluster",), id_col="id",
        out_cols=("vec_a", "vec_b"))
    u = v.select("id", "u")
    survivors = _np_prefilter(u, cand, threshold,
                              broadcast_vectors=prefilter_broadcast)
    return _verify_exact(u, survivors, threshold, kernel=verify_kernel)


def _read_parquet_if_present(spark: SparkSession,
                             path: str) -> DataFrame | None:
    """The corpus dir is dir-absent exactly once (bootstrap); any
    OTHER read failure must re-raise — a transient error treated as
    'no corpus' would re-bootstrap and admit every duplicate (the
    round-8 bloom-dir lesson, applied here from the start)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    return spark.read.parquet(path)


def make_semantic_ingest_batch_fn(out_dir: str, codebook_path: str,
                                  threshold: float,
                                  vec_col: str = "embedding",
                                  id_col: str = "vec_id",
                                  dim: int = 64,
                                  n_iters: int = 4,
                                  target_cluster: int = 250,
                                  max_bucket: int | None = None,
                                  max_cluster: int | None = None,
                                  assign_kernel: str = "sql",
                                  verify_kernel: str = "sql",
                                  prefilter_broadcast: bool = False):
    """The continuous-ingestion LOOP for an embedding corpus: a
    ``foreachBatch`` function that semantically dedups each
    micro-batch — within itself AND against the accumulated corpus —
    under a FROZEN codebook, then appends the survivors to
    ``out_dir``. The first batch bootstraps: it is deduped against
    itself (training its own codebook at ``scaled_k`` of the batch),
    the codebook is saved to ``codebook_path``, and its survivors
    seed the corpus. Returns the function for
    ``stream.writeStream.foreachBatch(...)`` — also directly callable
    with (batch_df, batch_id) for batch backfills.

    Kernel kwargs (``assign_kernel``/``verify_kernel``/
    ``prefilter_broadcast``) forward to every pairing stage — the
    corpus-scale settings; ``max_cluster`` is the mass-duplicate
    guard on the corpus side of the cross join (see
    ``incremental_semantic_pairs``)."""
    from ..similarity.pq import load_codebooks, save_codebooks, train_pq

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        corpus = _read_parquet_if_present(spark, out_dir)

        if corpus is None:
            # bootstrap: train THE codebook on the first batch and
            # resolve its internal near-dups under it. Codebook goes
            # to disk FIRST: a crash between the two writes then
            # leaves a codebook with no corpus (harmless — the next
            # attempt re-bootstraps and overwrites it), never a
            # corpus with no codebook (which would retrain on batch
            # 2 and silently move every frozen boundary).
            n = batch_df.count()
            cents = train_pq(batch_df, vec_col=vec_col, id_col=id_col,
                             dim=dim, m=1,
                             k=scaled_k(n, target_cluster),
                             n_iters=n_iters,
                             assign_kernel=assign_kernel)[0]
            save_codebooks(spark, [cents], codebook_path)
            survivors = _drop_within_batch(batch_df, cents)
            survivors.write.mode("append").parquet(out_dir)
            return

        cents = load_codebooks(spark, codebook_path)[0]
        # replay idempotency: an already-ingested id is dropped
        # exactly (same contract as the curation loop's fingerprint
        # index), which also enforces incremental_semantic_pairs'
        # disjoint-id precondition
        fresh = pin(batch_df.join(
            corpus.select(id_col), id_col, "left_anti"))
        cross = incremental_semantic_pairs(
            fresh, corpus, threshold, vec_col=vec_col, id_col=id_col,
            dim=dim, cents=cents, max_cluster=max_cluster,
            assign_kernel=assign_kernel, verify_kernel=verify_kernel,
            prefilter_broadcast=prefilter_broadcast)
        rejected = cross.select(
            F.col("vec_new").alias(id_col)).distinct()
        novel = fresh.join(rejected, id_col, "left_anti")
        survivors = _drop_within_batch(novel, cents)
        survivors.write.mode("append").parquet(out_dir)

    def _drop_within_batch(df: DataFrame, cents: list) -> DataFrame:
        """Resolve near-dups INSIDE one batch under the frozen
        codebook: pairs → connected components → keep each group's
        min-id member (identical keeper rule to batch
        ``semantic_dedup``)."""
        pairs = pairs_with_centroids(
            df, cents, threshold, vec_col, id_col,
            max_bucket=max_bucket, assign_kernel=assign_kernel,
            verify_kernel=verify_kernel,
            prefilter_broadcast=prefilter_broadcast)
        comp = connected_components(pairs, "vec_a", "vec_b")
        drop = (comp.filter(F.col("node") != F.col("component"))
                .select(F.col("node").alias(id_col)))
        return df.join(drop, id_col, "left_anti")

    return process
