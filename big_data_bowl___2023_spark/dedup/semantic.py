"""SemDeDup-style semantic deduplication.

The embedding-space dedup used for web-scale LLM corpora (Abbas et
al., "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", 2023): k-means-cluster the normalized embeddings,
compare pairs ONLY within a cluster, and drop all but one
representative of each near-duplicate group. Cross-cluster pairs are
the accepted recall cost — the point is that per-cluster work is
(n/k)² instead of n², and clusters shard perfectly across executors.

Composition over existing engine pieces (nothing new to verify at
the kernel level):

* centroids: ``similarity.pq.train_pq`` with m=1 — the distributed
  Lloyd trainer degenerates to full-vector k-means (deterministic
  md5-seeded init, one aggregation job per iteration, O(k·dim)
  driver state);
* assignment: one scan — the pq argmin expressions by default
  (bit-pinned fold arithmetic), or ``assign_kernel="arrow"`` for a
  GEMM-per-Arrow-batch argmin, the corpus-scale setting;
* within-cluster candidates: ``minhash.band_candidates`` on the
  cluster id, so the mass-duplicate pathology is bounded by the same
  hot-bucket star guard as the LSH paths (``max_bucket``);
* candidate screening: the vectorized ``embedding._np_prefilter``
  (one einsum per Arrow batch over the raw within-cluster pairs, AQE
  joins) — the raw candidate volume is ~target_cluster/2 rows PER
  corpus vector, linear in n, so it must never be broadcast;
* verification: the exact kernel (``embedding._verify_exact``) over
  the near-output-sized prefilter survivors — precision 1.0; the
  default fold arithmetic is identical to the exact near-dup paths,
  ``verify_kernel="arrow"`` is the einsum batch variant for corpus
  runs;
* keeper choice: ``clusters.connected_components`` + min-id
  canonicalization, identical to the MinHash dedup flow.

Reference scope note: north-star extension (SURVEY.md §2 extensions,
inventory E57); the reference has no corpus operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clusters import connected_components
from .embedding import _normalized, _np_prefilter, _verify_exact
from .minhash import band_candidates
from ..functions import vectors as V
from ..session import pin, resolve_kernel


def scaled_k(n: int, target_cluster: int = 250) -> int:
    """Clusters so the mean population ≈ target_cluster: within-
    cluster pair work is Σ(n/k)²·k = n²/k, so holding n/k constant
    keeps it LINEAR in n — the SemDeDup paper's ~100k clusters for
    web scale is this same rule. Mirrors ``scaled_n_planes`` /
    ``scaled_n_blocks``: callers never tune it."""
    return max(4, -(-max(1, n) // target_cluster))


def kmeans_assign(df: DataFrame, k: int = 16, n_iters: int = 4,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id",
                  dim: int | None = None,
                  codegen_max_k: int = 64,
                  n: int | None = None,
                  assign_kernel: str | None = None) -> DataFrame:
    """(id, u, cluster): full-vector k-means assignment.

    Training is ``train_pq(m=1)`` (deterministic seeds, Lloyd rounds
    as single aggregation jobs over a capped training sample, exact-
    fixpoint early stop). ``n`` is the optional corpus-rowcount hint
    that lets training skip the sample stage when the corpus already
    fits the cap (see train_pq). ``assign_kernel="arrow"`` selects
    the GEMM kernels for BOTH the Lloyd rounds and the final
    assignment scan — at SemDeDup-sized k the interpreted fold
    trainer dominates the whole operator, so the corpus-scale
    setting must cover it.
    Assignment picks its physical shape by ``k``:

    * k ≤ ``codegen_max_k``: the literal-centroid argmin expression
      the PQ encoder uses — pure whole-stage codegen, zero joins;
    * k > ``codegen_max_k``: broadcast-replicate against a k-row
      centroid table + map-side ``min_by`` fold. A thousand-literal
      argmin would blow past the JVM codegen method-size limits that
      `scaled_k` reaches on large corpora; the replicate path keeps
      the per-row k·dim distance work but streams it, and the
      groupBy(id) collapses map-side (replication preserves row
      locality) so the exchange carries one row per vector."""
    from ..similarity.pq import train_pq

    v = _normalized(df, vec_col, id_col)
    if dim is None:   # one probe job; pass dim to skip it
        dim = len(v.select("u").first().u)
    # assign_kernel covers the Lloyd rounds too: SemDeDup-sized k
    # (n/target_cluster) makes the fold trainer the bottleneck long
    # before the assignment scan — see train_pq's kernel note
    cents = train_pq(df, vec_col=vec_col, id_col=id_col, dim=dim,
                     m=1, k=k, n_iters=n_iters, n=n,
                     assign_kernel=assign_kernel,
                     lloyd=_lloyd_tier(assign_kernel))[0]
    return assign_with_centroids(v, cents, codegen_max_k,
                                 kernel=assign_kernel)


def _lloyd_tier(assign_kernel: str | None) -> str:
    """The semantic family's Lloyd-tier rule (r17): callers that
    chose the arrow kernels already accepted last-ulp reassociation
    (every GEMM/einsum kernel's documented contract), so their
    capped-sample training runs as the driver numpy loop — removing
    seeds-collect + sample-pin + one Spark job per Lloyd round of
    pure fixed latency. The "sql" kernel keeps the distributed
    aggregation whose arithmetic the bit-pinned oracle paths fold."""
    return "driver" if resolve_kernel(assign_kernel,
                                      "assignment") == "arrow" \
        else "spark"


def assign_with_centroids(v: DataFrame, cents: list,
                          codegen_max_k: int = 64,
                          kernel: str | None = None) -> DataFrame:
    """(id, u, cluster) for PRE-TRAINED centroids — the assignment
    half of kmeans_assign, reusable when the codebook is an artifact
    (incremental ingest assigns new batches against the corpus's
    frozen centroids so cluster boundaries never move between runs).

    ``kernel`` picks the per-row argmin implementation:

    * ``"sql"`` (default) — the literal-argmin / broadcast-join
      expressions. Exact, bit-pinned arithmetic (the fold order every
      oracle in the suite pins), but zip_with/aggregate are
      CodegenFallback: Spark evaluates them INTERPRETED, one lambda
      step per element per centroid — fine for bounded corpora, a
      100-1000x constant-factor tax on a full-corpus scan.
    * ``"arrow"`` — one numpy GEMM per Arrow batch
      (``argmin(|c|^2 - 2 u.c)``; ``|u|^2`` is row-constant and
      dropped). The corpus-scale assignment path: the per-row cost is
      a few fused flops instead of interpreted lambda dispatch, and
      the broadcast is the k x dim centroid matrix (measured: 100k
      vectors x k=200 x dim=64 assign in 0.9 s vs 16.8 s through the
      SQL fold on local[16] — ~19x, growing with k). Ties still break
      to the lowest code (numpy argmin returns the first minimum).
      Distances round differently in the last ulp than the
      sequential SQL fold, so a vector EXACTLY equidistant to two
      centroids in one arithmetic but not the other could flip — for
      real-valued embeddings the paths agree exactly (pytest pins
      agreement on the test corpora); defaults stay "sql" so every
      hash-pinned output is byte-stable."""
    kernel = resolve_kernel(kernel, "assignment")
    if kernel == "arrow":
        return _assign_arrow(v, cents)
    if kernel != "sql":
        raise ValueError(f"unknown assignment kernel {kernel!r}")
    from ..similarity.pq import _argmin_code

    if len(cents) <= codegen_max_k:
        return v.withColumn("cluster", _argmin_code(F.col("u"), cents))
    return _assign_by_join(v, cents)


def _assign_arrow(v: DataFrame, cents: list) -> DataFrame:
    """Vectorized nearest-centroid assignment: per Arrow batch, one
    (batch x dim) @ (dim x k) matrix product + row argmin. Same
    shape as the GEMM dedup prefilters — numpy does the O(n*k*dim)
    flops, Spark does the distribution."""
    from pyspark.sql import types as T
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    C = np.asarray([[float(x) for x in c] for c in cents],
                   dtype=np.float64)                  # (k, dim)
    half_c2 = 0.5 * (C * C).sum(axis=1)               # (k,)
    out_schema = T.StructType(
        list(v.schema) + [T.StructField("cluster", T.IntegerType())])

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            U = V.stack_batch(pdf["u"])
            # argmin_j |u-c_j|^2 == argmin_j (|c_j|^2/2 - u.c_j)
            scores = half_c2[None, :] - U @ C.T       # (n, k)
            out = pdf.copy()
            out["cluster"] = np.argmin(scores, axis=1).astype("int32")
            yield out

    return v.mapInPandas(assign, out_schema)


def _assign_by_join(v: DataFrame, cents: list) -> DataFrame:
    """(id, u, cluster) via a broadcast centroid table: deterministic
    (ties break to the lowest code, matching _argmin_code's
    array_position-of-min semantics). The crossJoin is the deliberate
    broadcast-replicate idiom (same as the salt replication in
    operators/joins.py) — an inner NLJ whose build side is the k-row
    table, NOT a corpus×corpus blowup."""
    from ..similarity.pq import _sq_dist

    spark = v.sparkSession
    cdf = spark.createDataFrame(
        [(j, [float(x) for x in c]) for j, c in enumerate(cents)],
        "code int, cent array<double>")
    joined = v.crossJoin(F.broadcast(cdf))
    d = _sq_dist(F.col("u"), F.col("cent"))
    return (joined
            .select("id", "u", F.col("code"), d.alias("__d"))
            .groupBy("id")
            .agg(F.first("u").alias("u"),
                 F.min_by("code", F.struct("__d", "code"))
                  .alias("cluster")))


def semantic_dup_pairs(df: DataFrame, threshold: float,
                       k: int | None = None,
                       n_iters: int = 4, vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       max_bucket: int | None = None,
                       target_cluster: int = 250,
                       dim: int | None = None,
                       n: int | None = None,
                       assign_kernel: str | None = None,
                       verify_kernel: str | None = None,
                       prefilter_broadcast: bool | str = "auto"
                       ) -> DataFrame:
    """(vec_a, vec_b, cosine) with cosine ≥ threshold, both members
    of the same k-means cluster. Precision 1.0 (every pair exactly
    verified); recall < 1 only through cluster-boundary splits — the
    SemDeDup contract. Candidates come from a cluster-keyed
    band join with the hot-bucket star guard available, so even a
    corpus collapsing into one cluster stays O(m) candidates when
    ``max_bucket`` is set. ``k`` defaults to ``scaled_k`` of the
    corpus count, holding mean cluster population ~target_cluster so
    total pair work stays linear in n. ``n``/``dim`` hints skip the
    two driver-side probe jobs (a count and a first) when the caller
    already knows them — the bench and pipeline paths always do.
    ``assign_kernel="arrow"`` swaps the per-vector argmin scan for
    the GEMM-per-Arrow-batch kernel (see ``assign_with_centroids``)
    and ``verify_kernel="arrow"`` swaps the per-survivor interpreted
    verify fold for the einsum batch kernel
    (``embedding._verify_exact``) — together the corpus-scale
    setting; both default to the bit-pinned SQL folds so the driver
    hashes stay byte-stable. ``prefilter_broadcast="auto"``
    (default) picks the candidate screen's scale-safe mode by a
    counted corpus size (``embedding._np_prefilter``) — the mode
    choice never changes the emitted pairs."""
    from ..similarity.pq import train_pq

    if k is None:
        if n is None:
            n = df.count()
        k = scaled_k(n, target_cluster)
    if dim is None:   # one probe job; pass dim to skip it
        dim = len(_normalized(df, vec_col, id_col)
                  .select("u").first().u)
    # NOTE: the corpus-count hint is deliberately NOT forwarded to
    # train_pq here: skipping the cap's TakeOrdered+repartition makes
    # centroid float sums depend on the input's physical partitioning,
    # and this operator pins partitioning-invariant output (the same
    # property its sibling ops test). Callers that accept layout-
    # dependent (still deterministic-per-layout) centroids can call
    # kmeans_assign(..., n=...) themselves. The arrow-kernel driver
    # Lloyd tier (_lloyd_tier) is partitioning-invariant by
    # construction (md5-sorted sample, deterministic numpy sums).
    cents = train_pq(df, vec_col=vec_col, id_col=id_col, dim=dim,
                     m=1, k=k, n_iters=n_iters,
                     assign_kernel=assign_kernel,
                     lloyd=_lloyd_tier(assign_kernel))[0]
    return pairs_with_centroids(df, cents, threshold, vec_col, id_col,
                                max_bucket=max_bucket,
                                assign_kernel=assign_kernel,
                                verify_kernel=verify_kernel,
                                prefilter_broadcast=prefilter_broadcast,
                                n=n)


def pairs_with_centroids(df: DataFrame, cents: list, threshold: float,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         max_bucket: int | None = None,
                         assign_kernel: str | None = None,
                         verify_kernel: str | None = None,
                         prefilter_broadcast: bool | str = "auto",
                         broadcast_handle: list | None = None,
                         n: int | None = None) -> DataFrame:
    """(vec_a, vec_b, cosine ≥ threshold), both in the same cluster
    of a PRE-TRAINED codebook — ``semantic_dup_pairs`` minus the
    Lloyd training (and exactly what that operator now composes over
    its freshly-trained centroids, so there is ONE candidate→
    prefilter→verify chain to maintain). Direct callers are the
    frozen-boundary paths: the streaming ingest loop and incremental
    re-checks against a codebook artifact.

    The raw within-cluster pair set is ~cluster/2 rows per corpus
    vector — LINEAR in n, so it flows through the vectorized
    prefilter first (AQE joins, einsum screening; hot-bucket star
    guard via ``max_bucket``); only the near-output-sized survivors
    reach the exact verify, whose "auto" mode buys its broadcast
    with an actual row count. ``prefilter_broadcast`` picks the
    screen's vector access — ``"auto"`` (default) gathers the unit
    matrix when a corpus count proves it worker-memory-sized
    (id-pairs-only shuffle; see ``_np_prefilter``), else the AQE
    join; ``True``/``False`` force a mode. ``n`` is the optional
    corpus-count hint that skips the deciding count (cheap here
    anyway — the assigned table is pinned). ``broadcast_handle``
    forwards to the gather so loops can free its broadcast eagerly."""
    v = pin(assign_with_centroids(
        _normalized(df, vec_col, id_col), cents,
        kernel=assign_kernel))
    cand = band_candidates(
        v.select("id", "cluster"), max_bucket,
        band_cols=("cluster",), id_col="id",
        out_cols=("vec_a", "vec_b"))
    u = v.select("id", "u")
    survivors = _np_prefilter(u, cand, threshold,
                              broadcast_vectors=prefilter_broadcast,
                              broadcast_handle=broadcast_handle,
                              n_vectors=n)
    # broadcast_candidates=False (r17): the screen's survivors feed
    # exactly ONE join chain — "auto"'s pin + count jobs buy nothing
    # (round-7 evidence, see cosine_near_dup_pairs); AQE makes the
    # same broadcast decision from runtime stats and degrades to a
    # shuffle join on a mass-dup corpus instead of OOMing.
    return _verify_exact(u, survivors, threshold,
                         broadcast_candidates=False,
                         kernel=verify_kernel)


def keep_min_per_component(df: DataFrame, pairs: DataFrame,
                           id_col: str) -> DataFrame:
    """The shared keeper rule: connected near-dup groups collapse to
    their min-id member; everything unpaired passes through. One
    definition for batch ``semantic_dedup`` and the streaming ingest
    loop, so the keeper semantics cannot drift."""
    comp = connected_components(pairs, "vec_a", "vec_b")
    drop = (comp.filter(F.col("node") != F.col("component"))
            .select(F.col("node").alias(id_col)))
    return df.join(drop, id_col, "left_anti")


def incremental_semantic_pairs(new_emb: DataFrame, corpus: DataFrame,
                               threshold: float,
                               k: int | None = None,
                               n_iters: int = 4,
                               vec_col: str = "embedding",
                               id_col: str = "vec_id",
                               target_cluster: int = 250,
                               dim: int | None = None,
                               n_corpus: int | None = None,
                               cents: list | None = None,
                               max_cluster: int | None = None,
                               assign_kernel: str | None = None,
                               verify_kernel: str | None = None,
                               prefilter_broadcast: bool | str = "auto",
                               broadcast_handle: list | None = None
                               ) -> DataFrame:
    """(vec_new, vec_corpus, cosine ≥ threshold): semantic near-dups
    between an ingest batch and the existing corpus WITHOUT re-pairing
    the corpus against itself — the SemDeDup analogue of
    ``streaming.incremental_minhash_pairs``.

    Centroids train on the CORPUS only, so cluster boundaries are a
    frozen artifact as batches arrive — pass ``cents`` (a single
    codebook: ``load_codebooks(spark, path)[0]`` for the m=1
    artifacts this path saves) to assign against the persisted
    codebook of the last full run; the Lloyd rounds here are only the
    bootstrap path. Both sides assign map-side against the broadcast
    centroids; candidates are ONE new×corpus equi-join on the cluster
    id (join strategy left to AQE — the candidate volume is data-
    dependent, so it is NOT force-broadcast); exact fold verification
    touches candidates only. Corpus×corpus pair work is zero by
    construction; new×new dups within the batch are
    ``semantic_dup_pairs`` over the (small) batch, mirroring the
    MinHash incremental contract.

    ``max_cluster`` is the mass-duplicate guard (the cross-side
    analogue of the batch path's hot-bucket star guard): a corpus
    cluster holding more than ``max_cluster`` members contributes
    only its min-id member to pairing — on a degenerate corpus the
    candidate volume stays O(n_new) instead of n_new × cluster, and
    a new doc matching the (mutually near-identical) mass cluster
    still surfaces via the hub. Default None = exact, like the batch
    default.

    Caller contract: new and corpus id spaces are disjoint (ingest
    ids are monotone in practice); a shared id would be dropped by
    the inequality guard rather than verified.

    ``assign_kernel``/``verify_kernel`` = "arrow" select the GEMM/
    einsum batch kernels for the two per-row/per-pair vector stages
    (see ``assign_with_centroids`` / ``embedding._verify_exact``).
    ``prefilter_broadcast`` routes the raw cluster-join candidates
    through the einsum screen FIRST (``_np_prefilter``:
    near-output-sized survivors reach the verify joins): ``"auto"``
    (default) screens via the gathered matrix when a counted corpus
    size proves it worker-memory-sized (id-pairs-only shuffle) and
    via the AQE join past the ceiling — the deciding count is the
    raw corpus parquet count (footer metadata, no scan) plus one
    batch count unless ``n_corpus`` already carries it; ``True``
    forces the gather; ``False`` skips the screen entirely (the
    single-join-chain plan the oracles pinned through round 9).
    Screen and mode never change the emitted pairs — the margin
    screen only removes pairs the verify would reject."""
    from ..similarity.pq import train_pq

    vc = _normalized(corpus, vec_col, id_col)
    if cents is None:
        if k is None:
            if n_corpus is None:
                n_corpus = corpus.count()
            k = scaled_k(n_corpus, target_cluster)
        if dim is None:
            dim = len(vc.select("u").first().u)
        cents = train_pq(corpus, vec_col=vec_col, id_col=id_col,
                         dim=dim, m=1, k=k, n_iters=n_iters,
                         assign_kernel=assign_kernel,
                         lloyd=_lloyd_tier(assign_kernel))[0]
    ac = assign_with_centroids(vc, cents, kernel=assign_kernel)
    an = assign_with_centroids(_normalized(new_emb, vec_col, id_col),
                               cents, kernel=assign_kernel)
    corpus_side = ac.select(F.col("id").alias("vec_b"), "cluster")
    if max_cluster is not None:
        from pyspark.sql import Window
        w = Window.partitionBy("cluster")
        corpus_side = (corpus_side
                       .withColumn("__cn", F.count(F.lit(1)).over(w))
                       .withColumn("__min", F.min("vec_b").over(w))
                       .filter((F.col("__cn") <= max_cluster)
                               | (F.col("vec_b") == F.col("__min")))
                       .drop("__cn", "__min"))
    cand = (an.select(F.col("id").alias("vec_a"), "cluster")
            .join(corpus_side, "cluster")
            .filter(F.col("vec_a") != F.col("vec_b"))
            .select("vec_a", "vec_b"))
    # ids are disjoint by contract — plain union, no dedup shuffle of
    # the (wide) vector payload.
    v_all = an.select("id", "u").unionByName(ac.select("id", "u"))
    if prefilter_broadcast:          # "auto" or True; False = no screen
        # screen the (linear-in-batch but vector-heavy if joined)
        # candidate volume before any verify join — the batch path's
        # prefilter. "auto" buys its gather with counts that avoid
        # re-running the assignment lineage: the RAW corpus count
        # (parquet footer metadata in the streaming loop) plus one
        # count of the (pinned there) batch side.
        n_hint = None
        if prefilter_broadcast == "auto":
            nc = n_corpus if n_corpus is not None else corpus.count()
            n_hint = nc + new_emb.count()
        cand = _np_prefilter(v_all, cand, threshold,
                             broadcast_vectors=prefilter_broadcast,
                             broadcast_handle=broadcast_handle,
                             n_vectors=n_hint)
    return (_verify_exact(v_all, cand, threshold,
                          broadcast_candidates=False,
                          kernel=verify_kernel)
            .select(F.col("vec_a").alias("vec_new"),
                    F.col("vec_b").alias("vec_corpus"), "cosine"))


def semantic_dedup(df: DataFrame, threshold: float,
                   k: int | None = None,
                   n_iters: int = 4, vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   max_bucket: int | None = None,
                   dim: int | None = None,
                   n: int | None = None,
                   assign_kernel: str | None = None,
                   verify_kernel: str | None = None,
                   prefilter_broadcast: bool | str = "auto"
                   ) -> DataFrame:
    """The rows of ``df`` that survive semantic dedup: for every
    connected group of within-cluster near-duplicates, the min-id
    member is kept; all other rows pass through untouched.
    ``assign_kernel``/``verify_kernel`` = "arrow" are the
    corpus-scale kernel settings (forwarded to
    ``semantic_dup_pairs``); value defaults stay the bit-pinned SQL
    folds. ``prefilter_broadcast="auto"`` (default) picks the
    scale-safe candidate screen by a counted corpus size — see
    ``embedding._np_prefilter``; mode never changes the kept rows."""
    pairs = semantic_dup_pairs(df, threshold, k, n_iters,
                               vec_col, id_col, max_bucket,
                               dim=dim, n=n,
                               assign_kernel=assign_kernel,
                               verify_kernel=verify_kernel,
                               prefilter_broadcast=prefilter_broadcast)
    return keep_min_per_component(df, pairs, id_col)
