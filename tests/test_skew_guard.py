"""Hot-bucket skew guard (VERDICT r2 #7): a degenerate corpus of
mass-identical documents/vectors must NOT turn the LSH band joins
quadratic. Buckets wider than max_bucket switch to star pairing
against the bucket-min hub — O(m) candidates — while duplicate-cluster
connectivity (the downstream consumer) is preserved exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl___2023_spark import dedup as dd
from big_data_bowl___2023_spark.dedup.embedding import (
    _normalized,
    lsh_candidate_pairs,
)
from big_data_bowl___2023_spark.sources.io import load_table

M = 300          # identical clones — uncapped banding would emit ~M²/2
CAP = 20


def _clone_corpus(spark):
    """M identical docs + a handful of distinct ones."""
    clones = [(i, "the same exact duplicated text body repeated") for i in range(M)]
    distinct = [(M + i, f"unique document number {i} with its own words {i * 7}")
                for i in range(5)]
    return spark.createDataFrame(clones + distinct, "doc_id long, text string")


def test_minhash_star_guard_bounds_candidates(spark):
    docs = _clone_corpus(spark)
    capped = dd.minhash_band_pairs(docs, 0.5, max_bucket=CAP).cache()
    rows = capped.collect()
    # O(M) not O(M²): every clone pairs with the hub (doc 0) only.
    assert len(rows) == M - 1
    assert {(r.doc_a, r.doc_b) for r in rows} == {(0, i) for i in range(1, M)}
    assert all(r.jaccard == 1.0 for r in rows)


def test_star_guard_preserves_duplicate_clusters(spark):
    docs = _clone_corpus(spark)
    capped = dd.minhash_band_pairs(docs, 0.5, max_bucket=CAP)
    cc = dd.connected_components(capped)
    comp = {r.node: r.component for r in cc.collect()}
    # all M clones land in ONE component rooted at the hub
    assert {comp[i] for i in range(M)} == {0}
    # distinct docs never joined a cluster
    assert all(i not in comp for i in range(M, M + 5))


def test_star_guard_noop_below_cap(spark, sf_dir):
    """On a normal corpus (no bucket wider than the cap) the guarded
    plan is pair-for-pair identical to the unguarded one."""
    docs = load_table(spark, sf_dir, "documents")
    base = {(r.doc_a, r.doc_b, r.jaccard)
            for r in dd.minhash_band_pairs(docs, 0.3).collect()}
    guarded = {(r.doc_a, r.doc_b, r.jaccard)
               for r in dd.minhash_band_pairs(docs, 0.3,
                                              max_bucket=10_000).collect()}
    assert base == guarded


def test_embedding_lsh_star_guard(spark):
    """Identical vectors collide in EVERY table; the guard bounds the
    candidate set at (m-1) hub pairs per table key instead of m²/2."""
    clone = [0.5] * 8 + [-0.25] * 8
    rows = [(i, clone) for i in range(M)]
    rows += [(M + i, [float((i * 13 + d * 7) % 11 - 5) for d in range(16)])
             for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v = _normalized(emb, "embedding", "vec_id").localCheckpoint()
    cand = lsh_candidate_pairs(v, dim=16, n_tables=4, n_planes=4,
                               max_bucket=CAP).cache()
    pairs = {(r.vec_a, r.vec_b) for r in cand.collect()}
    hub_pairs = {(0, i) for i in range(1, M)}
    assert hub_pairs <= pairs
    # bounded: hub stars + whatever the 5 distinct vectors collide into,
    # nowhere near the ~45k uncapped pairs
    assert len(pairs) <= (M - 1) + 40
    full = dd.cosine_near_dup_pairs_lsh(emb, 0.99, dim=16, n_tables=4,
                                        max_bucket=CAP)
    got = full.collect()
    assert len(got) == M - 1
    assert all(r.cosine == 1.0 for r in got)
