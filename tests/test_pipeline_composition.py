"""End-to-end composition: the operators chain the way a curation
pipeline actually uses them — features → dedup → similarity — with
each stage consuming the previous stage's DataFrame (no
materialization boundaries, one Catalyst plan per action)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl___2023_spark import dedup as dd
from big_data_bowl___2023_spark.functions import text as Tx
from big_data_bowl___2023_spark.similarity import brute_force_topk
from big_data_bowl___2023_spark.sources.io import load_table


def test_curation_pipeline_composes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. Quality gate: keep docs above a quality floor.
    kept = docs.filter(Tx.quality_score(F.col("text")) > 0.2)
    assert 0 < kept.count() < docs.count()

    # 2. Exact dedup ON the filtered frame (stage chaining).
    deduped = dd.exact_dedup(kept)
    assert deduped.count() <= kept.count()

    # 3. Near-dup pairs among survivors only.
    pairs = dd.minhash_band_pairs(deduped, 0.3)
    surviving_ids = {r.doc_id for r in deduped.select("doc_id").collect()}
    for r in pairs.select("doc_a", "doc_b").collect():
        assert r.doc_a in surviving_ids and r.doc_b in surviving_ids

    # 4. ANN over embeddings of surviving docs (doc_id == vec_id in
    #    the fixtures' id space at equal SF).
    sub = emb.join(deduped.select(F.col("doc_id").alias("vec_id")),
                   "vec_id", "left_semi")
    queries = sub.limit(3)
    topk = brute_force_topk(sub, queries, 3)
    per_q = topk.groupBy("query_id").count().collect()
    assert per_q and all(r["count"] <= 3 for r in per_q)
