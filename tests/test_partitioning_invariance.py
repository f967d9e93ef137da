"""Determinism under re-partitioning: the same logical input split
differently across tasks must produce identical results. This is the
local proxy for the 1000-executor question — any operator that
depends on partition layout (unordered windows, non-associative
accumulation, first-wins races) fails here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl___2023_spark import dedup as dd
from big_data_bowl___2023_spark.operators import windows as win
from big_data_bowl___2023_spark.sources.io import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_pairs_invariant_to_partitioning(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = _rows(dd.minhash_band_pairs(docs, 0.3))
    shuffled = _rows(dd.minhash_band_pairs(docs.repartition(13), 0.3))
    assert base == shuffled


def test_embedding_pairs_invariant_to_partitioning(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    base = _rows(dd.cosine_near_dup_pairs(emb, 0.4))
    shuffled = _rows(dd.cosine_near_dup_pairs(emb.repartition(7), 0.4))
    assert base == shuffled


def test_window_lag_invariant_to_partitioning(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = win.ordered_window(["user_id"], ["ts", "event_id"])
    out = lambda df: _rows(
        win.lag_delta(df, "value", w, "d")
        .select("event_id", F.round("d", 6).alias("d")))
    assert out(ev) == out(ev.repartition(17))


def test_simhash_hamming_invariant_to_partitioning(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    from big_data_bowl___2023_spark.dedup.simhash import hamming_pairs
    base = _rows(hamming_pairs(docs, 6))
    shuffled = _rows(hamming_pairs(docs.repartition(11), 6))
    assert base == shuffled
