"""Incremental tokenizer artifacts (E107): word-frequency merge law,
incremental-training identity, and subword-drift PSI parity with the
drift operator's categorical convention."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.functions import bpe
from big_data_bowl___2023_spark.operators.drift import (
    psi_report_categorical,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF}/documents.parquet")
                 .orderBy("doc_id").limit(120).cache())


def _freqs(df):
    return {r["word"]: int(r["n"]) for r in df.collect()}


def test_merge_law_disjoint_batches_equal_whole_corpus(spark, docs):
    whole = bpe.word_frequencies(docs)
    b1 = bpe.word_frequencies(docs.filter(F.col("doc_id") % 3 == 0))
    b2 = bpe.word_frequencies(docs.filter(F.col("doc_id") % 3 == 1))
    b3 = bpe.word_frequencies(docs.filter(F.col("doc_id") % 3 == 2))
    merged = bpe.merge_word_frequencies(b1, b2, b3)
    assert _freqs(merged) == _freqs(whole)
    with pytest.raises(ValueError):
        bpe.merge_word_frequencies()


def test_merge_handles_overlapping_vocabulary(spark):
    a = spark.createDataFrame([("x", 3), ("y", 1)], ["word", "n"])
    b = spark.createDataFrame([("x", 2), ("z", 5)], ["word", "n"])
    got = _freqs(bpe.merge_word_frequencies(a, b))
    assert got == {"x": 5, "y": 1, "z": 5}


def test_incremental_training_identity(spark, docs, tmp_path):
    """Train on merged per-batch artifacts (round-tripped through
    parquet) == train on the whole corpus, merge for merge."""
    whole_merges = bpe.train_bpe(bpe.word_frequencies(docs),
                                 num_merges=80).collect()
    paths = []
    for i in range(3):
        p = str(tmp_path / f"wf_{i}.parquet")
        bpe.word_frequencies(
            docs.filter(F.col("doc_id") % 3 == i)).write.parquet(p)
        paths.append(p)
    merged = bpe.merge_word_frequencies(
        *[spark.read.parquet(p) for p in paths])
    inc_merges = bpe.train_bpe(merged, num_merges=80).collect()
    key = lambda r: r["rank"]
    assert sorted(inc_merges, key=key) == sorted(whole_merges, key=key)


def test_token_drift_parity_with_drift_operator(spark, docs):
    """token_drift over count tables == psi_report_categorical over
    the exploded token rows (same bins, smoothing and rounding)."""
    merges = bpe.bpe_merges_from_corpus(docs, num_merges=60)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    ca = bpe.bpe_token_counts(half_a, merges)
    cb = bpe.bpe_token_counts(half_b, merges)
    got = bpe.token_drift(ca, cb, max_categories=50)

    def exploded(df):
        return (bpe.apply_bpe(df, merges)
                .select(F.explode("bpe_tokens").alias("token")))

    want = psi_report_categorical(exploded(half_a), exploded(half_b),
                                  ["token"], max_categories=50).collect()
    assert len(want) == 1
    assert got["psi"] == want[0]["psi"]
    assert got["n_categories_used"] == want[0]["n_categories_used"]
    assert got["n_ref"] > 0 and got["n_cur"] > 0


def test_token_drift_zero_on_identity_and_alerts_on_shift(spark, docs):
    merges = bpe.bpe_merges_from_corpus(docs, num_merges=60)
    counts = bpe.bpe_token_counts(docs, merges)
    same = bpe.token_drift(counts, counts)
    assert same["psi"] == 0.0
    # a disjoint-alphabet "new domain" shows massive drift
    alien = docs.sparkSession.createDataFrame(
        [(1, "qqq www zzz qqq www"), (2, "zzz qqq zzz www qqq")],
        ["doc_id", "text"])
    drifted = bpe.token_drift(
        counts, bpe.bpe_token_counts(alien, merges))
    assert drifted["psi"] > 1.0
