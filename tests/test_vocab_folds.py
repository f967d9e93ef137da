"""E49 — vocabulary builder (deterministic ranked ids, min_count /
top_k caps, OOV rate vs DuckDB) and leakage-safe k-folds (no near-dup
pair crosses folds; folds partition the corpus)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.dedup import minhash_band_pairs
from big_data_bowl___2023_spark.functions.vocab import (
    build_vocab,
    oov_rate,
)
from big_data_bowl___2023_spark.operators.splits import (
    leakage_safe_folds,
)
from big_data_bowl___2023_spark.sources.io import load_table


def test_vocab_ranks_and_caps(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a b d")], ["doc_id", "text"])
    v = {r.token: (r.n, r.token_id)
         for r in build_vocab(df).collect()}
    # counts: b=4, a=3, c=1, d=1 ; ties rank alphabetically
    assert v == {"b": (4, 0), "a": (3, 1), "c": (1, 2), "d": (1, 3)}
    assert {r.token for r in build_vocab(df, min_count=2).collect()} \
        == {"a", "b"}
    top = build_vocab(df, top_k=2).collect()
    assert {r.token for r in top} == {"a", "b"}
    # determinism: identical id assignment across runs
    again = {r.token: r.token_id for r in build_vocab(df).collect()}
    assert again == {t: i for t, (_, i) in v.items()}


def test_oov_rate_vs_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    vocab = build_vocab(docs, top_k=20).cache()
    got = oov_rate(docs, vocab).collect()[0]

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'")
    oracle = con.sql("""
        WITH toks AS (SELECT unnest(list_filter(string_split(text, ' '),
                                                t -> t != '')) AS token
                      FROM documents),
        counts AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY 1),
        vocab AS (SELECT token FROM counts
                  ORDER BY n DESC, token LIMIT 20)
        SELECT COUNT(*) AS n_tokens,
               SUM(CASE WHEN t.token IN (SELECT token FROM vocab)
                   THEN 0 ELSE 1 END) AS n_oov
        FROM toks t""").fetchone()
    assert (got.n_tokens, got.n_oov) == oracle
    assert got.oov_rate == round(got.n_oov / got.n_tokens, 6)
    assert 0 < got.oov_rate < 1


def test_kfolds_respect_clusters(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_band_pairs(docs, 0.3).cache()
    K = 5
    folds = leakage_safe_folds(docs, pairs, K).cache()
    # partition: every doc exactly one fold in [0, K)
    assert folds.count() == docs.count()
    assert (folds.agg(F.min("fold"), F.max("fold")).collect()[0]
            == (0, K - 1))
    # no near-dup pair crosses folds
    a = folds.select(F.col("doc_id").alias("doc_a"),
                     F.col("fold").alias("fa"))
    b = folds.select(F.col("doc_id").alias("doc_b"),
                     F.col("fold").alias("fb"))
    crossing = (pairs.join(a, "doc_a").join(b, "doc_b")
                .filter(F.col("fa") != F.col("fb")).count())
    assert crossing == 0
