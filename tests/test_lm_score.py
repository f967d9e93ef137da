"""E48 — bigram LM typicality: hand-computed smoothed log-probs on a
tiny corpus, gibberish scoring below corpus-typical text, and a DuckDB
oracle for the full train+score pipeline on the documents table."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.functions.lm_score import (
    ADD_K,
    score_documents,
    smoothed_logprob,
    train_bigram_lm,
)
from big_data_bowl___2023_spark.sources.io import load_table


def test_hand_computed_scores(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], ["doc_id", "text"])
    lm = train_bigram_lm(corpus)
    rows = {(r.w1, r.w2): (r.n_bigram, r.n_prefix) for r in lm.collect()}
    # bigrams: (a,b)x2, (b,c), (b,d); prefix a=2, b=2; vocab(w2)={b,c,d}
    assert rows == {("a", "b"): (2, 2), ("b", "c"): (1, 2),
                    ("b", "d"): (1, 2)}
    V = 3
    scored = {r.doc_id: (r.n_bigrams, r.avg_logprob)
              for r in score_documents(
                  spark.createDataFrame(
                      [(10, "a b c"), (11, "z z")], ["doc_id", "text"]),
                  lm).collect()}
    exp10 = (smoothed_logprob(2, 2, V) + smoothed_logprob(1, 2, V)) / 2
    exp11 = smoothed_logprob(0, 0, V)
    assert scored[10] == (2, round(exp10, 6))
    assert scored[11] == (1, round(exp11, 6))
    assert scored[10][1] > scored[11][1]  # typical beats unseen


def test_unseen_bigram_with_seen_prefix(spark):
    """Regression: an unseen (w1,w2) whose prefix w1 IS in the model
    must be smoothed against the true n_prefix, not 0 — the (w1,w2)
    left join alone nulls n_prefix for exactly these rows."""
    corpus = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], ["doc_id", "text"])
    lm = train_bigram_lm(corpus)
    V = 3
    scored = {r.doc_id: (r.n_bigrams, r.avg_logprob)
              for r in score_documents(
                  spark.createDataFrame([(20, "a c")],
                                        ["doc_id", "text"]),
                  lm).collect()}
    # (a,c) unseen but prefix 'a' has n_prefix=2: log(k/(2+kV))
    assert scored[20] == (1, round(smoothed_logprob(0, 2, V), 6))
    # and the buggy value it must NOT equal: log(k/(0+kV))
    assert scored[20][1] != round(smoothed_logprob(0, 0, V), 6)


def test_corpus_text_beats_gibberish(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    lm = train_bigram_lm(docs).cache()
    probe = spark.createDataFrame(
        [(900001, "qzx vmm wkj pqr zzv xqq jjw qqq zzz vvv"),
         (900002, docs.first().text)],
        ["doc_id", "text"])
    s = {r.doc_id: r.avg_logprob
         for r in score_documents(probe, lm).collect()}
    assert s[900002] > s[900001]


def test_pipeline_vs_duckdb_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    lm = train_bigram_lm(docs)
    scored = score_documents(docs.filter(F.col("doc_id") < 100), lm)
    got = {(r.doc_id, r.n_bigrams, r.avg_logprob)
           for r in scored.collect()}

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'")
    oracle = con.sql(f"""
        WITH toks AS (SELECT doc_id,
                             list_filter(string_split(text, ' '),
                                         t -> t != '') AS t
                      FROM documents),
        bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
               FROM toks, unnest(range(1, len(t))) AS u(i)),
        counts AS (SELECT w1, w2, COUNT(*) AS nb FROM bg GROUP BY 1, 2),
        prefix AS (SELECT w1, SUM(nb) AS np FROM counts GROUP BY 1),
        v AS (SELECT COUNT(DISTINCT w2) AS vocab FROM counts),
        sub AS (SELECT doc_id, w1, w2 FROM bg WHERE doc_id < 100),
        scored AS (
          SELECT s.doc_id,
                 ln((COALESCE(c.nb, 0) + {ADD_K})
                    / (COALESCE(p.np, 0) + {ADD_K} * v.vocab)) AS lp
          FROM sub s
          LEFT JOIN counts c ON c.w1 = s.w1 AND c.w2 = s.w2
          LEFT JOIN prefix p ON p.w1 = s.w1
          CROSS JOIN v)
        SELECT doc_id, COUNT(*) AS n, ROUND(AVG(lp), 6)
        FROM scored GROUP BY doc_id""").fetchall()
    assert got == {tuple(r) for r in oracle}
    assert len(got) == 100  # doc_ids 0..99 all have >= 2 tokens
