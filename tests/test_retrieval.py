"""BM25 / TF-IDF retrieval: the full score table is checked cell-level
against a DuckDB oracle that re-derives the identical formula from the
same parquet; top-k is checked for internal consistency against the
score table (cross-engine rank boundaries on ~1e-15 float ties are
deliberately not part of the contract)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.similarity import (
    bm25_scores, bm25_topk, term_postings,
)
from big_data_bowl___2023_spark.sources.io import load_table

K1, B = 1.2, 0.75

ORACLE = r"""
WITH toks AS (
    SELECT doc_id,
           unnest(string_split(regexp_replace(trim(lower(text)),
                                              '\s+', ' ', 'g'), ' ')) AS term
    FROM read_parquet('{sf}/documents.parquet')
), tf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM toks WHERE term <> '' GROUP BY doc_id, term
), dl AS (
    SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id
), dfreq AS (
    SELECT term, count(*) AS df FROM tf GROUP BY term
), corpus AS (
    SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
), qt AS (
    SELECT DISTINCT query_id,
           unnest(string_split(regexp_replace(trim(lower(query_text)),
                                              '\s+', ' ', 'g'), ' ')) AS term
    FROM queries_fixture
)
SELECT qt.query_id, tf.doc_id,
       round(sum(
           ln(1.0 + (corpus.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({k1} + 1.0)
           / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / corpus.avgdl))
       ), 6) AS score
FROM tf
JOIN dl USING (doc_id)
JOIN dfreq USING (term)
JOIN qt ON qt.term = tf.term AND qt.term <> ''
CROSS JOIN corpus
GROUP BY qt.query_id, tf.doc_id
"""


def _query_fixture(spark, docs):
    """Queries drawn from the corpus itself: first 4 tokens of three
    spread-out documents, so every query has guaranteed matches."""
    rows = (docs.orderBy("doc_id")
                .select("doc_id", "text")
                .limit(60).collect())
    picked = [rows[0], rows[len(rows) // 2], rows[-1]]
    qrows = [(i, " ".join(r.text.split()[:4])) for i, r in enumerate(picked)]
    return (spark.createDataFrame(qrows, "query_id: int, query_text: string"),
            qrows)


def test_bm25_scores_match_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    queries, qrows = _query_fixture(spark, docs)
    got = {(r.query_id, r.doc_id): round(r.score, 6)
           for r in bm25_scores(docs, queries, K1, B).collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE queries_fixture(query_id INT, query_text VARCHAR)")
    con.executemany("INSERT INTO queries_fixture VALUES (?, ?)", qrows)
    want = {(q, d): s for q, d, s in
            con.execute(ORACLE.format(sf=sf_dir, k1=K1, b=B)).fetchall()}
    con.close()

    assert set(got) == set(want)
    for key in want:
        assert abs(got[key] - want[key]) <= 1e-6, (key, got[key], want[key])


def test_bm25_topk_consistent_with_scores(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    queries, _ = _query_fixture(spark, docs)
    k = 5
    scored = bm25_scores(docs, queries, K1, B).collect()
    top = bm25_topk(docs, queries, k=k, k1=K1, b=B).collect()

    by_query = {}
    for r in scored:
        by_query.setdefault(r.query_id, []).append((r.doc_id, r.score))
    for qid, pairs in by_query.items():
        want = sorted(pairs, key=lambda p: (-p[1], p[0]))[:k]
        got = sorted([(r.doc_id, r.rank) for r in top if r.query_id == qid],
                     key=lambda p: p[1])
        assert [d for d, _ in got] == [d for d, _ in want]
        assert [rk for _, rk in got] == list(range(1, len(want) + 1))
    # every query found its own source document at rank 1
    for r in top:
        if r.rank == 1:
            assert r.score > 0


def test_postings_tfidf_and_hot_term_cap(spark, sf_dir):
    """idf is monotone-decreasing in df, and min_idf drops the hot
    near-zero-idf terms from the score join."""
    docs = load_table(spark, sf_dir, "documents")
    post = term_postings(docs).cache()
    two = (post.select("term", "df", "idf").distinct()
               .orderBy(F.col("df").asc(), F.col("term").asc()).limit(1)
               .union(post.select("term", "df", "idf").distinct()
                          .orderBy(F.col("df").desc(), F.col("term").asc())
                          .limit(1))
               .collect())
    rare, hot = two[0], two[1]
    assert rare.df <= hot.df and rare.idf >= hot.idf
    queries = docs.sparkSession.createDataFrame(
        [(0, "the a of and is")], "query_id: int, query_text: string")
    loose = bm25_scores(docs, queries).count()
    tight = bm25_scores(docs, queries, min_idf=float(hot.idf) + 1e-9).count()
    assert tight <= loose
    post.unpersist()


def test_doc_keywords_vs_duckdb(spark, sf_dir):
    """Top-k per-doc tf-idf keywords match a DuckDB recompute of the
    same postings ranking (rank + term + rounded score)."""
    import duckdb

    from big_data_bowl___2023_spark.similarity.retrieval import (
        doc_keywords,
        term_postings,
    )
    from big_data_bowl___2023_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    got = {}
    for r in doc_keywords(docs, k=5).collect():
        got[r.doc_id] = [(kw.rank, kw.term, kw.tfidf)
                         for kw in r.keywords]

    post = term_postings(docs).toPandas()
    con = duckdb.connect()
    con.register("post", post)
    want: dict = {}
    for doc_id, rank, term, tfidf in con.execute("""
        select doc_id, rn, term, round(tfidf, 6) from (
          select doc_id, term, tfidf,
                 row_number() over (partition by doc_id
                     order by tfidf desc, term asc) as rn
          from post) where rn <= 5""").fetchall():
        want.setdefault(doc_id, []).append((rank, term, tfidf))
    for d in want:
        want[d].sort()
    assert got == want and got


def test_doc_keywords_min_idf_drops_ubiquitous_terms(spark):
    from big_data_bowl___2023_spark.similarity.retrieval import (
        doc_keywords,
    )

    docs = spark.createDataFrame(
        [(1, "common alpha alpha alpha"), (2, "common beta beta"),
         (3, "common gamma gamma")],
        ["doc_id", "text"])
    # 'common' is in every doc -> idf = log(1 + 0/3.x) near floor
    out = {r.doc_id: [kw.term for kw in r.keywords]
           for r in doc_keywords(docs, k=2, min_idf=0.2).collect()}
    assert all("common" not in terms for terms in out.values())
    assert out[1][0] == "alpha"


def test_group_grain_keywords_label_sources(spark):
    """id_col = a grouping column turns doc_keywords into a
    cluster/source labeler: per-group tf sums, idf across groups."""
    from big_data_bowl___2023_spark.similarity.retrieval import (
        doc_keywords,
    )

    docs = spark.createDataFrame(
        [(1, "football touchdown quarterback", "sports"),
         (2, "touchdown pass quarterback blitz", "sports"),
         (3, "election ballot senate", "politics"),
         (4, "senate vote ballot debate", "politics")],
        ["doc_id", "text", "source"])
    out = {r.doc_id: [kw.term for kw in r.keywords]
           for r in doc_keywords(docs, k=2,
                                 id_col="source").collect()}
    assert set(out) == {"sports", "politics"}
    assert set(out["sports"]) <= {"touchdown", "quarterback",
                                  "football", "pass", "blitz"}
    assert set(out["politics"]) <= {"senate", "ballot", "election",
                                    "vote", "debate"}
