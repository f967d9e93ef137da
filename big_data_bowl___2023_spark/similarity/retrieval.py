"""Ranked text retrieval over the corpus: inverted postings with
TF-IDF weights and BM25 top-k scoring.

The index is a plain DataFrame — (term, doc_id, tf, dl, tfidf) — so
it parquet-persists, bucket-partitions by term, and joins like any
other table; no driver-side structures. Scoring is one broadcast join
(query terms are tiny) + one grouped sum + one per-query top-k window:
the corpus-sized side is touched once.

Scale notes (100 TB): the postings build shuffles on (doc_id, term)
then term — Zipf-skewed hot terms are exactly the ones with near-zero
idf, so ``min_idf`` drops them before they can skew the score join;
partial aggregation handles the tf counts map-side. BM25 uses the
Robertson idf with +1 smoothing (the Lucene variant), k1/b defaults
1.2/0.75.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as Tx


def term_postings(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Inverted index rows: (term, doc_id, tf, dl, n_docs, df, idf,
    tfidf). One explode + two grouped passes; corpus-level scalars
    (N, avgdl) ride along via a broadcast 1-row join instead of a
    driver collect."""
    from ..session import pin

    toks = docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(Tx.norm_tokens(F.col(text_col)))
                        .alias("term"))
    # tf feeds THREE subtrees (doc lengths, doc frequencies, the
    # postings join) and dl two more (corpus scalars, join) — pinned,
    # the corpus token explode + (doc, term) shuffle runs once and
    # every consumer reads the materialized postings-grain table
    # (text never re-enters; guide §2.4 / §8's decide-on-the-proxy)
    tf = pin(toks.groupBy("doc_id", "term")
             .agg(F.count(F.lit(1)).alias("tf")))
    dl = pin(tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    corpus = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.avg("dl").alias("avgdl"))
    out = (tf.join(dl, "doc_id")
             .join(dfreq, "term")
             .join(F.broadcast(corpus)))
    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    return (out.withColumn("idf", idf)
               .withColumn("tfidf", F.col("tf") * F.col("idf")))


def bm25_scores(docs: DataFrame, queries: DataFrame, k1: float = 1.2,
                b: float = 0.75, min_idf: float = 0.0,
                text_col: str = "text", id_col: str = "doc_id",
                query_id_col: str = "query_id",
                query_text_col: str = "query_text") -> DataFrame:
    """Full (query_id, doc_id, score) table for every doc sharing at
    least one useful term with the query. Query terms are deduplicated
    (standard bag-of-query-terms BM25) and broadcast."""
    post = term_postings(docs, text_col, id_col)
    if min_idf > 0.0:
        post = post.filter(F.col("idf") >= F.lit(min_idf))
    qterms = (queries.select(F.col(query_id_col).alias("query_id"),
                             F.explode(Tx.norm_tokens(
                                 F.col(query_text_col))).alias("term"))
                     .distinct())
    contrib = (F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
               / (F.col("tf")
                  + F.lit(k1) * (F.lit(1.0 - b)
                                 + F.lit(b) * F.col("dl") / F.col("avgdl"))))
    return (post.join(F.broadcast(qterms), "term")
                .withColumn("c", contrib)
                .groupBy("query_id", "doc_id")
                .agg(F.sum("c").alias("score")))


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = 1.2, b: float = 0.75, min_idf: float = 0.0,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-k docs per query by BM25, deterministic tiebreak on doc_id.
    Per-query window over the scored table — the k cut happens before
    any result materialization."""
    scored = bm25_scores(docs, queries, k1, b, min_idf, text_col, id_col)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("doc_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "doc_id", "rank",
                          F.round("score", 6).alias("score")))


def doc_keywords(docs: DataFrame, k: int = 10,
                 text_col: str = "text", id_col: str = "doc_id",
                 min_idf: float = 0.0) -> DataFrame:
    """(doc_id, keywords): each document's top-``k`` terms by tf-idf
    — corpus-exploration / tagging / cluster-labeling surface over
    the SAME postings table the BM25 retriever builds, so scores are
    definitionally consistent with retrieval. ``keywords`` is a
    rank-ordered array of (term, tfidf) structs; ``min_idf`` drops
    stop-grade terms before the ranking window (they'd win on raw tf
    in every doc while carrying no information).

    One ranking window over the postings, partitioned by doc —
    postings volume is token volume, no extra corpus scan.

    GROUP-grain labeling for free: pass a grouping column as
    ``id_col`` (e.g. ``id_col="source"`` or a cluster-id column) —
    ``term_postings`` sums tf across rows sharing an id, so the
    "documents" become the groups and the keywords label each
    source/cluster (idf then measures cross-GROUP distinctiveness).
    """
    post = term_postings(docs, text_col, id_col)
    if min_idf > 0.0:
        post = post.filter(F.col("idf") >= F.lit(min_idf))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term"))
    return (post.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(F.struct(
                F.col("__rn").alias("rank"), "term",
                F.round("tfidf", 6).alias("tfidf"))))
                .alias("keywords")))
