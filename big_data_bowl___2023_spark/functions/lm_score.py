"""Corpus n-gram LM typicality scoring (CCNet-style quality signal).

CCNet/fastText-era pipelines score documents against a language model
trained on a trusted corpus and filter by perplexity — atypical
documents (boilerplate, gibberish, wrong language) score badly. The
Spark-expressible analogue is an add-k-smoothed bigram LM:

* training is two grouped counts over the corpus (bigrams and
  unigrams) — the model IS a DataFrame, persistable like any table;
* scoring joins each document's bigrams against the model and
  averages log-probabilities; unseen bigrams get the smoothed floor.
  One join keyed by bigram + one grouped mean per doc.

Per-token average log-prob (not summed) so the score is comparable
across document lengths; exp(−avg) is the usual perplexity if needed.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokenize

ADD_K = 0.5


def _bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # let-bound like dedup.ngram.shingle_array (r16): the chain
    # references the token array 5x and zip_with is CodegenFallback
    # (no CSE inside the fallback subtree), so the tokenize+filter
    # tree is bound once as a lambda variable instead of being
    # re-evaluated per reference per row
    def _pairs(t):
        g = F.greatest(F.size(t) - 1, F.lit(0))
        return F.zip_with(
            F.slice(t, 1, g), F.slice(t, 2, g),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))

    toks = F.filter(tokenize(F.col(text_col)), lambda t: t != "")
    grams = F.element_at(F.transform(F.array(toks), _pairs), 1)
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(grams).alias("g"))
            .select("doc_id", "g.w1", "g.w2"))


def train_bigram_lm(corpus: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(w1, w2, n_bigram, n_prefix): the count model. Vocabulary size
    for smoothing is derived at scoring time from the model itself."""
    bg = _bigrams(corpus, text_col, id_col)
    counts = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("n_bigram"))
    prefix = counts.groupBy("w1").agg(
        F.sum("n_bigram").alias("n_prefix"))
    return counts.join(prefix, "w1")


def score_documents(docs: DataFrame, lm: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    add_k: float = ADD_K) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob): add-k-smoothed per-bigram
    average log P(w2|w1). Documents with < 2 tokens get no row
    (nothing to score). Higher = more corpus-typical."""
    vocab = lm.select("w2").distinct().count()
    bg = _bigrams(docs, text_col, id_col)
    # Join the pair counts on (w1, w2) and the prefix counts on w1
    # INDEPENDENTLY: an unseen bigram whose prefix w1 IS in the model
    # must still see its true n_prefix, else p degrades to
    # add_k/(add_k*vocab) and rare continuations of common prefixes
    # get inflated scores.
    counts = lm.select("w1", "w2", "n_bigram")
    prefix = lm.select("w1", "n_prefix").distinct()
    joined = (bg.join(counts, ["w1", "w2"], "left")
              .join(prefix, ["w1"], "left"))
    p = ((F.coalesce(F.col("n_bigram"), F.lit(0)) + F.lit(add_k))
         / (F.coalesce(F.col("n_prefix"), F.lit(0))
            + F.lit(add_k * vocab)))
    return (joined
            .withColumn("__lp", F.log(p))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg("__lp"), 6).alias("avg_logprob")))


def perplexity(avg_logprob) -> F.Column:
    """exp(−avg_logprob) — the conventional reporting unit."""
    return F.exp(-avg_logprob)


def smoothed_logprob(n_bigram: int, n_prefix: int, vocab: int,
                     add_k: float = ADD_K) -> float:
    """Reference arithmetic for tests/oracles (same formula the
    column expression evaluates)."""
    return math.log((n_bigram + add_k) / (n_prefix + add_k * vocab))
