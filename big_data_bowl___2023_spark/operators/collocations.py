"""Collocation mining — PMI / NPMI scored adjacent word pairs.

Church & Hanks, "Word Association Norms, Mutual Information, and
Lexicography" (Comp. Ling. 1990) — pointwise mutual information over
adjacent-pair counts; Bouma, "Normalized (Pointwise) Mutual
Information in Collocation Extraction" (GSCL 2009) — the [-1, 1]
normalization that makes scores comparable across corpus sizes. The
training-data uses: phrase discovery for tokenizer pre-merging
(word2phrase-style), boilerplate bigram detection, and corpus
data-card vocabulary statistics.

Spark shape (two grouped counts, nothing else):

* bigrams are formed MAP-SIDE per document — ``zip_with`` of the
  token array with its shifted self, so no self-join and no
  positional explode+window over corpus positions — then ONE grouped
  count over (left, right);
* unigram counts are one grouped count over exploded words;
* the scoring join brings the two VOCAB-sized count tables together
  (the unigram side is broadcast when a count proves it small; the
  corpus-sized token rows never ride a second shuffle);
* totals (Σ bigrams, Σ unigrams) are one-row aggregates of the
  already-aggregated count tables, attached via broadcast cross
  joins — computed BEFORE the ``min_count`` cut so rare pairs keep
  their probability mass, and deliberately NOT window folds (a
  ``partitionBy()`` window would funnel the whole pair table through
  one task; the test suite plan-asserts no Window).

Tokens are ``text.norm_tokens`` — the same canonical word convention
BM25, BPE and the vocab ops use. Document boundaries are respected:
pairs never span documents (the zip is per row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as Tx


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(left, right, n): adjacent normalized-word pair counts, formed
    map-side per document (one shuffle, keyed by the pair)."""
    # let-bound like dedup.ngram.shingle_array (r16): norm_tokens is
    # a 4-step chain the zip/slice/size references would otherwise
    # re-evaluate 4x per row inside the CodegenFallback subtree
    def _pairs(t):
        return F.filter(
            F.zip_with(t,
                       F.slice(t, 2, F.greatest(F.size(t) - 1,
                                                F.lit(0))),
                       lambda a, b: F.struct(a.alias("left"),
                                             b.alias("right"))),
            lambda p: p["right"].isNotNull())

    toks = Tx.norm_tokens(F.col(text_col))
    pairs = F.element_at(F.transform(F.array(toks), _pairs), 1)
    return (docs.select(F.explode(pairs).alias("p"))
            .select(F.col("p.left").alias("left"),
                    F.col("p.right").alias("right"))
            .groupBy("left", "right")
            .agg(F.count(F.lit(1)).alias("n")))


def collocations(docs: DataFrame, text_col: str = "text",
                 min_count: int = 5, metric: str = "npmi",
                 top_k: int | None = None) -> DataFrame:
    """(left, right, n_pair, n_left, n_right, score) for adjacent
    pairs seen ≥ ``min_count`` times, scored by

    * ``"pmi"``  — log( p(l,r) / (p(l)·p(r)) ),
    * ``"npmi"`` — pmi / −log p(l,r)  (∈ [−1, 1]; 1 = the words only
      ever occur together, 0 = independence),

    rounded to 6 dp (the engine's derived-double policy). Pair
    probabilities are over the bigram-token total, word probabilities
    over the unigram total — the standard estimator, reproducible in
    plain SQL (the pytest oracle recomputes it in DuckDB).
    ``top_k`` keeps the strongest pairs (score desc, then pair asc —
    total-ordered). ``min_count`` is the small-sample guard: PMI of a
    hapax pair is pure noise and every practical miner cuts it."""
    if metric not in ("pmi", "npmi"):
        raise ValueError(f"unknown collocation metric {metric!r}")
    big = bigram_counts(docs, text_col)
    uni = (docs.select(F.explode(Tx.norm_tokens(F.col(text_col)))
                       .alias("word"))
           .groupBy("word").agg(F.count(F.lit(1)).alias("nw")))
    # totals as broadcast one-row cross joins, NOT unbounded windows
    # (a partitionBy() window funnels the whole vocab² pair table
    # through one task), and computed BEFORE the min_count cut — the
    # probability mass includes the rare pairs the cut hides
    n_total = big.agg(F.sum("n").alias("__N"))
    w_total = uni.agg(F.sum("nw").alias("__Nw"))
    big = (big.filter(F.col("n") >= min_count)
           .crossJoin(F.broadcast(n_total)))
    uni = uni.crossJoin(F.broadcast(w_total))
    left = uni.select(F.col("word").alias("left"),
                      F.col("nw").alias("n_left"), "__Nw")
    right = uni.select(F.col("word").alias("right"),
                       F.col("nw").alias("n_right"))
    joined = (big.join(left, "left").join(right, "right"))
    p_pair = F.col("n") / F.col("__N")
    p_l = F.col("n_left") / F.col("__Nw")
    p_r = F.col("n_right") / F.col("__Nw")
    pmi = F.log(p_pair / (p_l * p_r))
    score = pmi if metric == "pmi" else pmi / -F.log(p_pair)
    out = (joined.select("left", "right",
                         F.col("n").alias("n_pair"),
                         "n_left", "n_right",
                         F.round(score, 6).alias("score")))
    if top_k is not None:
        # TakeOrdered (orderBy+limit), not a partitionBy() window —
        # the global row_number would funnel every scored pair
        # through one task
        out = out.orderBy(F.desc("score"), F.asc("left"),
                          F.asc("right")).limit(top_k)
    return out
