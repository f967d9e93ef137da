"""Vocabulary construction + OOV analytics.

The precursor to tokenizer training and embedding tables: count every
token across the corpus, keep tokens by ``min_count`` and/or a
``top_k`` cap (ranked by frequency, token string as the deterministic
tiebreak), assign contiguous ids in rank order, and measure the OOV
(out-of-vocabulary) rate the chosen vocabulary leaves behind.

One grouped count over the exploded tokens builds the table; the cap
is a window over the (already tiny) vocab table, never the corpus.
OOV measurement is a broadcast anti-ish join: corpus tokens ⋈ vocab,
unmatched = OOV — one corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokenize


def _token_rows(df: DataFrame, text_col: str) -> DataFrame:
    toks = F.filter(tokenize(F.col(text_col)), lambda t: t != "")
    return df.select(F.explode(toks).alias("token"))


def build_vocab(df: DataFrame, text_col: str = "text",
                min_count: int = 1,
                top_k: int | None = None) -> DataFrame:
    """(token, n, token_id): frequency-ranked vocabulary. token_id is
    0-based in (count desc, token asc) order — deterministic, so two
    runs produce identical id assignments."""
    counts = (_token_rows(df, text_col)
              .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
              .filter(F.col("n") >= min_count))
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    ranked = counts.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("long"))
    if top_k is not None:
        ranked = ranked.filter(F.col("token_id") < top_k)
    return ranked


def oov_rate(df: DataFrame, vocab: DataFrame,
             text_col: str = "text") -> DataFrame:
    """One row: (n_tokens, n_oov, oov_rate) of the corpus against the
    vocabulary. The vocab side broadcasts (it is top_k-bounded)."""
    toks = _token_rows(df, text_col)
    joined = toks.join(F.broadcast(vocab.select("token")
                                   .withColumn("__in", F.lit(1))),
                       "token", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
        .alias("n_oov"),
        F.round(F.avg(F.col("__in").isNull().cast("double")), 6)
        .alias("oov_rate"))
