"""DSIR — data selection by importance resampling.

The domain-targeted data-selection step of large-pretraining pipelines
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023): model target and raw corpora as bag-of-
hashed-n-gram distributions, weight every raw document by the
log-likelihood ratio of the two models, and resample the corpus
proportionally to the weights — selecting raw data that "looks like"
the target domain without training a classifier.

Engine-portable by construction, the same discipline as the md5
split/minhash/simhash kernels: feature buckets are md5 HEX PREFIXES
(strings — no integer hashing the oracle can't reproduce), smoothing
is closed-form add-alpha, and the without-replacement sampling step is
the Gumbel-top-k trick keyed by a DETERMINISTIC per-doc uniform
derived from md5 via an instr()-polynomial hex parse — so a DuckDB
oracle reproduces weights AND the selected sample exactly
(tests/test_dsir.py).

Shuffle profile at 100 TB: the raw corpus is touched by one explode +
one groupBy(doc) shuffle for weights; both n-gram models are tiny
(≤ 16^n_hex rows) and broadcast; selection is TakeOrderedAndProject
(no global sort). Nothing quadratic, nothing driver-side but the
model tables.

Reference scope note: north-star extension (SURVEY.md §2 extensions,
inventory E58); the reference has no corpus operators.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.ngram import shingle_docs

def hex_to_int(col: F.Column, n: int) -> F.Column:
    """Hex-string → integer. Spark side uses ``conv``; the DuckDB
    oracle computes the same value with a strpos('0123456789abcdef')
    positional polynomial — identical integers, which is all the
    cross-engine contract needs."""
    return F.conv(col, 16, 10).cast("long")


def hashed_ngram_counts(df: DataFrame, n_hex: int = 3,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(doc_id, bucket, cnt): unigram + bigram occurrences hashed into
    16^n_hex buckets by md5-hex prefix. Occurrence counts (not
    distinct) — DSIR features are bag counts."""
    uni = shingle_docs(df, text_col, id_col, n=1, distinct=False)
    bi = shingle_docs(df, text_col, id_col, n=2, distinct=False)
    grams = uni.unionByName(bi)
    bucket = F.substring(
        F.md5(F.encode(F.col("shingle"), "UTF-8")), 1, n_hex)
    return (grams.select("doc_id", bucket.alias("bucket"))
            .groupBy("doc_id", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def bucket_log_probs(df: DataFrame, n_hex: int = 3, alpha: float = 1.0,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> tuple[DataFrame, float]:
    """Add-alpha-smoothed bucket log-probabilities of a corpus, plus
    the default log-prob of a bucket with zero observed count. The
    table has ≤ 16^n_hex rows — broadcast material."""
    b = 16 ** n_hex
    counts = (hashed_ngram_counts(df, n_hex, text_col, id_col)
              .groupBy("bucket").agg(F.sum("cnt").alias("n")))
    total = counts.agg(F.sum("n")).first()[0] or 0
    denom = float(total) + alpha * b
    lp = counts.select(
        "bucket",
        F.log((F.col("n") + F.lit(alpha)) / F.lit(denom)).alias("lp"))
    return lp, math.log(alpha / denom)


def importance_weights(raw: DataFrame, target: DataFrame,
                       n_hex: int = 3, alpha: float = 1.0,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, logw): per-raw-document importance weight
    Σ_buckets cnt·(log p_target − log p_raw). Bucket models are
    broadcast; the raw corpus incurs exactly one groupBy(doc)
    shuffle (inside hashed_ngram_counts) plus one more for the
    final per-doc sum."""
    lp_t, def_t = bucket_log_probs(target, n_hex, alpha, text_col, id_col)
    lp_r, def_r = bucket_log_probs(raw, n_hex, alpha, text_col, id_col)
    ratio = (lp_t.withColumnRenamed("lp", "lp_t")
             .join(lp_r.withColumnRenamed("lp", "lp_r"), "bucket", "full")
             .select("bucket",
                     (F.coalesce("lp_t", F.lit(def_t))
                      - F.coalesce("lp_r", F.lit(def_r))).alias("lw")))
    feats = hashed_ngram_counts(raw, n_hex, text_col, id_col)
    return (feats.join(F.broadcast(ratio), "bucket", "left")
            .groupBy("doc_id")
            .agg(F.sum(F.col("cnt")
                       * F.coalesce("lw", F.lit(def_t - def_r)))
                 .alias("logw")))


def gumbel_key(id_col: str = "doc_id", seed: int = 0) -> F.Column:
    """Deterministic per-doc Gumbel(0,1) draw: u from the first 8 md5
    hex chars of (id ‖ seed), g = −ln(−ln(u)). Reproducible by any
    engine with md5 + instr — no RNG state, rerun- and
    partitioning-stable."""
    hx = F.md5(F.encode(
        F.concat(F.col(id_col).cast("string"), F.lit(f":g{seed}")),
        "UTF-8"))
    v = hex_to_int(F.substring(hx, 1, 8), 8)
    u = (v.cast("double") + F.lit(0.5)) / F.lit(float(16 ** 8))
    return -F.log(-F.log(u))


def dsir_resample(raw: DataFrame, target: DataFrame, n_docs: int,
                  n_hex: int = 3, alpha: float = 1.0,
                  temperature: float = 1.0, seed: int = 0,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """The selected sample: n_docs raw documents drawn WITHOUT
    replacement with probability ∝ w^(1/temperature), via Gumbel
    top-k (key = logw/T + Gumbel). Returns the raw rows joined with
    (logw, key). Selection is a top-k (TakeOrderedAndProject), never
    a global sort; ties cannot occur (distinct md5-derived keys)."""
    w = importance_weights(raw, target, n_hex, alpha, text_col, id_col)
    keyed = w.select(
        "doc_id", "logw",
        (F.col("logw") / F.lit(float(temperature))
         + gumbel_key("doc_id", seed)).alias("key"))
    chosen = (keyed.orderBy(F.desc("key"), F.asc("doc_id"))
              .limit(n_docs))
    return raw.join(
        F.broadcast(chosen.withColumnRenamed("doc_id", id_col)),
        id_col)
