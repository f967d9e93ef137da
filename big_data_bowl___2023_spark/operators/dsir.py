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
    distinct) — DSIR features are bag counts.

    Both gram orders are built from ONE tokenize and exploded from
    one concatenated array, so the corpus is scanned once — the
    union-of-two-``shingle_docs`` shape read (and tokenized) it
    twice for the same multiset of gram rows (guide §2.3: project/
    derive before the exchange, not per consumer)."""
    from ..functions import text as Tx

    # same slice/zip_with kernel as shingle_docs: n=1 is the token
    # array itself; n=2 zips the two offset slices. Let-bound like
    # dedup.ngram.shingle_array (r16): the chain references the token
    # array 5x, zip_with is CodegenFallback (no CSE inside the
    # fallback subtree), so binding tokenize(text) as a lambda
    # variable evaluates it once per row instead of five times.
    def _grams(t):
        g = F.greatest(F.size(t) - 1, F.lit(0))
        bi = F.zip_with(F.slice(t, 1, g), F.slice(t, 2, g),
                        lambda a, b: F.concat_ws(" ", a, b))
        return F.concat(t, bi)

    both = F.element_at(
        F.transform(F.array(Tx.tokenize(F.col(text_col))), _grams), 1)
    grams = df.select(F.col(id_col).alias("doc_id"),
                      F.explode(both).alias("shingle"))
    bucket = F.substring(
        F.md5(F.encode(F.col("shingle"), "UTF-8")), 1, n_hex)
    return (grams.select("doc_id", bucket.alias("bucket"))
            .groupBy("doc_id", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def _log_probs_from_counts(counts: DataFrame, n_hex: int,
                           alpha: float) -> tuple[DataFrame, float]:
    """(bucket, lp) + zero-count default from a (bucket, n) table.
    The table (≤ 16^n_hex rows) is PINNED before the eager total:
    the total and the lp projection both consume it, and without the
    pin each consumption re-ran the whole upstream gram scan —
    the eager ``.first()`` here made that a guaranteed full extra
    corpus pass per model (guide §2.4)."""
    from ..session import pin

    counts = pin(counts)
    b = 16 ** n_hex
    total = counts.agg(F.sum("n")).first()[0] or 0
    denom = float(total) + alpha * b
    lp = counts.select(
        "bucket",
        F.log((F.col("n") + F.lit(alpha)) / F.lit(denom)).alias("lp"))
    return lp, math.log(alpha / denom)


def bucket_log_probs(df: DataFrame, n_hex: int = 3, alpha: float = 1.0,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> tuple[DataFrame, float]:
    """Add-alpha-smoothed bucket log-probabilities of a corpus, plus
    the default log-prob of a bucket with zero observed count. The
    table has ≤ 16^n_hex rows — broadcast material."""
    counts = (hashed_ngram_counts(df, n_hex, text_col, id_col)
              .groupBy("bucket").agg(F.sum("cnt").alias("n")))
    return _log_probs_from_counts(counts, n_hex, alpha)


def importance_weights(raw: DataFrame, target: DataFrame,
                       n_hex: int = 3, alpha: float = 1.0,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, logw): per-raw-document importance weight
    Σ_buckets cnt·(log p_target − log p_raw). Bucket models are
    broadcast; the raw corpus incurs exactly ONE gram scan + one
    groupBy(doc, bucket) shuffle: the per-doc feature table is
    pinned and the raw-side bucket model folds FROM it (a tiny
    re-aggregation of the pin) instead of re-scanning the corpus —
    the previous shape ran the gram pass over ``raw`` three times
    (eager model total, lazy model probabilities, feature pass)."""
    from ..session import pin

    feats = pin(hashed_ngram_counts(raw, n_hex, text_col, id_col))
    raw_counts = feats.groupBy("bucket").agg(F.sum("cnt").alias("n"))
    lp_t, def_t = bucket_log_probs(target, n_hex, alpha, text_col, id_col)
    lp_r, def_r = _log_probs_from_counts(raw_counts, n_hex, alpha)
    ratio = (lp_t.withColumnRenamed("lp", "lp_t")
             .join(lp_r.withColumnRenamed("lp", "lp_r"), "bucket", "full")
             .select("bucket",
                     (F.coalesce("lp_t", F.lit(def_t))
                      - F.coalesce("lp_r", F.lit(def_r))).alias("lw")))
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
