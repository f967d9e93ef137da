"""Word n-gram (shingle) Jaccard near-dup detection.

The scalable shape: explode distinct shingles → self-join on shingle →
count shared → Jaccard from per-doc shingle counts. Cost is driven by
shingle document-frequency: a shingle appearing in d docs contributes
d² candidate pairs, so ``max_doc_freq`` caps the hot keys (stopword
shingles) — the classic skew guard that makes this viable at corpus
scale. Exact for all pairs sharing ≥1 surviving shingle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as Tx


def _shingle_chain(toks, n: int):
    """The slice/zip_with shingle build over an ALREADY-BOUND token
    array (a lambda variable or plain column reference). Callers go
    through :func:`shingle_array` — passing a derived expression here
    re-evaluates it once per reference (~2n times), which is the
    regression the let-binding exists to prevent."""
    cols = [F.slice(toks, i + 1, F.greatest(F.size(toks) - n + 1, F.lit(0)))
            for i in range(n)]
    sh = cols[0]
    for c in cols[1:]:
        sh = F.zip_with(sh, c, lambda a, b: F.concat_ws(" ", a, b))
    return sh


def shingle_array(text, n: int):
    """array<string> of the text's word n-gram shingles — THE shingle
    expression every consumer (explode table, map-side overlap probe)
    composes from. NULL text → NULL; < n tokens → empty array.

    Let-binding (r16, guide §4.1/§4.6): the chain references its token
    array ~2n times (n slices + their size() guards), and zip_with is
    CodegenFallback — evaluated interpreted, with NO common-
    subexpression elimination inside the fallback subtree. Written
    inline over a derived text expression (e.g. the PII-redaction
    regexp chain in the streaming curation gate), every one of those
    references re-evaluated the whole upstream expression per row —
    measured 2.5x the filter cost at n=8 over the redaction chain.
    ``transform(array(tokenize(text)), t -> chain(t))`` evaluates the
    token array ONCE and binds it as a lambda variable; every chain
    reference then reads the bound value. Values are bit-identical
    (pytest-pinned, incl. NULL/short-doc edges)."""
    return F.element_at(
        F.transform(F.array(Tx.tokenize(text)),
                    lambda t: _shingle_chain(t, n)), 1)


def shingle_docs(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n: int = 2,
                 distinct: bool = True) -> DataFrame:
    """Word n-gram shingles per doc, one row per (doc, shingle),
    distinct by default. slice/zip_with keeps shingling inside
    codegen; docs shorter than n simply produce no rows.
    ``distinct=False`` skips the dedup exchange for consumers whose
    aggregates are duplicate-insensitive (min-hash) or that dedup in
    the same shuffle (collect_set)."""
    out = df.select(F.col(id_col).alias("doc_id"),
                    F.explode(shingle_array(F.col(text_col), n))
                     .alias("shingle"))
    return out.distinct() if distinct else out


def jaccard_pairs(df: DataFrame, threshold: float,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 2, max_doc_freq: int | None = None) -> DataFrame:
    """Pairs (doc_a < doc_b, jaccard) with Jaccard ≥ threshold.

    Returns columns (doc_a, doc_b, jaccard·round6). With
    ``max_doc_freq`` set, shingles present in more documents than the
    cap are dropped before the pair join (bounded skew; slightly
    conservative Jaccard).
    """
    sh = shingle_docs(df, text_col, id_col, n)
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = (sh.join(freq.filter(F.col("df") <= max_doc_freq)
                      .select("shingle"), "shingle", "left_semi"))
    sh = sh.cache()  # reused 3x: pair join (both sides) + counts
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))

    a = sh.alias("a")
    b = sh.alias("b")
    shared = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                     & (F.col("a.doc_id") < F.col("b.doc_id")))
               .groupBy(F.col("a.doc_id").alias("doc_a"),
                        F.col("b.doc_id").alias("doc_b"))
               .agg(F.count(F.lit(1)).alias("shared")))

    ca = counts.select(F.col("doc_id").alias("doc_a"),
                       F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"),
                       F.col("n_sh").alias("n_b"))
    j = (F.col("shared")
         / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double"))
    return (shared.join(ca, "doc_a").join(cb, "doc_b")
            .filter(j >= F.lit(threshold))
            .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard")))


def duplication_profile(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        n: int = 3) -> DataFrame:
    """Per-document duplication fraction: the share of a document's
    distinct n-gram shingles that also occur in at least one OTHER
    document — the corpus-health stat training-data reports publish
    (high values flag boilerplate-heavy or template-generated slices
    that pair-level dedup thresholds miss).

    Columns: (doc_id, n_shingles, n_duplicated, dup_fraction·round6).
    Docs shorter than ``n`` tokens have no shingles and are omitted
    (no shingle evidence either way).

    Scale shape: one groupBy(shingle) document-frequency count
    (partial agg absorbs hot shingles map-side) + one shingle-keyed
    semi-structured join back + one doc-keyed aggregation. No pair
    join at all — cost is linear in total shingle volume, unlike
    ``jaccard_pairs``, so it runs corpus-wide without a frequency
    cap."""
    sh = shingle_docs(df, text_col, id_col, n).cache()
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    joined = sh.join(freq, "shingle")
    out = (joined.groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_shingles"),
                F.sum((F.col("df") > 1).cast("long"))
                 .alias("n_duplicated")))
    return out.withColumn(
        "dup_fraction",
        F.round(F.col("n_duplicated") / F.col("n_shingles"), 6))
