"""Benchmark (test-set) decontamination.

Training corpora must not contain evaluation data: a document that
shares enough contiguous word n-grams with a benchmark item leaks the
answer into training. The standard guard (GPT-3 §C / PaLM / Llama
papers) is n-gram overlap: flag any corpus document sharing ≥ 1 (or
≥ k) distinct n-grams with any benchmark document, then drop or audit.

Spark shape — one equi-join on the shingle key, never doc × doc:

* shingle both sides with the same ``shingle_docs`` kernel (distinct
  word n-grams per doc, codegen-side);
* the benchmark side is small (eval suites are thousands of items, the
  corpus is billions) → Spark broadcasts it; the corpus-side shingle
  scan streams map-side against the broadcast hash — ZERO shuffle of
  corpus bytes for the match itself;
* aggregate matches per (doc, bench) pair for the report, or
  semi/anti-join at the doc level for flag/drop.

The n-gram length is the precision knob: n = 8-word shingles make
accidental collisions vanishingly rare (the published pipelines use
8–13), so ``min_overlap = 1`` is the sane default; lower n should
raise ``min_overlap``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ngram import shingle_docs
from ..functions import vectors as V

DEFAULT_NGRAM = 8


def contamination_report(docs: DataFrame, benchmark: DataFrame,
                         n: int = DEFAULT_NGRAM, min_overlap: int = 1,
                         text_col: str = "text", id_col: str = "doc_id",
                         bench_text_col: str = "text",
                         bench_id_col: str = "bench_id") -> DataFrame:
    """(doc_id, bench_id, n_overlap): corpus docs sharing ≥
    ``min_overlap`` distinct word n-grams with a benchmark item.

    Plan: corpus shingles ⋈ broadcast(benchmark shingles) on the
    shingle string → count per pair. The join emits only matching
    shingle rows (rare at n = 8), so the aggregate input is tiny
    regardless of corpus size."""
    corpus_sh = shingle_docs(docs, text_col, id_col, n)
    bench_sh = (shingle_docs(benchmark, bench_text_col, bench_id_col, n)
                .select(F.col("doc_id").alias("bench_id"),
                        F.col("shingle").alias("s")))
    return (corpus_sh.withColumnRenamed("shingle", "s")
            .join(F.broadcast(bench_sh), "s")
            .groupBy("doc_id", "bench_id")
            .agg(F.count(F.lit(1)).alias("n_overlap"))
            .filter(F.col("n_overlap") >= F.lit(min_overlap)))


def contaminated_doc_ids(docs: DataFrame, benchmark: DataFrame,
                         n: int = DEFAULT_NGRAM, min_overlap: int = 1,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         bench_text_col: str = "text") -> DataFrame:
    """Distinct doc_ids to quarantine (any benchmark item suffices).

    At ``min_overlap=1`` (the published-pipeline default at n=8) the
    per-pair counting is unnecessary — "shares ≥ 1 distinct shingle
    with ANY benchmark item" is a SEMI join of the corpus shingles
    against the broadcast benchmark set — so the fast path (r16,
    guide §2.3/§2.4) skips both corpus-sized steps the report pays:
    the corpus-shingle DISTINCT (the only corpus-sized exchange in
    the old plan; duplicates cannot change semi-join membership) and
    the per-(doc, bench) aggregate. The explode streams map-side
    against the broadcast hash and only MATCHED doc ids (rare at
    n=8) reach the final distinct. Same flagged set row-for-row
    (pytest-pinned); isolated sf0.1: 1.8 → 1.35 s, 6 → 4 exchanges,
    and at corpus scale the removed exchange is the one that grew
    with the corpus."""
    if min_overlap == 1:
        from .ngram import shingle_array

        corpus_sh = shingle_docs(docs, text_col, id_col, n,
                                 distinct=False)
        bench_sh = (benchmark.select(
            F.explode(shingle_array(F.col(bench_text_col), n))
            .alias("s")).distinct())
        return (corpus_sh.withColumnRenamed("shingle", "s")
                .join(F.broadcast(bench_sh), "s", "left_semi")
                .select("doc_id").distinct())
    rep = contamination_report(
        docs, benchmark, n, min_overlap, text_col, id_col,
        bench_text_col)
    return rep.select("doc_id").distinct()


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  n: int = DEFAULT_NGRAM, min_overlap: int = 1,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str = "text") -> DataFrame:
    """The corpus minus contaminated documents — a LEFT ANTI join
    against the (small) flagged-id set, so the corpus passes through
    exactly once and keeps its schema."""
    bad = contaminated_doc_ids(
        docs, benchmark, n, min_overlap, text_col, id_col,
        bench_text_col)
    return docs.join(
        F.broadcast(bad.withColumnRenamed("doc_id", id_col)),
        id_col, "left_anti")


def semantic_contamination_report(corpus_emb: DataFrame,
                                  bench_emb: DataFrame,
                                  threshold: float,
                                  vec_col: str = "embedding",
                                  id_col: str = "vec_id",
                                  bench_vec_col: str | None = None,
                                  bench_id_col: str | None = None,
                                  max_bench: int = 200_000) -> DataFrame:
    """(vec_id, bench_id, cosine): corpus embeddings within cosine ≥
    ``threshold`` of ANY benchmark embedding — the EMBEDDING-space
    complement of the n-gram guard above. Paraphrased eval items share
    no 8-gram with their source but sit next to it in embedding space;
    published decontamination pipelines run both guards.

    Spark shape — the benchmark side is small by definition (eval
    suites are thousands of items), so it rides as ONE broadcast numpy
    matrix and the corpus streams past it map-side: each Arrow batch
    scores batch × benchᵀ in a single dgemm, no shuffle, no candidate
    join, no corpus bytes moved. Linear in corpus size, embarrassingly
    parallel — the plan is Scan → ArrowEvalPython, zero Exchange
    (plan-asserted in tests). ``max_bench`` guards the contract: a
    benchmark too big to broadcast should go through the LSH near-dup
    path instead (``dedup.embedding.cosine_near_dup_pairs_lsh``).

    ``cosine`` is the double-precision GEMM value rounded to 6 dp,
    and the ≥-threshold cut is applied to the ROUNDED value, so the
    boundary is reproducible across numpy versions and batch splits.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .embedding import _normalized

    bench_vec_col = bench_vec_col or vec_col
    bench_id_col = bench_id_col or id_col
    # take(max_bench+1), not collect(): the guard must bound what
    # reaches the driver, so at most max_bench+1 rows are ever pulled
    # regardless of the benchmark's true size. Rows with NULL
    # embeddings are ignored on both sides (they have no position in
    # embedding space to match).
    vb = (_normalized(bench_emb.filter(
        F.col(bench_vec_col).isNotNull()), bench_vec_col, bench_id_col)
        .take(max_bench + 1))
    if len(vb) > max_bench:
        raise ValueError(
            f"benchmark side exceeds max_bench={max_bench}; too big "
            f"to broadcast — use the LSH near-dup path for "
            f"benchmark-vs-corpus at this size")
    corpus_id_type = corpus_emb.schema[id_col].dataType
    bench_id_type = bench_emb.schema[bench_id_col].dataType
    out_schema = T.StructType([
        T.StructField("vec_id", corpus_id_type),
        T.StructField("bench_id", bench_id_type),
        T.StructField("cosine", T.DoubleType()),
    ])
    spark = corpus_emb.sparkSession
    if not vb:
        return spark.createDataFrame([], out_schema)
    B = np.asarray([list(r.u) for r in vb], dtype=np.float64)
    bids = np.asarray([r.id for r in vb])
    # lifetime note: the broadcast stays referenced by the returned
    # plan's closure; once the caller drops the DataFrame, Python GC
    # releases the handle and Spark's ContextCleaner reclaims the
    # executor copies — no explicit destroy() is safe earlier, the
    # plan may still be re-executed.
    bc = spark.sparkContext.broadcast((bids, B))

    vc = _normalized(corpus_emb.filter(F.col(vec_col).isNotNull()),
                     vec_col, id_col)

    def score(batches):
        bida, Bm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = V.stack_batch(pdf["u"])
            S = np.round(A @ Bm.T, 6)
            ia, ib = np.nonzero(S >= threshold)
            yield pd.DataFrame({
                "vec_id": pdf["id"].to_numpy()[ia],
                "bench_id": bida[ib],
                "cosine": S[ia, ib]})

    return vc.mapInPandas(score, out_schema)


def semantic_contaminated_ids(corpus_emb: DataFrame,
                              bench_emb: DataFrame, threshold: float,
                              vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              bench_vec_col: str | None = None,
                              bench_id_col: str | None = None
                              ) -> DataFrame:
    """Distinct corpus ids to quarantine (any benchmark hit
    suffices), named after ``id_col`` for direct join-back."""
    rep = semantic_contamination_report(
        corpus_emb, bench_emb, threshold, vec_col, id_col,
        bench_vec_col, bench_id_col)
    return rep.select(F.col("vec_id").alias(id_col)).distinct()


def semantic_decontaminate(corpus_emb: DataFrame, bench_emb: DataFrame,
                           threshold: float,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           bench_vec_col: str | None = None,
                           bench_id_col: str | None = None
                           ) -> DataFrame:
    """The corpus minus embedding-space contaminated rows — broadcast
    LEFT ANTI against the flagged-id set, schema preserved."""
    bad = semantic_contaminated_ids(
        corpus_emb, bench_emb, threshold, vec_col, id_col,
        bench_vec_col, bench_id_col)
    return corpus_emb.join(F.broadcast(bad), id_col, "left_anti")
