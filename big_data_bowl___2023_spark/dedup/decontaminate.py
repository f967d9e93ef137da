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
    """Distinct doc_ids to quarantine (any benchmark item suffices)."""
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
