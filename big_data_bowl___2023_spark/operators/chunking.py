"""Context-window sequence chunking.

Language-model training consumes fixed-length token sequences, not
documents: every document is cut into windows of ``seq_len`` tokens
advancing by ``stride`` (stride < seq_len ⇒ overlapping windows, the
standard trick to avoid truncation loss at window boundaries).

Spark shape: tokenize → per-doc window-start index sequence →
``posexplode`` → ``slice``/``concat_ws`` per window. All codegen
(array ops), one scan, no UDF; the explode multiplies rows by
~n_tokens/stride, which is the intended output volume, not shuffle
amplification — chunking is map-side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as Tx


def chunk_sequences(df: DataFrame, seq_len: int,
                    stride: int | None = None,
                    text_col: str = "text",
                    id_col: str = "doc_id",
                    carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, seq_idx, seq_text, n_tokens[, carry...]): whitespace-
    token windows.

    The final window may be shorter than ``seq_len`` (kept — dropping
    tails biases against short documents); empty documents produce no
    rows. ``stride`` defaults to ``seq_len`` (disjoint windows, lossless
    reconstruction by concatenation). ``carry_cols`` names per-doc
    metadata columns to replicate onto every chunk row (appended after
    ``n_tokens``) — the same rows a ``doc_id`` join-back against the
    input would attach, without re-evaluating the input a second
    time."""
    if stride is None:
        stride = seq_len
    if stride <= 0 or seq_len <= 0:
        raise ValueError("seq_len and stride must be positive")
    toks = Tx.tokenize(F.col(text_col))
    n = F.size(toks)
    # number of windows: 1 for n <= seq_len, else ceil((n-L)/S) + 1
    n_seq = F.when(n <= seq_len, F.lit(1)).otherwise(
        F.ceil((n - F.lit(seq_len)) / F.lit(float(stride))) + 1)
    starts = F.sequence(F.lit(0), (n_seq - 1).cast("int"))
    window = F.slice(F.col("__toks"), F.col("seq_idx") * stride + 1,
                     seq_len)
    carried = [F.col(c) for c in carry_cols]
    # split("") yields [""] (size 1), so emptiness is a text predicate
    return (df.filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.col(id_col).alias("doc_id"), *carried,
                    toks.alias("__toks"),
                    F.explode(starts).alias("seq_idx"))
            .select("doc_id", "seq_idx",
                    F.concat_ws(" ", window).alias("seq_text"),
                    F.size(window).alias("n_tokens"), *carry_cols)
            # stride > seq_len can place the last start index past the
            # final token (ceil((n-L)/S)+1 overshoots when S doesn't
            # divide n-L evenly) — an empty window is never a chunk
            .filter(F.col("n_tokens") > 0))


def assemble_sequences(df: DataFrame, seq_len: int,
                       sep_tokens: int = 1,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Cross-document packed-sequence manifest — the GPT-style
    pretraining layout: documents concatenate end-to-end (each
    followed by ``sep_tokens`` separator/EOS tokens) and the stream
    is cut into fixed ``seq_len`` windows that CROSS document
    boundaries, so no token is lost to per-document padding.
    ``chunk_sequences`` above cuts within a document; this operator
    is the other half a trainer needs.

    Output grain: one row per (sequence × contributing document) —
    (seq_id, doc_id, doc_offset, seq_offset, span_len) — the span
    manifest a data loader uses to materialize sequence ``seq_id``
    without this job ever shuffling text: only (id, token-count) rows
    enter the window, the manifest is pure span arithmetic, and the
    loader joins text back by doc_id at read time.

    Document order is deterministic id-hash order within each
    ``group_cols`` group (same contract as ``pack_by_budget``); the
    packing is sequential per group BY DEFINITION (positions are a
    running sum), so the caller picks the parallelism unit — a global
    single-stream pack is group_cols=() and serializes into one
    window partition, the thing the grouped form exists to avoid.

    Span invariants (tested): per-doc span_len sums to the doc's
    token count (lossless); per-sequence span_len sums to seq_len
    minus that sequence's separator tokens (and less for the final
    partial sequence)."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if sep_tokens < 0:
        raise ValueError("sep_tokens must be >= 0")
    sized = (df.select(*group_cols,
                       F.col(id_col).alias("doc_id"),
                       Tx.token_count(F.col(text_col)).alias("__n"))
             .filter(F.col("__n") > 0))
    w = (Window.partitionBy(*group_cols) if group_cols
         else Window.partitionBy())
    w = (w.orderBy(F.xxhash64(F.col("doc_id")).asc(),
                   F.col("doc_id").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.col("__n") + F.lit(sep_tokens)).over(w)
    start = (cum - F.col("__n") - F.lit(sep_tokens)).alias("__start")
    spans = (sized.withColumn("__start", start)
             .withColumn("__end", F.col("__start") + F.col("__n"))
             .withColumn("seq_id", F.explode(F.sequence(
                 F.floor(F.col("__start") / seq_len),
                 F.floor((F.col("__end") - 1) / seq_len)))))
    seq_base = F.col("seq_id") * seq_len
    doc_off = F.greatest(seq_base - F.col("__start"), F.lit(0))
    seq_off = F.greatest(F.col("__start") - seq_base, F.lit(0))
    span_len = (F.least(F.col("__end"), seq_base + seq_len)
                - F.greatest(F.col("__start"), seq_base))
    return spans.select(
        *group_cols, "seq_id", "doc_id",
        doc_off.cast("bigint").alias("doc_offset"),
        seq_off.cast("bigint").alias("seq_offset"),
        span_len.cast("bigint").alias("span_len"))


def sequence_manifest(spans: DataFrame,
                      group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Collapse :func:`assemble_sequences` spans to one row per
    training sequence: (seq_id, n_docs, n_tokens, spans) where
    ``spans`` is the seq-offset-ordered array of (doc_id, doc_offset,
    seq_offset, span_len) structs — the shard-file record format.
    One groupBy on seq_id; span rows are tiny (no text)."""
    return (spans.groupBy(*group_cols, "seq_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("span_len").alias("n_tokens"),
                 F.array_sort(F.collect_list(F.struct(
                     "seq_offset", "doc_id", "doc_offset",
                     "span_len"))).alias("spans")))
