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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as Tx


def chunk_sequences(df: DataFrame, seq_len: int,
                    stride: int | None = None,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, seq_idx, seq_text, n_tokens): whitespace-token windows.

    The final window may be shorter than ``seq_len`` (kept — dropping
    tails biases against short documents); empty documents produce no
    rows. ``stride`` defaults to ``seq_len`` (disjoint windows, lossless
    reconstruction by concatenation)."""
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
    # split("") yields [""] (size 1), so emptiness is a text predicate
    return (df.filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.col(id_col).alias("doc_id"),
                    toks.alias("__toks"),
                    F.explode(starts).alias("seq_idx"))
            .select("doc_id", "seq_idx",
                    F.concat_ws(" ", window).alias("seq_text"),
                    F.size(window).alias("n_tokens"))
            # stride > seq_len can place the last start index past the
            # final token (ceil((n-L)/S)+1 overshoots when S doesn't
            # divide n-L evenly) — an empty window is never a chunk
            .filter(F.col("n_tokens") > 0))
