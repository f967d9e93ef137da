"""Learned subword tokenization — byte-pair-encoding training + apply.

Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words
with Subword Units" (ACL 2016). The reference repo stops at whitespace
tokens (see ``text.tokenize``); a training-data pipeline needs the
learned-subword layer on top — token budgets, packing and vocab
coverage are all defined in subword units.

Scale shape (the split every production tokenizer trainer uses —
the corpus-sized work is counting, the merge loop is not):

* ``word_frequencies`` is the ONLY corpus-sized pass: one grouped
  count over the exploded normalized tokens (one shuffle, carrying
  (word, count) — never document text).
* ``train_bpe`` runs over the word-TYPE table, which is bounded by
  ``max_types`` (kept by mass, deterministic tiebreak) — types grow
  ~O(sqrt(corpus)) (Heaps' law), and the cap makes the driver-side
  step O(max_types · word_len) regardless of corpus size. The merge
  loop itself maintains incremental pair counts with a pair→words
  index, so each merge touches only the words containing it.
* The learned merge table is a KB-sized DataFrame artifact
  (rank, left, right, merged) — parquet round-trippable, mergeable
  into any session.
* ``apply_bpe`` is map-side only: the ranks dict rides the UDF
  closure (broadcast by Spark), encoding is an Arrow-batched
  pandas UDF with a per-batch word memo (Zipf: a batch of documents
  repeats few distinct words), and the plan adds zero Exchange.

End-of-word convention: each word's symbol sequence is its characters
followed by a final end-of-word marker symbol, so subwords are
position-aware ("t"+"he·" vs "the"+"re·"). The marker is a single
SPACE — the one character a normalized word can never contain
(``normalize`` collapses whitespace and words are split on it), so
the round trip is collision-proof by construction: a text-derived
marker like the classic ``"</w>"`` would mis-decode any corpus that
contains that literal substring, while ``concat → trim`` over
space-marked tokens is exactly the normalized text, always.
"""

from __future__ import annotations

import math
from collections import defaultdict
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import norm_tokens

END = " "

MERGE_SCHEMA = T.StructType([
    T.StructField("rank", T.LongType(), False),
    T.StructField("left", T.StringType(), False),
    T.StructField("right", T.StringType(), False),
    T.StructField("merged", T.StringType(), False),
])


# Per-TASK encode memo bound: one dict per partition; once full,
# unseen words fall back to recomputation (bounded memory, never
# unbounded growth). Module-level so the stress harness measures
# against the SAME number it asserts about (review r10 finding: a
# closure-local copy let the two drift).
MEMO_CAP = 500_000


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n): corpus word-type frequency table over the canonical
    normalized words (``text.norm_tokens`` — the same definition the
    BM25 postings tokenize through; note ``vocab.build_vocab`` counts
    RAW whitespace tokens, without normalization). The one
    corpus-sized pass of BPE training; everything downstream is
    bounded by the type count."""
    return (df.select(F.explode(norm_tokens(F.col(text_col)))
                       .alias("word"))
              .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def merge_word_frequencies(*freq_tables: DataFrame) -> DataFrame:
    """Merge law for the word-frequency artifact: counts are
    additive, so per-ingest-batch (word, n) tables union+sum to
    EXACTLY the whole-corpus table — which makes tokenizer training
    incremental: accumulate a frequency artifact per batch, merge,
    and `train_bpe` the merged table; the result is bit-identical to
    training on the concatenated corpus (training is a deterministic
    function of the type table). Same artifact pattern as the sketch
    families, but exact — word counts need no approximation."""
    if not freq_tables:
        raise ValueError("merge_word_frequencies needs ≥1 table")
    out = freq_tables[0]
    for t in freq_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("word").agg(F.sum("n").alias("n"))


def token_drift(ref_counts: DataFrame, cur_counts: DataFrame,
                max_categories: int = 200) -> dict:
    """PSI between two token count tables (e.g. `bpe_token_counts`
    of a reference snapshot vs a new ingest batch) — tokenizer-drift
    monitoring: a rising PSI means the learned vocabulary no longer
    fits the incoming text (new domain, new language, format shift)
    and the merge table is due an incremental retrain.

    Same conventions as `operators.drift.psi_report_categorical`
    (reference's top ``max_categories`` tokens by (n desc, token
    asc) are the bins, everything else folds into __other__, 1e-6
    share smoothing, 6-dp round), but computed from the ALREADY
    AGGREGATED count tables — vocab-sized inputs, so this is ONE
    tiny collect per table and driver arithmetic, no corpus scan
    (the reference top-K bins derive from the same collected list,
    sorted driver-side — not a second Spark job). Returns
    ``{"psi": float, "n_ref": int, "n_cur": int,
    "n_categories_used": int}``."""
    import math

    eps = 1e-6
    ref_rows = [(r["token"], int(r["n"]))
                for r in ref_counts.collect()]
    cur_rows = [(r["token"], int(r["n"]))
                for r in cur_counts.collect()]
    ranked = sorted(ref_rows, key=lambda kv: (-kv[1], kv[0]))
    keep = {t for t, _ in ranked[:max_categories]}

    def shares(rows: list[tuple[str, int]]) -> dict[str, int]:
        out: dict[str, int] = {}
        for t, n in rows:
            b = t if t in keep else "__other__"
            out[b] = out.get(b, 0) + n
        return out

    cr, cc = shares(ref_rows), shares(cur_rows)
    nr, nc = sum(cr.values()), sum(cc.values())
    psi = 0.0
    for b in set(cr) | set(cc):
        p = max(cr.get(b, 0) / max(nr, 1), eps)
        q = max(cc.get(b, 0) / max(nc, 1), eps)
        psi += (q - p) * math.log(q / p)
    return {"psi": round(psi, 6), "n_ref": nr, "n_cur": nc,
            "n_categories_used": len(set(cr) | set(cc))}


def _merge_word(sym: tuple[str, ...], left: str,
                right: str) -> tuple[str, ...]:
    """Replace every (left, right) adjacency left-to-right. The
    overlapping-run convention (('a','a','a') with pair (a,a) →
    ('aa','a')) follows from the scan order — both trainer and
    encoder use this one function, so they can never disagree."""
    out: list[str] = []
    i, n, merged = 0, len(sym), left + right
    while i < n:
        if i < n - 1 and sym[i] == left and sym[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _train_merges(types: list[tuple[str, int]], num_merges: int,
                  min_pair_count: int) -> list[tuple[int, str, str, str]]:
    """Incremental BPE over the (word, freq) type table: pair counts
    plus a pair→word-index map, so each merge re-scans only the words
    that contain the merged pair. Deterministic: ties break on the
    pair itself (count desc, (left, right) asc)."""
    words = [tuple(w) + (END,) for w, _ in types]
    freqs = [n for _, n in types]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)

    def _index(i: int, sign: int) -> None:
        w, n = words[i], freqs[i] * sign
        for p in zip(w, w[1:]):
            pair_counts[p] += n
            if sign > 0:
                pair_words[p].add(i)
            else:
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(i)

    for i in range(len(words)):
        _index(i, 1)

    merges: list[tuple[int, str, str, str]] = []
    for rank in range(num_merges):
        if not pair_counts:
            break
        (left, right), count = min(pair_counts.items(),
                                   key=lambda kv: (-kv[1], kv[0]))
        if count < min_pair_count:
            break
        merges.append((rank, left, right, left + right))
        for i in sorted(pair_words[(left, right)]):
            _index(i, -1)
            words[i] = _merge_word(words[i], left, right)
            _index(i, 1)
    return merges


def train_bpe(word_freqs: DataFrame, num_merges: int = 200,
              min_pair_count: int = 2,
              max_types: int = 1_000_000) -> DataFrame:
    """Learn the merge table from a ``word_frequencies`` output →
    (rank, left, right, merged), rank 0 first. Stops early when no
    pair reaches ``min_pair_count``.

    ``max_types`` caps the driver-side type table: kept by
    (n desc, word asc), so the dropped tail is the lowest-mass types
    — at web-corpus scale the top 1M types carry >99.9% of token
    mass, and rare-type tails are exactly what BPE's character
    fallback is for. The collect is (word, count) only."""
    spark = word_freqs.sparkSession
    rows = (word_freqs.orderBy(F.desc("n"), F.asc("word"))
                      .limit(max_types).collect())
    types = [(r["word"], int(r["n"])) for r in rows]
    # collect() order is plan-dependent on ties; re-sort so training
    # sees one canonical order regardless of partitioning.
    types.sort(key=lambda t: (-t[1], t[0]))
    merges = _train_merges(types, num_merges, min_pair_count)
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def bpe_merges_from_corpus(df: DataFrame, text_col: str = "text",
                           num_merges: int = 200,
                           min_pair_count: int = 2,
                           max_types: int = 1_000_000) -> DataFrame:
    """Convenience: ``word_frequencies`` → ``train_bpe``."""
    return train_bpe(word_frequencies(df, text_col), num_merges,
                     min_pair_count, max_types)


def _collect_ranks(merges: DataFrame) -> dict[tuple[str, str], int]:
    return {(r["left"], r["right"]): int(r["rank"])
            for r in merges.select("rank", "left", "right").collect()}


def _encode_word(word: str,
                 ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first application — equivalent to replaying
    the merge list in rank order (each step applies the earliest
    learned merge still present), so training words reproduce their
    training-time segmentation."""
    sym: tuple[str, ...] = tuple(word) + (END,)
    while len(sym) > 1:
        best = min(set(zip(sym, sym[1:])),
                   key=lambda p: ranks.get(p, math.inf))
        if best not in ranks:
            break
        sym = _merge_word(sym, best[0], best[1])
    return list(sym)


def apply_bpe(df: DataFrame, merges: DataFrame, text_col: str = "text",
              out_col: str = "bpe_tokens") -> DataFrame:
    """Add ``out_col``: array<string> of learned subword tokens for
    the normalized text. Map-side only — the merge table collapses to
    a ranks dict in the UDF closure (it is a bounded KB artifact) and
    encoding batches through Arrow with a per-partition word memo
    (Zipf: the same words recur, so most lookups hit; the memo is
    CAPPED so a pathological high-type-cardinality partition degrades
    to recomputation instead of unbounded executor memory). NULL
    text stays NULL; empty text → empty array. Characters unseen in
    training fall through as single-character symbols (BPE's
    open-vocabulary property)."""
    ranks = _collect_ranks(merges)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(tok_batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        memo: dict[str, list[str]] = {}

        def enc_doc(tokens):
            if tokens is None:
                return None
            out: list[str] = []
            for w in tokens:
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    if len(memo) < MEMO_CAP:
                        memo[w] = got
                out.extend(got)
            return out

        for toks in tok_batches:
            yield toks.map(enc_doc)

    return df.withColumn(out_col,
                         encode(norm_tokens(F.col(text_col))))


def bpe_token_counts(df: DataFrame, merges: DataFrame,
                     text_col: str = "text") -> DataFrame:
    """(token, n): corpus subword frequency table under the learned
    merges — the vocabulary-with-frequencies surface (every emitted
    symbol, merged or single-character fallback, with its corpus
    count). One encode scan + one grouped count."""
    encoded = apply_bpe(df, merges, text_col, "__bpe")
    return (encoded.select(F.explode("__bpe").alias("token"))
                   .groupBy("token").agg(F.count(F.lit(1)).alias("n")))


def bpe_decode(tokens_col: F.Column) -> F.Column:
    """Inverse of ``apply_bpe`` as a column expression: concatenate
    subwords — each word's last token carries the space end-marker,
    so the concatenation IS the normalized text plus one trailing
    space, trimmed off. Lossless for ANY corpus content (the marker
    cannot occur inside a word; checked as a round-trip contract in
    the tests, including text containing the literal "</w>")."""
    return F.trim(F.array_join(tokens_col, ""))
