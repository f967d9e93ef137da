"""Corpus-wide exact repeated-substring removal (ExactSubstr pass).

Lee et al., "Deduplicating Training Data Makes Language Models
Better" (ACL 2022) showed that removing VERBATIM repeated substrings
— not just near-duplicate documents — measurably improves LMs; their
ExactSubstr tool does it with a single-machine suffix array over the
whole corpus, which caps out long before 100 TB. This module is the
distributed re-expression: the observation that makes it shuffle-
friendly is that *every duplicated token run of length ≥ L is
exactly a union of duplicated L-token grams*, so position-level
L-gram hashing — one narrow (hash, doc, pos) row per token position,
never the text — finds precisely the spans a suffix array would,
with plain relational operators.

Semantics (token grain, whitespace tokens — the `winnow` module's
convention): hash every L-gram at every position; a gram occurring
more than ``max_occurrences`` times corpus-wide is duplicated. Two
removal policies, as in `lines.remove_repeated_lines`:

* ``keep="none"`` — every occurrence of every duplicated gram is
  removed (what Lee et al.'s released suffix-array tool does): after
  one pass, NO originally-duplicated L-gram survives anywhere.
* ``keep="first"`` (default) — each duplicated gram's globally-first
  occurrence (min (doc_id, pos) — deterministic under any
  partitioning) is the KEPT canonical; every other occurrence is a
  removal interval [pos, pos+L), MINUS any overlap with the same
  document's own kept-canonical coverage (a relational sweep-line
  subtraction — without it, a removal interval from one gram could
  tear another gram's kept canonical when partially-overlapping runs
  pick canonicals in different documents). Guarantee: every
  duplicated L-gram's canonical occurrence survives INTACT; a run
  shared wholesale between documents therefore keeps its first copy
  whole (all its grams' canonicals coincide), while runs that only
  partially overlap across different document pairs survive as
  gram-grain canonicals that may be spread over several documents.

Within-document repeats keep the earliest occurrence. One pass is
exact for the ORIGINAL corpus's duplicated runs; removal seams can
create new token adjacencies, so a paranoid caller iterates
scrub→stats to a fixpoint (seam duplicates are rare and bounded by
the span count — same residual Lee et al. accept).

The same machinery also does SPAN-GRAIN DECONTAMINATION
(`scrub_benchmark_overlap`): cut every train occurrence of any
benchmark L-gram while keeping the rest of the document — the
surgical complement to `dedup.decontaminate`'s whole-document drop.

Scale shape (100 TB): gram hashing is map-side (one higher-order
``transform`` over the token array + one ``posexplode``); the corpus
then appears in the shuffles ONLY as 24-byte (hash, doc, pos) rows —
never text. Shuffle 1: ``groupBy(gram_hash)`` with min-struct and
count aggregates (both map-side combinable, so a boilerplate gram in
10⁶ documents partially aggregates before the exchange — no hot-key
window). Shuffle 2: occurrences join the duplicated-hash subset
(usually tiny; AQE handles residual skew). Shuffle 3: interval merge
keyed by doc. The final text rewrite joins span ARRAYS (KB-scale)
back to the corpus — broadcast when a count says they fit, so
documents are rewritten in place without ever shuffling text.

Gram identity is ``xxhash64`` of the gram string: at 2⁶⁴, colliding
two of n distinct grams needs n ≈ 10⁹·⁶ before p > 1e-3 — and a
collision only ever OVER-removes one span (safe direction for a
scrubber). The pytest oracle replays the spec in pure python on gram
STRINGS, so a collision would be caught, not mirrored.

Reference scope note: north-star extension (SURVEY.md §2 extensions,
inventory E110); the reference (R scripts, NFL tracking) has no
corpus operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# spans-per-doc rowcount below which the rewrite join broadcasts —
# the "broadcast bought with a count" pattern (dedup/embedding.py)
_BROADCAST_SPAN_DOCS = 2_000_000

# distinct gram-hash rowcount below which the benchmark side of the
# decontamination join broadcasts. Deliberately MUCH smaller than
# _BROADCAST_SPAN_DOCS: a broadcast of single-long-column xxhash64
# keys builds a LongHashedRelation over full-range longs — the exact
# shape that OOM'd the 64x stress leg (BASELINE.md E110) — so only a
# genuinely eval-set-sized table earns it
_BROADCAST_GRAM_HASHES = 250_000


def _gram_occurrences(docs: DataFrame, min_tokens: int,
                      id_col: str, text_col: str) -> DataFrame:
    """(doc_id, pos, gram_hash): every L-gram at every 1-based token
    position — map-side only (transform + posexplode), text reduced
    to a 64-bit hash before anything shuffles."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1),
                   F.size(F.col("__toks")) - F.lit(min_tokens - 1)),
        lambda i: F.xxhash64(
            F.array_join(F.slice(F.col("__toks"), i, min_tokens),
                         " ")))
    return (docs
            .filter(F.size(toks) >= min_tokens)
            .withColumn("__toks", toks)
            .select(F.col(id_col).alias("doc_id"),
                    F.posexplode(grams).alias("pos0", "gram_hash"))
            .select("doc_id", (F.col("pos0") + 1).alias("pos"),
                    "gram_hash"))


def repeated_substring_stats(docs: DataFrame, min_tokens: int = 50,
                             max_occurrences: int = 1,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """(gram_hash, n_occurrences, n_docs, first_doc, first_pos) for
    every duplicated L-gram — the audit report that sizes a scrub
    before the destructive pass. One partial-aggregated shuffle; no
    text leaves its document (fetch sample text by slicing the doc at
    (first_doc, first_pos) downstream, map-side)."""
    if min_tokens < 2:
        raise ValueError(f"min_tokens must be >= 2, got {min_tokens}")
    occ = _gram_occurrences(docs, min_tokens, id_col, text_col)
    first = F.struct(F.col("doc_id").alias("d"),
                     F.col("pos").alias("p"))
    return (occ
            .groupBy("gram_hash")
            .agg(F.count(F.lit(1)).alias("n_occurrences"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.min(first).alias("__first"))
            .filter(F.col("n_occurrences") > max_occurrences)
            .select("gram_hash", "n_occurrences", "n_docs",
                    F.col("__first.d").alias("first_doc"),
                    F.col("__first.p").alias("first_pos")))


def _merge_islands(intervals: DataFrame) -> DataFrame:
    """(doc_id, pos, end) → (doc_id, tok_start, tok_end): classic
    gaps-and-islands — an interval opens a new island iff it starts
    past the running max end of everything before it. One doc-keyed
    window over interval rows only (duplicated grams/segments, not
    the corpus)."""
    w = Window.partitionBy("doc_id").orderBy("pos", "end")
    prev_max = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    islands = (intervals
               .withColumn("__new", F.when(
                   prev_max.isNull()
                   | (F.col("pos") > prev_max), 1).otherwise(0))
               .withColumn("__island", F.sum("__new").over(
                   w.rowsBetween(Window.unboundedPreceding, 0))))
    return (islands
            .groupBy("doc_id", "__island")
            .agg(F.min("pos").alias("tok_start"),
                 F.max("end").alias("tok_end"))
            .select("doc_id", "tok_start", "tok_end"))


def _subtract_keeps(removals: DataFrame,
                    keeps: DataFrame) -> DataFrame:
    """Relational sweep-line: (doc_id, pos, end) removal intervals
    minus kept-canonical intervals, as flat segments. Boundary events
    (+1/−1 per interval edge) accumulate per doc; the span between
    consecutive boundaries is removed iff removal coverage > 0 and
    keep coverage == 0 there. Windows ride interval-boundary rows
    only — never corpus rows."""
    ev = (removals.select("doc_id", F.col("pos").alias("b"),
                          F.lit(1).alias("dr"), F.lit(0).alias("dk"))
          .unionByName(removals.select(
              "doc_id", F.col("end").alias("b"),
              F.lit(-1).alias("dr"), F.lit(0).alias("dk")))
          .unionByName(keeps.select(
              "doc_id", F.col("pos").alias("b"),
              F.lit(0).alias("dr"), F.lit(1).alias("dk")))
          .unionByName(keeps.select(
              "doc_id", F.col("end").alias("b"),
              F.lit(0).alias("dr"), F.lit(-1).alias("dk"))))
    ev = (ev.groupBy("doc_id", "b")
            .agg(F.sum("dr").alias("dr"), F.sum("dk").alias("dk")))
    w = Window.partitionBy("doc_id").orderBy("b")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    segs = (ev
            .withColumn("__r", F.sum("dr").over(run))
            .withColumn("__k", F.sum("dk").over(run))
            .withColumn("__next", F.lead("b").over(w)))
    return (segs
            .filter((F.col("__r") > 0) & (F.col("__k") == 0)
                    & F.col("__next").isNotNull())
            .select("doc_id", F.col("b").alias("pos"),
                    F.col("__next").alias("end")))


def repeated_substring_spans(docs: DataFrame, min_tokens: int = 50,
                             max_occurrences: int = 1,
                             keep: str = "first",
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """(doc_id, tok_start, tok_end): merged token intervals (1-based
    start, exclusive end) that :func:`scrub_repeated_substrings`
    removes. ``keep="none"`` covers EVERY occurrence of every
    duplicated L-gram; ``keep="first"`` covers the non-canonical
    occurrences minus each document's own kept-canonical coverage
    (module docstring — the subtraction is what makes the canonical
    survive intact)."""
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    rep = repeated_substring_stats(docs, min_tokens, max_occurrences,
                                   id_col, text_col)
    occ = _gram_occurrences(docs, min_tokens, id_col, text_col)
    # shuffle_hash, never broadcast: the duplicated-gram table is
    # proportional to the corpus's duplicated MASS (boilerplate-heavy
    # corpora make it millions of rows), and AQE's measured-size
    # broadcast of it OOM'd the 64x stress leg building a
    # LongToUnsafeRowMap over the full-range xxhash64 keys. The
    # shuffled-hash build is per-partition rep/32 and skew-safe (a
    # hot gram is ONE build row; its many probe rows stream past)
    dup = occ.join(rep.select("gram_hash", "first_doc", "first_pos")
                      .hint("shuffle_hash"),
                   "gram_hash")
    iv = lambda df: df.select(  # noqa: E731
        "doc_id", "pos", (F.col("pos") + min_tokens).alias("end"))
    if keep == "none":
        return _merge_islands(iv(dup))
    is_canon = ((F.col("doc_id") == F.col("first_doc"))
                & (F.col("pos") == F.col("first_pos")))
    removals = iv(dup.filter(~is_canon))
    keeps = iv(dup.filter(is_canon))
    return _merge_islands(_subtract_keeps(removals, keeps))


def scrub_repeated_substrings(docs: DataFrame, min_tokens: int = 50,
                              max_occurrences: int = 1,
                              keep: str = "first",
                              id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """Rewrite ``text_col`` with duplicated substrings removed under
    the ``keep`` policy; all other columns pass through unchanged.
    Documents with no removal span keep their ORIGINAL text byte-for-
    byte; affected documents are re-serialized from their surviving
    tokens with single spaces (the operator is token-grain — original
    inter-token whitespace inside a rewritten document is not
    preserved, same contract as the winnow/packing family). A fully-
    covered document comes back with empty text (dropping it is the
    quality gate's call, as in `remove_repeated_lines`).

    The span arrays are corpus-tiny; a count decides whether they
    broadcast (`_BROADCAST_SPAN_DOCS`) so the rewrite never shuffles
    document text — above the cap it falls back to a plain join and
    lets AQE plan it."""
    spans = repeated_substring_spans(docs, min_tokens,
                                     max_occurrences, keep, id_col,
                                     text_col)
    return _rewrite_with_spans(docs, spans, id_col, text_col)


def _rewrite_with_spans(docs: DataFrame, spans: DataFrame,
                        id_col: str, text_col: str) -> DataFrame:
    """Drop the tokens covered by (doc_id, tok_start, tok_end)
    intervals from each document's text; docs with no span keep
    their original text byte-for-byte. Shared by the repeated-
    substring scrub and the benchmark-overlap scrub."""
    from ..session import pin

    per_doc = (spans.groupBy("doc_id")
               .agg(F.collect_list(
                   F.struct(F.col("tok_start").alias("s"),
                            F.col("tok_end").alias("e")))
                   .alias("__spans")))
    # pin before the sizing count, or the whole multi-shuffle span
    # pipeline would run twice — once for the count, once for the
    # rewrite join (the counted-broadcast precedent in
    # dedup/embedding.py pins for exactly this reason)
    per_doc = pin(per_doc)
    n_affected = per_doc.count()
    if n_affected == 0:
        return docs
    rhs = (F.broadcast(per_doc)
           if n_affected <= _BROADCAST_SPAN_DOCS else per_doc)
    joined = docs.join(
        rhs.withColumnRenamed("doc_id", "__span_doc"),
        F.col(id_col) == F.col("__span_doc"), "left")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("__spans"),
            lambda sp: (i + 1 >= sp.s) & (i + 1 < sp.e)))
    rewritten = F.when(F.col("__span_doc").isNull(),
                       F.col(text_col)) \
                 .otherwise(F.array_join(kept, " "))
    return (joined
            .withColumn(text_col, rewritten)
            .drop("__span_doc", "__spans"))


def benchmark_overlap_spans(train: DataFrame, benchmark: DataFrame,
                            min_tokens: int = 8,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            bench_id_col: str = "doc_id",
                            bench_text_col: str = "text"
                            ) -> DataFrame:
    """(doc_id, tok_start, tok_end): merged token intervals of every
    TRAIN occurrence of any benchmark L-gram — the span-grain
    decontamination complement to `dedup.decontaminate` (which drops
    whole documents): here only the leaked benchmark text itself is
    cut, the rest of the document survives. PaLM/FLAN-style surgical
    decontamination.

    Scale shape: benchmark gram hashes are DISTINCT-deduped and
    usually eval-set-tiny — broadcast when a count (on a pinned
    frame) says they fit, shuffled-hash otherwise; the train corpus
    rides the join as (hash, doc, pos) rows only."""
    if min_tokens < 2:
        raise ValueError(f"min_tokens must be >= 2, got {min_tokens}")
    from ..session import pin

    bench = (_gram_occurrences(benchmark, min_tokens, bench_id_col,
                               bench_text_col)
             .select("gram_hash").distinct())
    bench = pin(bench)
    n_grams = bench.count()
    occ = _gram_occurrences(train, min_tokens, id_col, text_col)
    rhs = (F.broadcast(bench) if n_grams <= _BROADCAST_GRAM_HASHES
           else bench.hint("shuffle_hash"))
    hits = occ.join(rhs, "gram_hash")
    return _merge_islands(hits.select(
        "doc_id", "pos", (F.col("pos") + min_tokens).alias("end")))


def scrub_benchmark_overlap(train: DataFrame, benchmark: DataFrame,
                            min_tokens: int = 8,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            bench_id_col: str = "doc_id",
                            bench_text_col: str = "text"
                            ) -> DataFrame:
    """Rewrite train ``text_col`` with every benchmark-overlapping
    span removed (same rewrite contract as
    `scrub_repeated_substrings`: unaffected docs byte-identical,
    affected docs re-serialized whitespace-normalized, fully-covered
    docs come back empty — dropping them is the quality gate's
    call). After one pass no L-gram of the ORIGINAL train text that
    appears anywhere in the benchmark survives."""
    spans = benchmark_overlap_spans(train, benchmark, min_tokens,
                                    id_col, text_col, bench_id_col,
                                    bench_text_col)
    return _rewrite_with_spans(train, spans, id_col, text_col)


def scrub_to_fixpoint(docs: DataFrame, min_tokens: int = 50,
                      max_occurrences: int = 1, keep: str = "first",
                      max_rounds: int = 5,
                      id_col: str = "doc_id",
                      text_col: str = "text"
                      ) -> tuple[DataFrame, int]:
    """(scrubbed, rounds_run): iterate :func:`scrub_repeated_substrings`
    until a pass finds nothing to remove — the paranoid closure over
    removal seams (dropping a span joins its neighbors into NEW token
    adjacencies, which can themselves duplicate; one extra round
    almost always drains them, the docstring's documented residual).
    Each round's output is pinned (`session.pin` — durable-aware), so
    the iterative lineage stays flat instead of stacking one full
    span pipeline per round. Returns after the first round that
    removes nothing, or after ``max_rounds`` (the pathological-corpus
    bound: rounds strictly shrink total token count, so termination
    is guaranteed anyway, but a runaway cap beats a proof when a job
    bills by the hour)."""
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    from ..session import pin

    out = docs
    for rounds in range(1, max_rounds + 1):
        nxt = scrub_repeated_substrings(out, min_tokens,
                                        max_occurrences, keep,
                                        id_col, text_col)
        if nxt is out:              # zero-span fast path: converged
            return out, rounds
        out = pin(nxt)
    return out, max_rounds
