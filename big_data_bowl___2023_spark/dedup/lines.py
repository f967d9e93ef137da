"""Corpus-wide repeated-line removal (C4 / RefinedWeb boilerplate
pass).

Web corpora are full of lines that recur verbatim across many
documents — navigation text, cookie banners, license footers. The C4
pipeline (Raffel et al. 2020, §2.2: "we discarded all but one of any
three-sentence span occurring more than once") and RefinedWeb /
Dolma's "repeated line removal" both strip them corpus-wide, not
per-document — which makes this a distributed global-aggregation
problem, not a map-side cleanup.

Semantics here: split each document into lines, count every
sufficiently-long normalized line across the WHOLE corpus, and for
each line occurring more than ``max_occurrences`` times either keep
only its globally-first occurrence (``keep="first"``, the C4 rule) or
drop every occurrence (``keep="none"``, the boilerplate-scrub rule).
Short lines (< ``min_chars`` after trim) pass through untouched —
they are headers/blank separators, and exempting them also bounds the
hot-key skew of the global count (the empty line would otherwise be
the hottest key in any corpus).

Scale shape (100 TB): one ``posexplode`` (map-side, no shuffle), one
``groupBy(line_hash)`` count — partial aggregation absorbs hot lines
map-side before the exchange — one hash-keyed join of lines against
the repeated subset only (AQE handles residual skew), and one
``groupBy(doc)`` reassembly shuffle. No window over the line hash:
a window would force every occurrence of a hot line through a single
task, exactly the skew the groupBy+join shape avoids.

Reference scope note: north-star extension (SURVEY.md §2 extensions);
the reference (R scripts, NFL tracking) has no corpus operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _regex_quote(s: str) -> str:
    """Java ``Pattern.quote``: wrap in \\Q...\\E, splicing around any
    embedded \\E. ``F.split`` treats its pattern as a Java regex while
    ``array_join`` (the rejoin side) uses the delimiter literally —
    without quoting, a regex-special delimiter like '.' or '|' would
    split on the pattern but rejoin the raw characters, silently
    corrupting text."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def split_lines(docs: DataFrame, delimiter: str = "\n",
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, line_no, line): one row per line, order preserved via
    ``posexplode`` — map-side only, no shuffle. ``delimiter`` is a
    literal string (regex-quoted before it reaches ``F.split``)."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _regex_quote(delimiter)))
         .alias("line_no", "line"))


def repeated_line_stats(docs: DataFrame, min_chars: int = 30,
                        delimiter: str = "\n",
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        max_occurrences: int = 1) -> DataFrame:
    """(line_hash, n_occurrences, n_docs, first_doc, first_line_no,
    sample_line) for every eligible line occurring more than
    ``max_occurrences`` times — the audit report that decides
    thresholds before a destructive pass. One groupBy shuffle.
    ``sample_line`` is the line text at the globally-first occurrence
    (``min_by`` on (id, line_no)) — deterministic under any
    partitioning, so the report is rerun-stable."""
    lines = split_lines(docs, delimiter, id_col, text_col)
    norm = F.trim(F.col("line"))
    eligible = lines.filter(F.length(norm) >= min_chars).select(
        F.col(id_col), "line_no", "line",
        F.md5(norm).alias("line_hash"))
    first = F.struct(F.col(id_col).alias("d"),
                     F.col("line_no").alias("l"))
    return (eligible
            .groupBy("line_hash")
            .agg(F.count(F.lit(1)).alias("n_occurrences"),
                 F.countDistinct(id_col).alias("n_docs"),
                 F.min(first).alias("_first"),
                 F.min_by("line", first).alias("sample_line"))
            .filter(F.col("n_occurrences") > max_occurrences)
            .select("line_hash", "n_occurrences", "n_docs",
                    F.col("_first.d").alias("first_doc"),
                    F.col("_first.l").alias("first_line_no"),
                    "sample_line"))


def remove_repeated_lines(docs: DataFrame, min_chars: int = 30,
                          keep: str = "first",
                          delimiter: str = "\n",
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          max_occurrences: int = 1) -> DataFrame:
    """Rewrite ``text_col`` with corpus-wide repeated lines removed;
    every other column passes through unchanged. ``keep="first"``
    retains each repeated line's globally-first occurrence (ordered by
    (id, line_no) — deterministic, partitioning-invariant); ``"none"``
    drops all occurrences. Documents whose every line is removed come
    back with empty text (dropping them is the quality gate's call,
    not this operator's)."""
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")

    rep = repeated_line_stats(docs, min_chars, delimiter, id_col,
                              text_col, max_occurrences)
    # Pass-through columns ride the explode and are re-emitted by the
    # reassembly groupBy (``first`` — constant within a doc), so the
    # input is consumed exactly twice (stats pass + rewrite pass).
    # The previous shape joined the rebuilt text back against
    # ``docs``, which evaluated the whole upstream chain a third
    # time — at corpus scale a full extra pass for a per-doc
    # metadata attach (guide §2.4). ``posexplode_outer`` keeps
    # NULL-text docs in the rewrite pass (they rebuild to "", as the
    # old join-back shape returned for them).
    others = [c for c in docs.columns if c not in (id_col, text_col)]
    lines = docs.select(
        F.col(id_col), *[F.col(c) for c in others],
        F.posexplode_outer(
            F.split(F.col(text_col), _regex_quote(delimiter)))
         .alias("line_no", "line"))
    norm = F.trim(F.col("line"))
    keyed = lines.withColumn(
        "line_hash",
        F.when(F.length(norm) >= min_chars, F.md5(norm)))
    # Join only against the repeated subset (usually tiny relative to
    # the corpus); null line_hash (short/exempt lines) never matches.
    marked = keyed.join(
        rep.select("line_hash", "first_doc", "first_line_no"),
        "line_hash", "left")
    is_kept = (
        F.col("first_doc").isNull()
        | ((F.lit(keep == "first"))
           & (F.col(id_col) == F.col("first_doc"))
           & (F.col("line_no") == F.col("first_line_no"))))
    # Removed lines become NULL structs (collect_list skips them), so
    # every doc keeps its reassembly row — a doc whose every line is
    # removed (or whose text is NULL) comes back with empty text,
    # same as the old left-join + coalesce('') contract.
    rebuilt = (marked
               .groupBy(id_col)
               .agg(*[F.first(c).alias(c) for c in others],
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.when(is_kept,
                                       F.struct("line_no", "line")))),
                            lambda s: s.line),
                        delimiter, "").alias("__rebuilt")))
    return rebuilt.select(
        *[F.col(c) if c != text_col
          else F.col("__rebuilt").alias(text_col)
          for c in docs.columns])
