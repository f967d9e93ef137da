"""Gopher-style document quality rules.

Rae et al., "Scaling Language Models: ... Gopher" (2021), Appendix A
published the rule set most curation pipelines (MassiveText, Dolma,
RefinedWeb) still use: bounds on word counts and word shapes plus
repetition ratios, each cheap enough to run over every document. All
rules here are single-scan codegen expressions (split / filter /
aggregate over token and line arrays — no UDF), so the full rule set
adds one projection to a corpus pass.

``gopher_flags`` exposes each rule as its own boolean column (curation
wants per-rule incidence to debug WHY a slice is dying, not a single
verdict); ``gopher_filter`` keeps documents passing every rule.
Thresholds are the published defaults, overridable per call.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text as Tx

# published defaults (Gopher App. A, adapted to whitespace tokens)
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MAX_SYMBOL_WORD_FRAC = 0.1     # words containing # or … (ellipsis)
MIN_ALPHA_WORD_FRAC = 0.8      # words with ≥ 1 alphabetic char
MAX_DUP_LINE_FRAC = 0.3        # duplicate lines / lines


def _words(text: Column) -> Column:
    return F.filter(Tx.tokenize(text), lambda t: t != "")


def flags(text: Column,
          min_words: int = MIN_WORDS,
          max_words: int = MAX_WORDS,
          min_mean_word_len: float = MIN_MEAN_WORD_LEN,
          max_mean_word_len: float = MAX_MEAN_WORD_LEN,
          max_symbol_word_frac: float = MAX_SYMBOL_WORD_FRAC,
          min_alpha_word_frac: float = MIN_ALPHA_WORD_FRAC,
          max_dup_line_frac: float = MAX_DUP_LINE_FRAC) -> dict[str, Column]:
    """rule-name → boolean PASS column (True = keep)."""
    w = _words(text)
    n = F.size(w).cast("double")
    mean_len = F.when(n > 0, F.aggregate(
        w, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n)
    frac = lambda pred: F.when(
        n > 0, F.size(F.filter(w, pred)).cast("double") / n)
    symbol_frac = frac(lambda t: t.contains("#") | t.contains("…"))
    alpha_frac = frac(lambda t: t.rlike("[A-Za-z]"))
    lines = F.filter(F.split(text, "\n"),
                     lambda line: F.trim(line) != "")
    nl = F.size(lines).cast("double")
    dup_line_frac = F.when(
        nl > 0, (nl - F.size(F.array_distinct(lines))) / nl)
    return {
        "pass_word_count": (n >= min_words) & (n <= max_words),
        "pass_mean_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "pass_symbol_frac": symbol_frac <= max_symbol_word_frac,
        "pass_alpha_frac": alpha_frac >= min_alpha_word_frac,
        "pass_dup_lines": F.coalesce(
            dup_line_frac <= max_dup_line_frac, F.lit(False)),
    }


def all_pass(text: Column, **thresholds) -> Column:
    """AND of every rule (null text fails everything) — the single
    definition of ``pass_gopher``, shared by the flag/filter surface
    and the report/profile aggregations."""
    acc = None
    for col in flags(text, **thresholds).values():
        col = F.coalesce(col, F.lit(False))
        acc = col if acc is None else (acc & col)
    return acc


def gopher_flags(df: DataFrame, text_col: str = "text",
                 **thresholds) -> DataFrame:
    """Input plus one boolean column per rule and ``pass_gopher``
    (AND of all rules; null text fails everything)."""
    fl = flags(F.col(text_col), **thresholds)
    out = df
    for name, col in fl.items():
        out = out.withColumn(name, F.coalesce(col, F.lit(False)))
    return out.withColumn("pass_gopher",
                          all_pass(F.col(text_col), **thresholds))


def gopher_filter(df: DataFrame, text_col: str = "text",
                  **thresholds) -> DataFrame:
    """Documents passing every rule, original schema."""
    return (gopher_flags(df, text_col, **thresholds)
            .filter(F.col("pass_gopher"))
            .select(*df.columns))
