"""PII redaction for corpus curation.

Web-scale training corpora ship personal data unless scrubbed; the
standard pipelines (C4, Dolma, RefinedWeb) run regex redaction for
well-formed identifier shapes before anything else sees the text.
Design constraints here:

* patterns are deliberately CONSERVATIVE, deterministic, and written
  in the common subset of Java regex and RE2 — identical semantics in
  Spark codegen and any external auditor (the tests replay them in
  DuckDB);
* redaction is a chain of ``regexp_replace`` expressions — pure
  codegen, one scan, no UDF;
* the report counts matches per kind BEFORE replacement
  (``regexp_count``), because curation needs the incidence rate per
  source/shard to decide whether a slice is droppable rather than
  scrubbable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# kind -> (pattern, replacement token). Order matters: emails before
# phones so the digits inside an address never match a phone shape.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b(\+?\d{1,2}[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def redact_text(col, kinds: list[str] | None = None) -> F.Column:
    """Text with every PII match replaced by ``[PII-<kind>]`` — a
    chained regexp_replace, applied in PII_PATTERNS order."""
    out = col
    for kind in (kinds or list(PII_PATTERNS)):
        out = F.regexp_replace(out, PII_PATTERNS[kind],
                               f"[PII-{kind}]")
    return out


def redaction_report(df: DataFrame, text_col: str = "text",
                     group_cols: list[str] | None = None) -> DataFrame:
    """Match counts per kind (and per group when given) over the raw
    text — one aggregation scan. ``docs_with_pii`` counts documents
    with ≥ 1 match of any kind."""
    counts = [
        F.sum(F.regexp_count(F.col(text_col), F.lit(pat)))
        .alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()]
    any_hit = None
    for pat in PII_PATTERNS.values():
        hit = F.regexp_count(F.col(text_col), F.lit(pat)) > 0
        any_hit = hit if any_hit is None else (any_hit | hit)
    counts.append(
        F.sum(any_hit.cast("long")).alias("docs_with_pii"))
    counts.append(F.count(F.lit(1)).alias("n_docs"))
    if group_cols:
        return df.groupBy(*group_cols).agg(*counts)
    return df.agg(*counts)


def redact_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus with ``text_col`` scrubbed in place — schema
    otherwise unchanged, so the op drops into any curation chain."""
    return df.withColumn(text_col, redact_text(F.col(text_col)))
