"""Exact deduplication: hash-groupBy on a normalized fingerprint.

One shuffle on the fingerprint (uniform md5 keys → no skew), keep the
lowest id per group. At 100 TB this is the cheapest dedup pass and
always runs first to shrink the near-dup candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as Tx


def fingerprint_docs(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    return df.withColumn("fingerprint", Tx.fingerprint(F.col(text_col)))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the representative (min id) per fingerprint group.

    row_number over the fingerprint partition: a single shuffle and no
    join-back (vs groupBy-min + self-join = two shuffles).
    """
    fp = fingerprint_docs(df, text_col, id_col)
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    return (fp.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1)
              .drop("__rn"))


def corpus_diff(old: DataFrame, new: DataFrame,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Snapshot diff between two corpus versions, one row per
    changed document: (doc_id, change ∈ {added, removed, modified}).

    Semantics by id and content fingerprint: an id only in ``new`` is
    ``added``, only in ``old`` is ``removed``, in both with a
    different normalized-text fingerprint is ``modified``; unchanged
    docs are omitted. This is the audit pass an incremental curation
    pipeline runs before reprocessing — only ``added``/``modified``
    ids need to flow through dedup/scoring again, and ``removed`` ids
    need tombstoning in downstream indexes.

    One full-outer join on the id (both sides pre-projected to
    (id, fingerprint) — column pruning keeps the 100 TB text columns
    out of the shuffle entirely)."""
    o = fingerprint_docs(old, text_col, id_col) \
        .select(F.col(id_col), F.col("fingerprint").alias("__old_fp"))
    n = fingerprint_docs(new, text_col, id_col) \
        .select(F.col(id_col), F.col("fingerprint").alias("__new_fp"))
    j = o.join(n, id_col, "full_outer")
    change = (F.when(F.col("__old_fp").isNull(), F.lit("added"))
              .when(F.col("__new_fp").isNull(), F.lit("removed"))
              .when(F.col("__old_fp") != F.col("__new_fp"),
                    F.lit("modified")))
    return (j.withColumn("change", change)
             .filter(F.col("change").isNotNull())
             .select(id_col, "change"))
