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
