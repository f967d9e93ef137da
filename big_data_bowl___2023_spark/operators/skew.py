"""Join/aggregation key-skew profiling.

A shuffle's wall time is its largest partition: one hot key turns a
1000-executor stage into a single straggler. Before committing a 100
TB join plan, profile the key column — the output feeds a concrete
decision rule:

* ``top_share`` ≲ 1/shuffle-partitions → uniform; plain shuffle.
* moderately hot keys → AQE skew-join splitting handles it.
* a key holding whole percents of the table → ``salted_join``
  (operators/joins.py) with ``n_salts ≈ ceil(top_rows / target
  partition rows)``, or broadcast the other side if it is small.

One aggregation pass over the keys (map-side partial counts), a tiny
top-N window on the grouped result — never a sort of the raw table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key_cols: Sequence[str],
                top_n: int = 10) -> DataFrame:
    """Top-N hottest key values with absolute and relative weight:
    (key columns…, n_rows, share, cum_share, rank). ``share`` is the
    fraction of all rows under that key — the number to compare with
    1/shuffle-partitions."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = F.sum("n_rows").over(Window.partitionBy())
    w = Window.partitionBy().orderBy(
        F.desc("n_rows"), *[F.asc(c) for c in key_cols])
    return (counts
            .withColumn("share", F.round(F.col("n_rows") / total, 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_n)
            .withColumn("cum_share",
                        F.round(F.sum("share").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)),
                            6))
            .select(*key_cols, "n_rows", "share", "cum_share", "rank"))


def skew_stats(df: DataFrame, key_cols: Sequence[str]) -> dict:
    """Scalar skew summary for plan decisions: distinct key count,
    max/mean rows per key, top-key share, and a suggested salt count
    (rows of the hottest key / mean rows per key, ≥ 1). One job."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    row = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_per_key"),
        F.avg("n").alias("mean_per_key")).collect()[0]
    top_share = row.max_per_key / row.n_rows
    return {
        "n_keys": row.n_keys,
        "n_rows": row.n_rows,
        "max_per_key": row.max_per_key,
        "mean_per_key": float(row.mean_per_key),
        "top_share": top_share,
        "suggested_salts": max(
            1, int(row.max_per_key / max(1.0, row.mean_per_key))),
    }
