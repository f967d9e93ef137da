"""Embedding-cosine near-duplicate pairs.

Brute-force pairwise cosine over the id-ordered half-matrix, built-in
higher-order functions only. At corpus scale the cross join is the
bottleneck — the similarity package's LSH bucketing provides the
sub-quadratic candidate generation; this module is the exact kernel
both paths share (and the verification step for LSH candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V


def cosine_near_dup_pairs(df: DataFrame, threshold: float,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """(vec_a, vec_b, cosine) for pairs with cosine ≥ threshold,
    a < b. Inputs cast float→double once before the join so the
    pairwise kernel is pure double arithmetic."""
    v = df.select(F.col(id_col).alias("id"),
                  V.as_double(F.col(vec_col)).alias("v"))
    a = v.select(F.col("id").alias("vec_a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("vec_b"), F.col("v").alias("vb"))
    cos = V.cosine(F.col("va"), F.col("vb"))
    return (a.join(b, F.col("vec_a") < F.col("vec_b"))
             .withColumn("cosine", cos)
             .filter(F.col("cosine") >= F.lit(threshold))
             .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine")))
