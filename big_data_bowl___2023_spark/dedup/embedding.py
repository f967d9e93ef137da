"""Embedding-cosine near-duplicate pairs.

Two exact implementations plus guidance for scale:

* ``cosine_near_dup_pairs`` — built-in higher-order functions only
  (normalize once, dot-fold per pair). Oracle-reproducible arithmetic.
* ``cosine_near_dup_pairs_gemm`` — block-matrix path: vectors grouped
  into blocks, block pairs cross-joined, each block pair multiplied
  with one numpy GEMM inside ``mapInPandas``. ~vectorized-C speed,
  output pairs identical; float sums associate differently, so it is
  rows-only for the driver oracle.

At corpus scale neither O(n²) variant is the plan — LSH bucketing
(similarity.ann) generates sub-quadratic candidates and these kernels
verify them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import vectors as V


def cosine_near_dup_pairs(df: DataFrame, threshold: float,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """(vec_a, vec_b, cosine) for pairs with cosine ≥ threshold,
    a < b.

    Vectors are cast to double and L2-normalized ONCE (O(n)) before
    the pair join, so the O(n²) kernel is a single dot-product fold —
    the norm folds would otherwise be recomputed n times per vector.
    The normalize-then-dot arithmetic is mirrored exactly by the
    DuckDB oracle (same element order, same operations).
    """
    v = df.select(F.col(id_col).alias("id"),
                  V.l2_normalize(V.as_double(F.col(vec_col))).alias("u"))
    a = v.select(F.col("id").alias("vec_a"), F.col("u").alias("ua"))
    b = v.select(F.col("id").alias("vec_b"), F.col("u").alias("ub"))
    cos = V.dot(F.col("ua"), F.col("ub"))
    return (a.join(b, F.col("vec_a") < F.col("vec_b"))
             .withColumn("cosine", cos)
             .filter(F.col("cosine") >= F.lit(threshold))
             .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine")))


_PAIR_SCHEMA = T.StructType([
    T.StructField("vec_a", T.LongType()),
    T.StructField("vec_b", T.LongType()),
    T.StructField("cosine", T.DoubleType()),
])


def cosine_near_dup_pairs_gemm(df: DataFrame, threshold: float,
                               vec_col: str = "embedding",
                               id_col: str = "vec_id",
                               n_blocks: int = 16) -> DataFrame:
    """Block-GEMM exact pairs: O(n²) flops but executed as
    (n_blocks²)/2 numpy matrix products instead of 12M+ expression
    folds. Each block row carries ~n/n_blocks unit vectors; a block
    pair's similarities are one ``A @ B.T``. Scale knob: n_blocks
    grows with n so a block stays ~10-100 MB."""
    import numpy as np

    v = df.select(F.col(id_col).alias("id"),
                  V.l2_normalize(V.as_double(F.col(vec_col))).alias("u"))
    blocks = (v.withColumn("blk", F.pmod(F.col("id"), F.lit(n_blocks)))
              .groupBy("blk")
              .agg(F.collect_list("id").alias("ids"),
                   F.collect_list("u").alias("vecs")))
    a = blocks.select(F.col("blk").alias("blk_a"),
                      F.col("ids").alias("ids_a"),
                      F.col("vecs").alias("vecs_a"))
    b = blocks.select(F.col("blk").alias("blk_b"),
                      F.col("ids").alias("ids_b"),
                      F.col("vecs").alias("vecs_b"))
    block_pairs = a.join(b, F.col("blk_a") <= F.col("blk_b"))

    def gemm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for _, row in pdf.iterrows():
                ids_a = np.asarray(row["ids_a"])
                ids_b = np.asarray(row["ids_b"])
                A = np.asarray([np.asarray(x) for x in row["vecs_a"]])
                B = np.asarray([np.asarray(x) for x in row["vecs_b"]])
                sims = A @ B.T
                ia, ib = np.nonzero(sims >= threshold)
                pa, pb, pc = ids_a[ia], ids_b[ib], sims[ia, ib]
                if row["blk_a"] == row["blk_b"]:
                    # self-pairing block: matrix holds (i,j) AND (j,i)
                    keep = pa < pb
                    pa, pb, pc = pa[keep], pb[keep], pc[keep]
                else:
                    # distinct blocks: each unordered pair appears
                    # once; normalize id order (the smaller id may be
                    # on either side).
                    lo = np.minimum(pa, pb)
                    hi = np.maximum(pa, pb)
                    pa, pb = lo, hi
                out_a.extend(pa)
                out_b.extend(pb)
                out_c.extend(np.round(pc, 6))
            yield pd.DataFrame({"vec_a": out_a, "vec_b": out_b,
                                "cosine": out_c})

    return block_pairs.mapInPandas(gemm, _PAIR_SCHEMA)
