"""SimHash document sketches.

Per token, a 32-bit hash contributes ±1 per bit position (weighted by
occurrence count); the sign of each accumulated position is the sketch
bit. Near-dups differ in few bits (Hamming distance).

Bit source: the 32 hex digits of md5(token), bit = digit ≥ 8. Chosen
over xxhash64 so the sketch is engine-reproducible (DuckDB oracle
derives identical bits) — at production scale swap in xxhash64 for
speed; the plan shape is identical.

Shuffle profile: explode tokens → one groupBy(doc) with 32 conditional
sums — a single shuffle, map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as Tx
from ..session import pin

SIMHASH_BITS = 32
_HIGH_HEX = ("8", "9", "a", "b", "c", "d", "e", "f")


def simhash_docs(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) with simhash as a 32-char '0'/'1' string —
    string form keeps it portable across engines and hashable by the
    driver's value compare."""
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(Tx.tokenize(F.col(text_col))).alias("tok"))
              .withColumn("h", F.md5(F.encode(F.col("tok"), "UTF-8"))))
    sums = [
        F.sum(F.when(F.substring("h", j + 1, 1).isin(*_HIGH_HEX), 1)
               .otherwise(-1)).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    acc = toks.groupBy("doc_id").agg(*sums)
    bits = [F.when(F.col(f"b{j}") > 0, "1").otherwise("0")
            for j in range(SIMHASH_BITS)]
    return acc.select("doc_id", F.concat(*bits).alias("simhash"))


def segment_bounds(bits: int, max_distance: int) -> list[tuple[int, int]]:
    """(1-based offset, length) for ``max_distance + 1`` contiguous
    sketch segments. Pigeonhole: a pair with Hamming distance ≤ d has
    its ≤ d differing bits spread over d+1 segments, so at least one
    segment is bit-identical — blocking on these keys is COMPLETE for
    distance ≤ d (round-1 blocked on 2 halves, which only guarantees
    completeness for d ≤ 1; flagged by the round-1 advisor)."""
    n_seg = max_distance + 1
    base, rem = divmod(bits, n_seg)
    bounds, off = [], 1
    for i in range(n_seg):
        length = base + (1 if i < rem else 0)
        bounds.append((off, length))
        off += length
    return bounds


def hamming_pairs(df: DataFrame, max_distance: int,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by sketch Hamming distance, blocked on
    ``max_distance + 1`` sketch segments (pigeonhole-complete for
    distance ≤ max_distance), so the join is on block keys, not a
    cross product. Candidate volume per segment scales with sketch
    collision density, not n²."""
    half = SIMHASH_BITS // 2
    sk = pin(simhash_docs(df, text_col, id_col))
    # Integer halves ONCE per document (O(n)); the per-PAIR distance
    # is then two XOR+popcounts in whole-stage codegen — a 32-step
    # per-pair string fold here cost 376 s at sf0.1 (5.5M candidates).
    ints = sk.select(
        "doc_id",
        F.conv(F.substring("simhash", 1, half), 2, 10)
         .cast("bigint").alias("hi"),
        F.conv(F.substring("simhash", half + 1, half), 2, 10)
         .cast("bigint").alias("lo"))
    blocks = sk.select(
        "doc_id",
        F.explode(F.array(*[
            F.concat(F.lit(f"{i}:"), F.substring("simhash", off, length))
            for i, (off, length) in enumerate(
                segment_bounds(SIMHASH_BITS, max_distance))
        ])).alias("block"))
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (a.join(b, (F.col("a.block") == F.col("b.block"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())
    ia = ints.select(F.col("doc_id").alias("doc_a"),
                     F.col("hi").alias("hi_a"), F.col("lo").alias("lo_a"))
    ib = ints.select(F.col("doc_id").alias("doc_b"),
                     F.col("hi").alias("hi_b"), F.col("lo").alias("lo_b"))
    dist = (F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
            + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))))
    # Join strategy left to AQE: the per-doc int table broadcasts at
    # small corpus size and shuffle-joins on doc id at scale.
    return (cand.join(ia, "doc_a")
                .join(ib, "doc_b")
                .withColumn("hamming", dist.cast("int"))
                .filter(F.col("hamming") <= max_distance)
                .select("doc_a", "doc_b", "hamming"))
