"""Fuzzy (edit-distance-bounded) string join.

Entity resolution — matching dirty names, titles, product strings
across tables — needs JOIN ON levenshtein(a, b) ≤ k, which naively is
a cross join. The scalable shape is q-gram blocking:

* each string explodes into its positional q-grams (codegen:
  sequence + substring, no UDF);
* candidates = pairs sharing ≥ 1 q-gram with |len(a) − len(b)| ≤ k —
  one equi-join keyed on the q-gram string, O(collisions);
* exact ``levenshtein`` verification on candidates only.

Completeness bound (count filtering, Gravano et al. VLDB'01): one
edit destroys at most q q-grams, so strings with distance ≤ k and
min-length L share ≥ (L − q + 1) − q·k q-grams. The blocking is
EXACT whenever that bound is ≥ 1 (e.g. q=2, k=1: L ≥ 4); below it
short strings may be missed and ``min_len_exact`` reports the
threshold so callers can route short strings to a length-bucket
cross join if they need them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_len_exact(q: int, max_distance: int) -> int:
    """Smallest string length for which q-gram blocking is complete."""
    return q * max_distance + q


def _qgrams(col, q: int):
    """Array of overlapping q-grams (strings shorter than q yield the
    string itself so they still block on something)."""
    n = F.length(col)
    idx = F.sequence(F.lit(1), F.greatest(n - q + 1, F.lit(1)))
    return F.transform(idx, lambda i: F.substring(col, i, q))


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_col: str, right_col: str,
               max_distance: int = 1, q: int = 2) -> DataFrame:
    """(left row ⋈ right row, distance) for levenshtein ≤ max_distance.

    Output columns: all of ``left``, all of ``right``, ``distance``.
    Join keys collide on shared q-grams only — the cross join never
    materializes."""
    lq = left.withColumn(
        "__qg", F.explode(F.array_distinct(_qgrams(F.col(left_col), q))))
    rq = right.withColumn(
        "__qg", F.explode(F.array_distinct(_qgrams(F.col(right_col), q))))
    lenl, lenr = F.length(F.col(left_col)), F.length(F.col(right_col))
    cand = (lq.join(rq, "__qg")
            .drop("__qg")
            .filter(F.abs(lenl - lenr) <= max_distance)
            .distinct())
    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    return (cand.withColumn("distance", dist)
            .filter(F.col("distance") <= max_distance))
