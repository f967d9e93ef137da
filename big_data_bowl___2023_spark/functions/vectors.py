"""Vector (embedding-column) expressions — similarity-search surface
over ``array<float>`` columns (FIXTURES.md §B ``embeddings``).

Everything is built-in higher-order functions (``zip_with`` /
``aggregate``): JVM-side, no UDF, no Arrow hop. Float32 inputs are
cast to double first so the arithmetic (and the left-to-right fold
order) is reproducible across engines — the oracle computes the same
dot product in the same order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ via zip_with + left-fold aggregate."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (no ANSI div/0)."""
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)
                  ).otherwise(F.lit(0.0))


def l2_normalize(vec: Column) -> Column:
    """Unit-scale a vector once so pairwise cosine becomes a single
    dot product. In an O(n²) pair kernel this removes two norm folds
    per PAIR (they were being recomputed n times per vector) — the
    difference between 100 s and 30 s at sf0.1, and between feasible
    and not at corpus scale.

    Degenerate inputs (zero norm, or NaN/Inf components) normalize
    to NULL, not NaN: cosine is undefined for them, and Spark sorts
    NaN GREATEST, so a NaN similarity would satisfy every ``>=
    threshold`` filter and top every ranking — the round-7 ADVICE
    finding. NULL instead fails threshold filters and sorts last in
    descending top-k, matching the numpy prefilters (where NaN >= cut
    is False) and :func:`cosine`'s 0.0-for-zero-norm convention."""
    n = norm(vec)
    return F.when(~F.isnan(n) & (n > 0),
                  F.transform(vec, lambda x: x / n))
