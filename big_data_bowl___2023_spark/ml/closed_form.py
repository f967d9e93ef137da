"""Closed-form OLS via Cramer's rule, spelled ONCE for two engines.

The driver's correctness gate hash-compares Spark output against a
DuckDB oracle, so a model query is only checkable if both engines can
produce bit-identical floats. Iterative/RNG fits (randomSplit, LBFGS,
tree ensembles) can't do that — but unregularized least squares has a
closed form, and IEEE-754 guarantees that the SAME sequence of
double-precision operations on the SAME inputs yields the SAME bits.

This module therefore provides each determinant/solve formula twice —
a Python evaluator and a SQL emitter — generated from one argument
ordering, so the two spellings cannot drift. Inputs are made identical
across engines by computing moment sums over INTEGER-scaled columns
(quantities are integral, money is cents), summed in Spark
``DECIMAL(38,0)`` / DuckDB ``HUGEINT`` — both exact — and converted
to double only once, at the driver / in the oracle's final SELECT.

Equivalence note (SURVEY §2.10 M3/M4): ``StandardScaler(withMean=
False)`` + unregularized ``LinearRegression`` is a reparametrization
of plain OLS — identical predictions — so the normal-equations solve
below IS the MLlib pipeline's estimator, in hash-checkable form
(Model Construction.R:19-24 caret ``preProcess="scale"`` + lm).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# 2x2: det(|a b; c d|), solve [[a,b],[b,d]] beta = [u, v]  (symmetric)

DET2 = "{a}*{d} - {b}*{c}"


def det2(a: float, b: float, c: float, d: float) -> float:
    return a * d - b * c


def det2_sql(a: str, b: str, c: str, d: str) -> str:
    return DET2.format(a=a, b=b, c=c, d=d)


# ---------------------------------------------------------------------------
# 3x3 row-major det via first-row cofactor expansion. The parenthesis
# and associativity structure is the contract: Python and SQL evaluate
# ((a*t1 - b*t2) + c*t3) with t* = (x*y - z*w), identically.

DET3 = ("{a}*({e}*{i} - {f}*{h}) - {b}*({d}*{i} - {f}*{g})"
        " + {c}*({d}*{h} - {e}*{g})")


def det3(a, b, c, d, e, f, g, h, i) -> float:
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def det3_sql(a, b, c, d, e, f, g, h, i) -> str:
    return DET3.format(a=a, b=b, c=c, d=d, e=e, f=f, g=g, h=h, i=i)


# ---------------------------------------------------------------------------
# OLS with intercept on 1 or 2 features, from moment sums.
# Moments: n, s1=Σx1, s11=Σx1², sy=Σy, s1y=Σx1y  (+ s2, s12, s22, s2y)

def solve_ols1(n, s1, s11, sy, s1y) -> tuple[float, float]:
    """β for y ~ 1 + x1: Cramer on [[n, s1],[s1, s11]]."""
    det = det2(n, s1, s1, s11)
    b0 = det2(sy, s1, s1y, s11) / det
    b1 = det2(n, sy, s1, s1y) / det
    return b0, b1


def solve_ols1_sql(n, s1, s11, sy, s1y) -> tuple[str, str, str]:
    """(det, b0_numer, b1_numer) SQL strings; caller divides."""
    return (det2_sql(n, s1, s1, s11),
            det2_sql(sy, s1, s1y, s11),
            det2_sql(n, sy, s1, s1y))


def solve_ols2(n, s1, s2, s11, s12, s22, sy, s1y, s2y
               ) -> tuple[float, float, float]:
    """β for y ~ 1 + x1 + x2: Cramer on the 3x3 normal matrix
    [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]."""
    det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    b0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / det
    b1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22) / det
    b2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y) / det
    return b0, b1, b2


def solve_ols2_sql(n, s1, s2, s11, s12, s22, sy, s1y, s2y
                   ) -> tuple[str, str, str, str]:
    """(det, b0_numer, b1_numer, b2_numer) SQL strings."""
    return (det3_sql(n, s1, s2, s1, s11, s12, s2, s12, s22),
            det3_sql(sy, s1, s2, s1y, s11, s12, s2y, s12, s22),
            det3_sql(n, sy, s2, s1, s1y, s12, s2, s2y, s22),
            det3_sql(n, s1, sy, s1, s11, s1y, s2, s12, s2y))


def sse_quadform2(m, b0, b1, b2) -> float:
    """Held-out SSE Σ(y − b0 − b1x1 − b2x2)² expanded over the
    fold's own moments ``m`` (keys n,s1,s2,s11,s12,s22,sy,s1y,s2y,syy)
    — evaluation order mirrors ``SSE2`` below."""
    return (m["syy"] - 2.0 * (b0 * m["sy"] + b1 * m["s1y"] + b2 * m["s2y"])
            + (b0 * (b0 * m["n"] + b1 * m["s1"] + b2 * m["s2"])
               + b1 * (b0 * m["s1"] + b1 * m["s11"] + b2 * m["s12"])
               + b2 * (b0 * m["s2"] + b1 * m["s12"] + b2 * m["s22"])))


SSE2 = ("{syy} - 2.0*({b0}*{sy} + {b1}*{s1y} + {b2}*{s2y})"
        " + ({b0}*({b0}*{n} + {b1}*{s1} + {b2}*{s2})"
        " + {b1}*({b0}*{s1} + {b1}*{s11} + {b2}*{s12})"
        " + {b2}*({b0}*{s2} + {b1}*{s12} + {b2}*{s22}))")


def sse_quadform2_sql(moment_names: dict[str, str],
                      b0: str, b1: str, b2: str) -> str:
    return SSE2.format(b0=b0, b1=b1, b2=b2, **moment_names)
