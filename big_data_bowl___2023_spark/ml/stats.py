"""M11 statistical significance tests (WIP.R:295-299).

Reference: ``pairwise.t.test(metric_eval$Zone, metric_eval$label,
p.adjust.method = "bonferroni")`` and ``kruskal.test(Zone ~ label)``.

Spark mapping — scale-first in both directions:

* The DATA pass is distributed DataFrame aggregation: the t-tests
  need only per-group sufficient statistics (n, mean, sample var);
  Kruskal-Wallis needs global average ranks, computed with a
  distinct-value window (cumulative counts → midrank), never a
  per-row sort collect. What reaches the driver is k rows (one per
  group) — the only part that is O(groups), not O(rows).
* The P-VALUE math is closed-form special functions (regularized
  incomplete beta / gamma, Numerical-Recipes-style continued
  fractions) — scipy isn't assumed anywhere in the engine.

Scale note: the midrank window orders DISTINCT values globally (one
partition for the window). At 100 TB with ~billions of distinct
doubles you'd swap it for a range-partitioned prefix-sum of value
counts; the aggregation shape (counts per value → cumulative) is the
same.
"""

from __future__ import annotations

from itertools import combinations
from math import atan, exp, lgamma, log, pi, sqrt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EPS = 3e-14
_FPMIN = 1e-300
_MAXIT = 500


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (lgamma(a + b) - lgamma(a) - lgamma(b)
             + a * log(x) + b * log(1.0 - x))
    bt = exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_sf_two_sided(t: float, df: float) -> float:
    """Two-sided Student-t p-value: P(|T_df| >= |t|) =
    I_{df/(df+t²)}(df/2, 1/2)."""
    if df <= 0:
        return float("nan")
    return betainc(df / 2.0, 0.5, df / (df + t * t))


def _gser(a: float, x: float) -> float:
    """Series for the lower regularized incomplete gamma P(a, x)."""
    ap = a
    s = 1.0 / a
    delta = s
    for _ in range(_MAXIT):
        ap += 1.0
        delta *= x / ap
        s += delta
        if abs(delta) < abs(s) * _EPS:
            break
    return s * exp(-x + a * log(x) - lgamma(a))


def _gcf(a: float, x: float) -> float:
    """Continued fraction for the upper regularized gamma Q(a, x)."""
    b = x + 1.0 - a
    c = 1.0 / _FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, _MAXIT):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = b + an / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return exp(-x + a * log(x) - lgamma(a)) * h


def chi2_sf(x: float, k: float) -> float:
    """Chi-square survival P(X²_k >= x) = Q(k/2, x/2)."""
    if k <= 0:
        return float("nan")
    if x <= 0.0:
        return 1.0
    a, xh = k / 2.0, x / 2.0
    if xh < a + 1.0:
        return 1.0 - _gser(a, xh)
    return _gcf(a, xh)


def cauchy_sf_two_sided(t: float) -> float:
    """Closed form for df=1 (used by tests as an independent check)."""
    return 1.0 - 2.0 / pi * atan(abs(t))


# ------------------------------------------------------- distributed

def group_moments(df: DataFrame, group_col: str,
                  value_col: str) -> DataFrame:
    """Per-group sufficient statistics — one distributed pass."""
    return df.groupBy(group_col).agg(
        F.count(value_col).alias("n"),
        F.avg(value_col).alias("mean"),
        F.var_samp(value_col).alias("var"))


def pairwise_t_tests(df: DataFrame, group_col: str, value_col: str,
                     ) -> list[dict]:
    """Pooled-SD pairwise t-tests with Bonferroni adjustment —
    the semantics of R ``pairwise.t.test(..., pool.sd = TRUE,
    p.adjust.method = "bonferroni")`` (WIP.R:295-297): one common
    pooled variance across ALL groups, df = N − k, p multiplied by
    the number of comparisons (capped at 1)."""
    stats = sorted(group_moments(df, group_col, value_col).collect(),
                   key=lambda r: str(r[group_col]))
    k = len(stats)
    if k < 2:
        return []
    n_total = sum(r["n"] for r in stats)
    df_pool = n_total - k
    pooled_var = sum((r["n"] - 1) * r["var"] for r in stats) / df_pool
    m = k * (k - 1) // 2
    out = []
    for ra, rb in combinations(stats, 2):
        se = sqrt(pooled_var * (1.0 / ra["n"] + 1.0 / rb["n"]))
        t = (ra["mean"] - rb["mean"]) / se
        p = t_sf_two_sided(t, df_pool)
        out.append({
            "test": "pairwise_t_pooled",
            "group_a": str(ra[group_col]),
            "group_b": str(rb[group_col]),
            "statistic": t,
            "df": float(df_pool),
            "p_value": p,
            "p_adjusted": min(1.0, p * m),
        })
    return out


def kruskal_wallis(df: DataFrame, group_col: str,
                   value_col: str) -> dict:
    """Kruskal-Wallis H (tie-corrected) with chi-square p, df = k−1
    (WIP.R:299). Ranks are midranks computed from distinct-value
    cumulative counts — distributed, no per-row sort collect."""
    vals = df.select(F.col(group_col).alias("g"),
                     F.col(value_col).alias("v")).filter(F.col("v").isNotNull())
    vc = vals.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    w = (Window.orderBy("v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = vc.withColumn(
        "rank_avg",
        F.sum("cnt").over(w) - F.col("cnt") + (F.col("cnt") + 1) / 2.0)
    gv = vals.groupBy("g", "v").agg(F.count(F.lit(1)).alias("gcnt"))
    per_group = (gv.join(ranked, "v")
                 .groupBy("g")
                 .agg(F.sum(F.col("gcnt") * F.col("rank_avg")).alias("r_sum"),
                      F.sum("gcnt").alias("n"))).collect()
    ties = ranked.agg(
        F.sum(F.pow(F.col("cnt"), 3) - F.col("cnt")).alias("t")).collect()
    n_total = sum(r["n"] for r in per_group)
    k = len(per_group)
    h = (12.0 / (n_total * (n_total + 1))
         * sum(r["r_sum"] ** 2 / r["n"] for r in per_group)
         - 3.0 * (n_total + 1))
    tie_term = 1.0 - (ties[0]["t"] or 0.0) / (n_total ** 3 - n_total)
    if tie_term > 0:
        h /= tie_term
    return {
        "test": "kruskal_wallis",
        "group_a": None,
        "group_b": None,
        "statistic": h,
        "df": float(k - 1),
        "p_value": chi2_sf(h, k - 1),
        "p_adjusted": chi2_sf(h, k - 1),
    }


_STAT_SCHEMA = T.StructType([
    T.StructField("test", T.StringType()),
    T.StructField("group_a", T.StringType()),
    T.StructField("group_b", T.StringType()),
    T.StructField("statistic", T.DoubleType()),
    T.StructField("df", T.DoubleType()),
])


def significance_stats(spark: SparkSession, df: DataFrame,
                       group_col: str, value_col: str,
                       scale: int = 100) -> DataFrame:
    """Oracle-checkable M11 statistics (VERDICT r2 #2): the pairwise
    pooled-t statistics and tie-corrected Kruskal-Wallis H WITHOUT
    p-values — every number here is derived from integer-exact moment
    sums (values quantized by ``scale``; the events table is 2-decimal
    so scale=100 is lossless) through formulas spelled identically in
    the DuckDB oracle, so the driver can hash-check them. The
    special-function p-values remain in ``significance_tests``
    (rows-only / pytest-pinned — betainc/gammq aren't SQL).

    Distribution shape matches ``pairwise_t_tests``/``kruskal_wallis``:
    one grouped aggregation for moments, distinct-value cumulative
    counts for midranks; only O(groups + distinct values) reaches the
    driver."""
    vc = F.round(F.col(value_col) * scale, 0).cast("bigint")
    base = (df.filter(F.col(value_col).isNotNull())
            .select(F.col(group_col).cast("string").alias("g"),
                    vc.alias("vc")))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    gm = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("vc"))).alias("svi"),
        F.sum(dec(F.col("vc") * F.col("vc"))).alias("svvi")).collect()
    groups = sorted(gm, key=lambda r: r["g"])
    k = len(groups)
    stats = []
    for r in groups:
        nf = float(r["n"])
        sv = float(r["svi"]) / scale
        svv = float(r["svvi"]) / scale / scale
        mean = sv / nf
        var = (svv - sv * sv / nf) / (nf - 1.0)
        stats.append((r["g"], nf, mean, var))
    nn = sum(nf for _, nf, _, _ in stats)       # integer-valued: exact
    pnum = sum((nf - 1.0) * var for _, nf, _, var in stats)
    pv = pnum / (nn - k)
    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            ga, na, ma, _ = stats[i]
            gb, nb, mb, _ = stats[j]
            t = (ma - mb) / sqrt(pv * (1.0 / na + 1.0 / nb))
            rows.append(("pairwise_t_pooled", ga, gb,
                         round(t, 6), nn - k))

    # Kruskal-Wallis on the same quantized values: midranks are
    # half-integers from exact counts, so r_sum is order-independent
    vcnt = base.groupBy("vc").agg(F.count(F.lit(1)).alias("cnt"))
    w = (Window.orderBy("vc")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = vcnt.withColumn(
        "rank_avg",
        F.sum("cnt").over(w) - F.col("cnt") + (F.col("cnt") + 1) / 2.0)
    gv = base.groupBy("g", "vc").agg(F.count(F.lit(1)).alias("gcnt"))
    pg = (gv.join(ranked, "vc")
          .groupBy("g")
          .agg(F.sum(F.col("gcnt") * F.col("rank_avg")).alias("r_sum"),
               F.sum("gcnt").alias("ng"))).collect()
    ties = ranked.agg(
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt")
              - F.col("cnt")).alias("t3")).collect()[0]["t3"]
    n_int = sum(r["ng"] for r in pg)
    nf_tot = float(n_int)
    s = sum(r["r_sum"] * r["r_sum"] / float(r["ng"]) for r in pg)
    h = 12.0 / (nf_tot * (nf_tot + 1.0)) * s - 3.0 * (nf_tot + 1.0)
    tie = 1.0 - float(ties) / float(n_int ** 3 - n_int)
    if tie > 0:
        h = h / tie
    rows.append(("kruskal_wallis", None, None, round(h, 6),
                 float(k - 1)))
    return spark.createDataFrame(rows, _STAT_SCHEMA)


_SIG_SCHEMA = T.StructType([
    T.StructField("test", T.StringType()),
    T.StructField("group_a", T.StringType()),
    T.StructField("group_b", T.StringType()),
    T.StructField("statistic", T.DoubleType()),
    T.StructField("df", T.DoubleType()),
    T.StructField("p_value", T.DoubleType()),
    T.StructField("p_adjusted", T.DoubleType()),
])


def significance_tests(spark: SparkSession, df: DataFrame,
                       group_col: str, value_col: str) -> DataFrame:
    """M11 surface: all pairwise pooled t-tests (Bonferroni) plus the
    Kruskal-Wallis omnibus row, as a DataFrame. Statistics are
    rounded to 6 to keep the result engine-stable."""
    rows = pairwise_t_tests(df, group_col, value_col)
    rows.append(kruskal_wallis(df, group_col, value_col))
    for r in rows:
        for key in ("statistic", "p_value", "p_adjusted"):
            r[key] = round(r[key], 6)
    return spark.createDataFrame(rows, _SIG_SCHEMA)
