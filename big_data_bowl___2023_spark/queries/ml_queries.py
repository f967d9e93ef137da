"""Driver-checked ML-surface queries (SURVEY.md §2.10 M1–M11).

All rows-only: model internals (seeded RNG streams, tree structure)
and special-function p-values are engine-specific by nature — SURVEY
§7.8. The full Q7 pipeline with the NFL feature semantics runs under
pytest (ml.models); these queries exercise the same surface on the
star schema so the driver sees the ML layer execute end-to-end.

(Registry curation note: the driver checks the first 50 registered
queries; the standalone M1 split query was folded into
``ml_expected_value_model`` — which now fits on the seeded 80% train
split, covering M1+M3+M4+M8 in one row — to stay within the checked
set. ``train_test_split`` itself remains pytest-covered.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ml import closed_form as cf
from ..operators.sampling import portable_split_col, portable_split_cut
from ..registry import query
from ._util import load_table

TRAIN_FRAC = 0.8
_CUT = portable_split_cut(TRAIN_FRAC)            # '3333'

# Shared oracle fragments: integer-exact order features + train split.
# Quantities are integral and money is 2-decimal, so x1/x2/yc are
# exact BIGINTs; DuckDB sums them in HUGEINT, Spark in DECIMAL(38,0)
# — both exact, so the double conversions below are bit-identical.
_FEATS_SQL = """
feats AS (
  SELECT o.o_orderkey, o.o_totalprice,
         CAST(COUNT(*) AS BIGINT) AS x1,
         CAST(SUM(l.l_quantity) AS BIGINT) AS x2,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS yc
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_totalprice),
tr AS (
  SELECT * FROM feats
  WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) >= '{cut}')
""".format(cut=_CUT)


def _order_features(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    feats = (li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
             .agg(F.count(F.lit(1)).cast("double").alias("n_items"),
                  F.sum("l_quantity").alias("total_qty")))
    return o.select("o_orderkey", "o_totalprice").join(feats, ["o_orderkey"])


def _int_features(df):
    """Integer-scaled view: x1 = item count, x2 = total qty (integral
    by data contract), yc = price in cents. Exact on both engines."""
    return df.select(
        "o_orderkey", "o_totalprice", "n_items", "total_qty",
        F.col("n_items").cast("bigint").alias("x1"),
        F.col("total_qty").cast("bigint").alias("x2"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("yc"))


_MOMENTS2 = {
    "n": "CAST(COUNT(*) AS DOUBLE)",
    "s1": "CAST(SUM(x1) AS DOUBLE)",
    "s2": "CAST(SUM(x2) AS DOUBLE)",
    "s11": "CAST(SUM(x1*x1) AS DOUBLE)",
    "s12": "CAST(SUM(x1*x2) AS DOUBLE)",
    "s22": "CAST(SUM(x2*x2) AS DOUBLE)",
    "sy": "CAST(SUM(yc) AS DOUBLE)/100",
    "s1y": "CAST(SUM(x1*yc) AS DOUBLE)/100",
    "s2y": "CAST(SUM(x2*yc) AS DOUBLE)/100",
}


def _moments2(df):
    """The nine 2-feature moment sums, DECIMAL(38,0)-exact, as Python
    floats converted exactly as the oracle's HUGEINT→DOUBLE casts."""
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("x1"))).alias("s1"),
        F.sum(d(F.col("x2"))).alias("s2"),
        F.sum(d(F.col("x1") * F.col("x1"))).alias("s11"),
        F.sum(d(F.col("x1") * F.col("x2"))).alias("s12"),
        F.sum(d(F.col("x2") * F.col("x2"))).alias("s22"),
        F.sum(d(F.col("yc"))).alias("syc"),
        F.sum(d(F.col("x1") * F.col("yc"))).alias("s1yc"),
        F.sum(d(F.col("x2") * F.col("yc"))).alias("s2yc"),
        F.sum(d(F.col("yc") * F.col("yc"))).alias("syyc"),
    ).collect()[0]
    return {"n": float(row["n"]),
            "s1": float(row["s1"]), "s2": float(row["s2"]),
            "s11": float(row["s11"]), "s12": float(row["s12"]),
            "s22": float(row["s22"]),
            "sy": float(row["syc"]) / 100,
            "s1y": float(row["s1yc"]) / 100,
            "s2y": float(row["s2yc"]) / 100,
            "syy": float(row["syyc"]) / 100 / 100}


_DET, _D0, _D1, _D2 = cf.solve_ols2_sql(**_MOMENTS2)
_EXPECTED_VALUE_ORACLE = """
WITH {feats}
, m AS (SELECT
    ({d0}) / ({det}) AS b0,
    ({d1}) / ({det}) AS b1,
    ({d2}) / ({det}) AS b2
  FROM tr)
SELECT f.o_orderkey, f.o_totalprice,
       ROUND(m.b0 + m.b1*CAST(f.x1 AS DOUBLE)
             + m.b2*CAST(f.x2 AS DOUBLE), 2) AS expected_price,
       ROUND(f.o_totalprice - (m.b0 + m.b1*CAST(f.x1 AS DOUBLE)
             + m.b2*CAST(f.x2 AS DOUBLE)), 2) AS residual
FROM feats f CROSS JOIN m
""".format(feats=_FEATS_SQL, det=_DET, d0=_D0, d1=_D1, d2=_D2)


@query("ml_expected_value_model", oracle=_EXPECTED_VALUE_ORACLE)
def ml_expected_value_model(spark, sf_dir):
    """M1/M3/M4/M8: deterministic 80/20 split → least-squares fit on
    the train split → residuals scored over ALL rows — the xPZs/dPZs
    shape (MC:19, 33-35) on order features (n_items, total_qty →
    o_totalprice).

    Hash-checkable by construction: the split is the engine-portable
    md5 split (operators/sampling.py — randomSplit is partition-layout
    dependent), and the fit is the closed form of the scale+LR
    pipeline (ml/closed_form.py — scaling without centering is a
    reparametrization, so OLS β gives the identical predictions MLlib
    converges to). One distributed aggregation for the moments, one
    driver-side 3x3 Cramer solve, projection for scoring."""
    data = _int_features(_order_features(spark, sf_dir))
    train = data.filter(portable_split_col("o_orderkey", TRAIN_FRAC))
    m = _moments2(train)
    b0, b1, b2 = cf.solve_ols2(
        m["n"], m["s1"], m["s2"], m["s11"], m["s12"], m["s22"],
        m["sy"], m["s1y"], m["s2y"])
    pred = (F.lit(b0) + F.lit(b1) * F.col("x1").cast("double")
            + F.lit(b2) * F.col("x2").cast("double"))
    return data.select(
        "o_orderkey", "o_totalprice",
        F.round(pred, 2).alias("expected_price"),
        F.round(F.col("o_totalprice") - pred, 2).alias("residual"))


_SIG_STATS_ORACLE = """
WITH ev AS (SELECT CAST(event_type AS VARCHAR) AS g,
                   CAST(ROUND(value * 100) AS BIGINT) AS vc
            FROM events WHERE value IS NOT NULL),
gm AS (SELECT g, CAST(COUNT(*) AS DOUBLE) AS n,
              CAST(SUM(vc) AS DOUBLE)/100 AS sv,
              CAST(SUM(vc*vc) AS DOUBLE)/100/100 AS svv
       FROM ev GROUP BY g),
gs AS (SELECT g, n, sv/n AS mean,
              (svv - sv*sv/n)/(n - 1.0) AS var FROM gm),
tot AS (SELECT SUM(n) AS nn, COUNT(*) AS k,
               SUM((n - 1.0)*var) AS pnum FROM gs),
pool AS (SELECT nn, k, pnum/(nn - k) AS pv FROM tot),
pairs AS (
  SELECT 'pairwise_t_pooled' AS test, a.g AS group_a, b.g AS group_b,
         ROUND((a.mean - b.mean)
               / sqrt(p.pv*(1.0/a.n + 1.0/b.n)), 6) AS statistic,
         p.nn - p.k AS df
  FROM gs a JOIN gs b ON a.g < b.g CROSS JOIN pool p),
vcnt AS (SELECT vc, COUNT(*) AS cnt FROM ev GROUP BY vc),
ranked AS (SELECT vc, cnt,
  SUM(cnt) OVER (ORDER BY vc
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    - cnt + (cnt + 1)/2.0 AS rank_avg FROM vcnt),
gv AS (SELECT g, vc, COUNT(*) AS gcnt FROM ev GROUP BY g, vc),
pg AS (SELECT g, SUM(gcnt*rank_avg) AS r_sum, SUM(gcnt) AS ng
       FROM gv JOIN ranked USING (vc) GROUP BY g),
kwm AS (SELECT SUM(r_sum*r_sum/CAST(ng AS DOUBLE)) AS s,
               CAST(SUM(ng) AS DOUBLE) AS nf,
               SUM(ng) AS ni, COUNT(*) AS k FROM pg),
tiet AS (SELECT SUM(cnt*cnt*cnt - cnt) AS t3 FROM vcnt),
kw AS (SELECT
  12.0/(m.nf*(m.nf + 1.0)) * m.s - 3.0*(m.nf + 1.0) AS h_raw,
  1.0 - CAST(t.t3 AS DOUBLE)
      / CAST(CAST(m.ni AS HUGEINT)*m.ni*m.ni - m.ni AS DOUBLE) AS tie,
  m.k FROM kwm m CROSS JOIN tiet t)
SELECT * FROM pairs
UNION ALL
SELECT 'kruskal_wallis', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       ROUND(CASE WHEN tie > 0 THEN h_raw/tie ELSE h_raw END, 6),
       CAST(k - 1 AS DOUBLE)
FROM kw
"""


@query("ml_significance_stats", oracle=_SIG_STATS_ORACLE)
def ml_significance_stats(spark, sf_dir):
    """M11 (WIP.R:295-299): pooled pairwise t statistics + tie-
    corrected Kruskal-Wallis H over event_type groups of value — the
    ``pairwise.t.test(Zone, label)`` / ``kruskal.test`` statistics,
    hash-checked against a DuckDB oracle built on the same integer-
    exact quantized moments (ml/stats.py::significance_stats). The
    special-function p-values (incomplete beta/gamma) are not SQL;
    they live in ``significance_tests`` with closed-form cases pinned
    in pytest (test_ml_stats.py)."""
    from ..ml.stats import significance_stats

    ev = load_table(spark, sf_dir, "events")
    return significance_stats(spark, ev, "event_type", "value")


# --- RFE oracle: engine-portable 3-fold CV over closed-form OLS ---
# Folds come from 2 md5 hex chars (256 buckets split 85/85/86); every
# per-fold moment is an exact integer on both engines, and the
# solve/SSE formulas are emitted from ml/closed_form.py templates so
# Spark-driver Python and DuckDB evaluate bit-identical doubles.

_FOLD_SQL = ("CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2)"
             " <= '54' THEN 0"
             " WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2)"
             " <= 'a9' THEN 1 ELSE 2 END")

_HM = {"n": "hn", "s1": "hs1", "s2": "hs2", "s11": "hs11",
       "s12": "hs12", "s22": "hs22", "sy": "hsy", "s1y": "hs1y",
       "s2y": "hs2y", "syy": "hsyy"}


def _rfe_oracle() -> str:
    da, a0, a1 = cf.solve_ols1_sql("n", "s1", "s11", "sy", "s1y")
    db, b0, b2 = cf.solve_ols1_sql("n", "s2", "s22", "sy", "s2y")
    dc, c0, c1, c2 = cf.solve_ols2_sql(
        "n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y")
    coefs = (f"({a0})/({da}) AS b0_a, ({a1})/({da}) AS b1_a, "
             f"({b0})/({db}) AS b0_b, ({b2})/({db}) AS b2_b, "
             f"({c0})/({dc}) AS b0_c, ({c1})/({dc}) AS b1_c, "
             f"({c2})/({dc}) AS b2_c")
    sse_a = cf.sse_quadform2_sql(_HM, "b0_a", "b1_a", "0.0")
    sse_b = cf.sse_quadform2_sql(_HM, "b0_b", "0.0", "b2_b")
    sse_c = cf.sse_quadform2_sql(_HM, "b0_c", "b1_c", "b2_c")
    feats_nosplit = _FEATS_SQL.split(",\ntr AS")[0]
    return f"""
WITH {feats_nosplit},
f AS (SELECT *, {_FOLD_SQL} AS fold FROM feats),
fm AS (SELECT fold, COUNT(*) AS ni, SUM(x1) AS s1i, SUM(x2) AS s2i,
              SUM(x1*x1) AS s11i, SUM(x1*x2) AS s12i,
              SUM(x2*x2) AS s22i, SUM(yc) AS syi,
              SUM(x1*yc) AS s1yi, SUM(x2*yc) AS s2yi,
              SUM(CAST(yc AS HUGEINT)*yc) AS syyi
       FROM f GROUP BY fold),
tm AS (SELECT SUM(ni) AS ni, SUM(s1i) AS s1i, SUM(s2i) AS s2i,
              SUM(s11i) AS s11i, SUM(s12i) AS s12i, SUM(s22i) AS s22i,
              SUM(syi) AS syi, SUM(s1yi) AS s1yi, SUM(s2yi) AS s2yi
       FROM fm),
tr AS (SELECT fm.fold,
  CAST(tm.ni - fm.ni AS DOUBLE) AS n,
  CAST(tm.s1i - fm.s1i AS DOUBLE) AS s1,
  CAST(tm.s2i - fm.s2i AS DOUBLE) AS s2,
  CAST(tm.s11i - fm.s11i AS DOUBLE) AS s11,
  CAST(tm.s12i - fm.s12i AS DOUBLE) AS s12,
  CAST(tm.s22i - fm.s22i AS DOUBLE) AS s22,
  CAST(tm.syi - fm.syi AS DOUBLE)/100 AS sy,
  CAST(tm.s1yi - fm.s1yi AS DOUBLE)/100 AS s1y,
  CAST(tm.s2yi - fm.s2yi AS DOUBLE)/100 AS s2y,
  CAST(fm.ni AS DOUBLE) AS hn, CAST(fm.s1i AS DOUBLE) AS hs1,
  CAST(fm.s2i AS DOUBLE) AS hs2, CAST(fm.s11i AS DOUBLE) AS hs11,
  CAST(fm.s12i AS DOUBLE) AS hs12, CAST(fm.s22i AS DOUBLE) AS hs22,
  CAST(fm.syi AS DOUBLE)/100 AS hsy,
  CAST(fm.s1yi AS DOUBLE)/100 AS hs1y,
  CAST(fm.s2yi AS DOUBLE)/100 AS hs2y,
  CAST(fm.syyi AS DOUBLE)/100/100 AS hsyy
  FROM fm CROSS JOIN tm),
coef AS (SELECT tr.*, {coefs} FROM tr),
sse AS (SELECT fold, hn,
  {sse_a} AS sse_a, {sse_b} AS sse_b, {sse_c} AS sse_c FROM coef),
sums AS (SELECT SUM(GREATEST(sse_a, 0.0)) AS ssa,
                SUM(GREATEST(sse_b, 0.0)) AS ssb,
                SUM(GREATEST(sse_c, 0.0)) AS ssc,
                SUM(hn) AS nh FROM sse),
cand AS (
  SELECT 1 AS n_features, 'n_items' AS feature_set,
         sqrt(ssa/nh) AS rmse FROM sums
  UNION ALL SELECT 1, 'total_qty', sqrt(ssb/nh) FROM sums
  UNION ALL SELECT 2, 'n_items,total_qty', sqrt(ssc/nh) FROM sums),
best AS (SELECT n_features, feature_set, ROUND(rmse, 6) AS cv_rmse,
  ROW_NUMBER() OVER (PARTITION BY n_features
                     ORDER BY rmse, feature_set) AS rn FROM cand),
sel AS (SELECT n_features AS win FROM best WHERE rn = 1
        ORDER BY cv_rmse, n_features LIMIT 1)
SELECT b.n_features, b.feature_set, b.cv_rmse,
       (b.n_features = s.win) AS selected
FROM best b CROSS JOIN sel s WHERE b.rn = 1
"""


def _fold_col():
    hx = F.substring(
        F.md5(F.col("o_orderkey").cast("string").cast("binary")), 1, 2)
    return (F.when(hx <= "54", 0).when(hx <= "a9", 1).otherwise(2)
            .alias("fold"))


@query("ml_rfe_selection", oracle=_rfe_oracle())
def ml_rfe_selection(spark, sf_dir):
    """M10 (WIP.R:241-274): best-subset-per-size feature selection
    with 3-fold CV RMSE over {n_items, total_qty}; the winning size is
    flagged ``selected`` (caret rfe sizes=1:2).

    Hash-checkable restatement of ml/models.py::rfe_selection (which
    stays as the general-d operator, pytest-covered): folds are the
    engine-portable md5 split, every (subset × fold) OLS is the Cramer
    closed form over integer-exact train = total − fold moments, and
    held-out SSE is the quadratic form over the fold's own moments —
    ONE distributed aggregation total (ml/closed_form.py spells the
    identical arithmetic for the DuckDB oracle)."""
    data = _int_features(_order_features(spark, sf_dir)) \
        .withColumn("fold", _fold_col())
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_fold = data.groupBy("fold").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum(d(F.col("x1"))).alias("s1i"),
        F.sum(d(F.col("x2"))).alias("s2i"),
        F.sum(d(F.col("x1") * F.col("x1"))).alias("s11i"),
        F.sum(d(F.col("x1") * F.col("x2"))).alias("s12i"),
        F.sum(d(F.col("x2") * F.col("x2"))).alias("s22i"),
        F.sum(d(F.col("yc"))).alias("syi"),
        F.sum(d(F.col("x1") * F.col("yc"))).alias("s1yi"),
        F.sum(d(F.col("x2") * F.col("yc"))).alias("s2yi"),
        F.sum(d(F.col("yc") * F.col("yc"))).alias("syyi"),
    ).collect()
    keys = ["ni", "s1i", "s2i", "s11i", "s12i", "s22i",
            "syi", "s1yi", "s2yi", "syyi"]
    folds = {r["fold"]: {k: int(r[k]) for k in keys} for r in per_fold}
    tot = {k: sum(f[k] for f in folds.values()) for k in keys}

    def to_float(m, held_out: bool):
        out = {"n": float(m["ni"]),
               "s1": float(m["s1i"]), "s2": float(m["s2i"]),
               "s11": float(m["s11i"]), "s12": float(m["s12i"]),
               "s22": float(m["s22i"]),
               "sy": float(m["syi"]) / 100,
               "s1y": float(m["s1yi"]) / 100,
               "s2y": float(m["s2yi"]) / 100}
        if held_out:
            out["syy"] = float(m["syyi"]) / 100 / 100
        return out

    def cv_rmse(subset: str) -> float:
        sq, nh = 0.0, 0.0
        for j in sorted(folds):
            hold = folds[j]
            tr = to_float({k: tot[k] - hold[k] for k in keys}, False)
            hm = to_float(hold, True)
            if subset == "n_items":
                b0, b1 = cf.solve_ols1(tr["n"], tr["s1"], tr["s11"],
                                       tr["sy"], tr["s1y"])
                b2 = 0.0
            elif subset == "total_qty":
                b0, b2 = cf.solve_ols1(tr["n"], tr["s2"], tr["s22"],
                                       tr["sy"], tr["s2y"])
                b1 = 0.0
            else:
                b0, b1, b2 = cf.solve_ols2(
                    tr["n"], tr["s1"], tr["s2"], tr["s11"], tr["s12"],
                    tr["s22"], tr["sy"], tr["s1y"], tr["s2y"])
            sq += max(cf.sse_quadform2(hm, b0, b1, b2), 0.0)
            nh += hm["n"]
        from math import sqrt
        return sqrt(sq / nh)

    cands = [(1, "n_items", cv_rmse("n_items")),
             (1, "total_qty", cv_rmse("total_qty")),
             (2, "n_items,total_qty", cv_rmse("n_items,total_qty"))]
    per_size = {}
    for nfeat, fs, rmse in cands:   # best subset per size by (rmse, name)
        if nfeat not in per_size or (rmse, fs) < per_size[nfeat]:
            per_size[nfeat] = (rmse, fs)
    rows = [(nfeat, fs, round(rmse, 6))
            for nfeat, (rmse, fs) in sorted(per_size.items())]
    win = min(rows, key=lambda r: (r[2], r[0]))[0]
    return spark.createDataFrame(
        [(nfeat, fs, r6, nfeat == win) for nfeat, fs, r6 in rows],
        "n_features int, feature_set string, cv_rmse double, "
        "selected boolean")
