"""Distribution drift detection between dataset snapshots (PSI).

When a corpus refreshes (new crawl, new pipeline version), the
question before retraining is whether feature distributions moved.
The standard score is the Population Stability Index: bucket the
REFERENCE snapshot into equal-population quantile bins, share-count
both snapshots against those same bins, and

    PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)

with the usual reading: < 0.1 stable, 0.1–0.25 moderate shift,
> 0.25 action required.

Spark shape: ONE pass over each snapshot per report — reference bin
edges come from the exact ``percentile`` aggregate (deterministic,
oracle-matched; swap for approx_percentile at 100 TB, the knob is a
parameter), bucket assignment is a codegen comparison chain (the
same shape as ``sampling.quantile_buckets``), and the per-column
shares are a pair of tiny aggregations joined on the bucket id.
NULLs are their own bucket (a drift in nullability is drift).

Reference scope note: north-star extension (SURVEY.md §2
extensions); the reference has no monitoring surface.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-6     # share smoothing: empty bins contribute finitely


def _edges(reference: DataFrame, col: str, n_buckets: int,
           exact: bool) -> list[float]:
    if exact:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        row = reference.agg(F.percentile(
            F.col(col), F.array(*[F.lit(q) for q in qs]))
            .alias("e")).first()
        edges = list(row.e or [])
    else:
        edges = reference.approxQuantile(
            col, [i / n_buckets for i in range(1, n_buckets)], 1e-3)
    # dedupe (constant/low-cardinality columns produce tied edges)
    out: list[float] = []
    for e in edges:
        if e is not None and (not out or e > out[-1]):
            out.append(float(e))
    return out


def _bucket(col: str, edges: list[float]) -> F.Column:
    b = F.lit(len(edges))                  # top bucket
    for i in reversed(range(len(edges))):
        b = F.when(F.col(col) <= F.lit(edges[i]), F.lit(i)).otherwise(b)
    return F.when(F.col(col).isNull(), F.lit(-1)).otherwise(b)


def _shares(df: DataFrame, col: str, edges: list[float],
            side: str) -> DataFrame:
    return (df.groupBy(_bucket(col, edges).alias("bucket"))
            .agg(F.count(F.lit(1)).alias(f"n_{side}")))


def psi_report(reference: DataFrame, current: DataFrame,
               cols: Sequence[str], n_buckets: int = 10,
               exact_edges: bool = True) -> DataFrame:
    """(column, psi, n_buckets_used): one PSI per numeric column,
    bucketed on the REFERENCE snapshot's quantile edges (NULL is its
    own bucket, id −1). ``exact_edges=False`` switches the edge
    computation to ``approxQuantile`` for corpus-scale references —
    bucket SEMANTICS are identical, only edge placement is
    approximate."""
    spark = reference.sparkSession
    rows = []
    for col in cols:
        edges = _edges(reference, col, n_buckets, exact_edges)
        ref = _shares(reference, col, edges, "ref")
        cur = _shares(current, col, edges, "cur")
        joined = ref.join(cur, "bucket", "full").collect()
        n_ref = sum(r.n_ref or 0 for r in joined)
        n_cur = sum(r.n_cur or 0 for r in joined)
        psi = 0.0
        for r in joined:
            p = max((r.n_ref or 0) / max(n_ref, 1), _EPS)
            q = max((r.n_cur or 0) / max(n_cur, 1), _EPS)
            psi += (q - p) * math.log(q / p)
        rows.append((col, round(psi, 6), len(edges) + 1))
    return spark.createDataFrame(rows,
                                 "column string, psi double, "
                                 "n_buckets_used int")


def drifted_columns(reference: DataFrame, current: DataFrame,
                    cols: Sequence[str], threshold: float = 0.25,
                    n_buckets: int = 10) -> list[str]:
    """Columns whose PSI crosses ``threshold`` — the retrain/alert
    trigger list."""
    rep = psi_report(reference, current, cols, n_buckets)
    return [r.column for r in rep.collect() if r.psi >= threshold]


def psi_report_categorical(reference: DataFrame, current: DataFrame,
                           cols: Sequence[str],
                           max_categories: int = 50) -> DataFrame:
    """(column, psi, n_categories_used): PSI over CATEGORICAL columns
    — label-shift / source-mix drift. Bins are the reference's top
    ``max_categories`` values by frequency (deterministic: count desc,
    value asc); everything else folds into an OTHER bin and NULL is
    its own bin, so a new category surging in the current snapshot
    shows up as OTHER-share growth rather than silently vanishing.
    Two tiny aggregations per column, same smoothing and reading as
    :func:`psi_report`."""
    spark = reference.sparkSession
    rows = []
    for col in cols:
        top = [r[0] for r in
               (reference.filter(F.col(col).isNotNull())
                .groupBy(col).count()
                .orderBy(F.desc("count"), F.asc(col))
                .limit(max_categories).collect())]
        topset = set(top)
        bin_expr = (F.when(F.col(col).isNull(), F.lit("__null__"))
                    .when(F.col(col).isin(*[F.lit(t) for t in top])
                          if top else F.lit(False),
                          F.col(col).cast("string"))
                    .otherwise(F.lit("__other__")))

        def shares(df, side):
            return {r.b: r.n for r in
                    df.groupBy(bin_expr.alias("b"))
                    .agg(F.count(F.lit(1)).alias("n")).collect()}

        cr = shares(reference, "ref")
        cc = shares(current, "cur")
        nr, nc = sum(cr.values()), sum(cc.values())
        psi = 0.0
        for b in set(cr) | set(cc):
            p = max(cr.get(b, 0) / max(nr, 1), _EPS)
            q = max(cc.get(b, 0) / max(nc, 1), _EPS)
            psi += (q - p) * math.log(q / p)
        rows.append((col, round(psi, 6), len(topset) + 2))
    return spark.createDataFrame(rows,
                                 "column string, psi double, "
                                 "n_categories_used int")
