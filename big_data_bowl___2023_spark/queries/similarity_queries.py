"""Driver-checked similarity-search queries over ``embeddings``.

``sim_topk_cosine`` (brute force) is the oracle-checked exact
baseline; the IVF and MLlib-LSH variants are the sub-linear scale
paths (rows-only where their internals aren't SQL-reproducible).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..similarity import brp_lsh_topk, brute_force_topk, ivf_topk
from ._util import load_table

N_QUERIES = 10   # embeddings with vec_id < 10 act as the query batch
TOP_K = 5


@query(
    "sim_topk_cosine",
    f"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        q AS (SELECT vec_id, e FROM v WHERE vec_id < {N_QUERIES}),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ROUND(list_dot_product(q.e, c.e)
                       / (sqrt(list_dot_product(q.e, q.e))
                          * sqrt(list_dot_product(c.e, c.e))), 6) AS cosine
          FROM q JOIN v c ON q.vec_id <> c.vec_id)
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored)
        WHERE rank <= {TOP_K}""",
)
def sim_topk_cosine(spark, sf_dir):
    """Exact brute-force cosine top-k: broadcast query batch × full
    corpus scan, per-query window ranking on (rounded cosine, id) —
    deterministic across engines (similarity.ann.brute_force_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return brute_force_topk(emb, queries, TOP_K)


@query("sim_ivf_topk")
def sim_ivf_topk(spark, sf_dir):
    """IVF-style ANN: deterministic hyperplane sign cells + multi-
    probe, exact cosine within probed cells — the sub-linear scan
    path (similarity.ann.ivf_topk). Rows-only: the cell assignment is
    deterministic but impractically large to restate in one oracle;
    recall is tested against the brute-force baseline in pytest."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return ivf_topk(emb, queries, TOP_K)


@query("sim_brp_lsh_topk")
def sim_brp_lsh_topk(spark, sf_dir):
    """MLlib BucketedRandomProjectionLSH top-k (Euclidean) — stock
    library scale path, seeded; rows-only (internal hash family)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return brp_lsh_topk(emb, queries, TOP_K)
