from .ann import brute_force_topk, brp_lsh_topk, ivf_topk
from .retrieval import bm25_scores, bm25_topk, term_postings

__all__ = ["brute_force_topk", "brp_lsh_topk", "ivf_topk",
           "bm25_scores", "bm25_topk", "term_postings"]
