from .ann import brute_force_topk, brp_lsh_topk, ivf_topk

__all__ = ["brute_force_topk", "brp_lsh_topk", "ivf_topk"]
