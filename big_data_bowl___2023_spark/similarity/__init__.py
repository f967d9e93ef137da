from .ann import (
    brp_lsh_topk,
    brute_force_topk,
    ivf_topk,
    mine_hard_negatives,
    mine_hard_negatives_ann,
)
from .fusion import hybrid_topk, rrf_fuse
from .projection import (
    project_embeddings,
    projected_topk_rerank,
    projection_matrix,
)
from .pq import (
    encode_pq,
    exact_rerank,
    pq_topk,
    pq_topk_rerank,
    train_pq,
)
from .quantize import (
    dequantize,
    embedding_ranges,
    merge_ranges,
    quantize_embeddings,
    quantized_topk_rerank,
    saturation_report,
)
from .index import (
    CELL_SKEW_WARN_RATIO,
    SATURATION_REBUILD_THRESHOLD,
    ann_index_search,
    ann_index_search_quantized,
    append_to_index,
    build_ann_index,
    clear_index_deletes,
    delete_from_index,
    undelete_from_index,
    index_cell_stats,
    index_versions,
    saturation_history,
)
from .retrieval import bm25_scores, bm25_topk, term_postings

__all__ = ["brute_force_topk", "brp_lsh_topk", "ivf_topk",
           "ann_index_search", "ann_index_search_quantized",
           "append_to_index", "build_ann_index",
           "mine_hard_negatives", "mine_hard_negatives_ann",
           "hybrid_topk", "rrf_fuse",
           "project_embeddings", "projected_topk_rerank",
           "projection_matrix",
           "encode_pq", "exact_rerank", "pq_topk", "pq_topk_rerank",
           "train_pq",
           "dequantize", "embedding_ranges", "merge_ranges",
           "quantize_embeddings", "quantized_topk_rerank",
           "saturation_report", "saturation_history",
           "SATURATION_REBUILD_THRESHOLD",
           "index_cell_stats", "CELL_SKEW_WARN_RATIO",
           "delete_from_index", "undelete_from_index",
           "clear_index_deletes",
           "index_versions",
           "bm25_scores", "bm25_topk", "term_postings"]
