from .dedup_stream import (
    fingerprint_index,
    incremental_dedup,
    incremental_dedup_watermarked,
    incremental_minhash_pairs,
    read_document_stream,
)
from .curation import (
    apply_snapshot_diff,
    compact_curated,
    read_curated,
    benchmark_shingle_set,
    curate_document_stream,
    make_curation_ingest_batch_fn,
    stream_decontaminate,
)
from .cardinality import windowed_distinct_counts
from .frequency import (
    latest_window_sketches,
    windowed_cms_sketches,
    windows_as_cms_summary,
)
from .samples import (
    latest_window_samples,
    windowed_samples,
    windows_as_sample,
)
from .quantiles import (
    latest_window_digests,
    windowed_quantile_digests,
    windows_as_quantile_summary,
)
from .ann_index_stream import (
    compact_index,
    make_ann_index_batch_fn,
    vacuum_index,
)
from .scd_stream import (
    committed_snapshot_ids,
    make_scd2_batch_fn,
    quarantine_log,
    scd2_dim,
)
from .semantic_stream import (
    make_semantic_ingest_batch_fn,
    pairs_with_centroids,
)
from .joins import foreach_batch_upsert, interval_join
from .trending import latest_summaries, streaming_heavy_hitters
from .events import (
    funnel_detect,
    funnel_detect_batch,
    hopping_counts,
    read_event_stream,
    run_available_now,
    session_windows,
    tumbling_counts,
)

__all__ = ["benchmark_shingle_set", "curate_document_stream",
           "fingerprint_index", "foreach_batch_upsert", "funnel_detect",
           "funnel_detect_batch", "interval_join",
           "hopping_counts", "incremental_dedup",
           "incremental_dedup_watermarked", "incremental_minhash_pairs",
           "make_curation_ingest_batch_fn",
           "apply_snapshot_diff", "compact_curated", "read_curated",
           "make_scd2_batch_fn", "committed_snapshot_ids",
           "quarantine_log", "scd2_dim",
           "make_semantic_ingest_batch_fn", "pairs_with_centroids",
           "read_document_stream", "read_event_stream",
           "run_available_now", "session_windows", "stream_decontaminate",
           "streaming_heavy_hitters", "latest_summaries",
           "tumbling_counts", "windowed_distinct_counts",
           "latest_window_digests", "windowed_quantile_digests",
           "windows_as_quantile_summary",
           "latest_window_sketches", "windowed_cms_sketches",
           "windows_as_cms_summary",
           "latest_window_samples", "windowed_samples",
           "windows_as_sample",
           "compact_index", "make_ann_index_batch_fn",
           "vacuum_index"]
