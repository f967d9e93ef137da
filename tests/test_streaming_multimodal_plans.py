"""Tests for the streaming layer (stream/batch parity), multimodal
mapInPandas plumbing (determinism, batch shape), and physical-plan
assertions (pushdown, broadcast, no cartesian)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl___2023_spark import plans
from big_data_bowl___2023_spark.multimodal import (
    decode_media,
    extract_features,
    frame_sample,
    media_from_documents,
)
from big_data_bowl___2023_spark.sources.io import load_table
from big_data_bowl___2023_spark.streaming import (
    read_event_stream,
    run_available_now,
    tumbling_counts,
)


def test_stream_batch_parity(spark, sf_dir):
    """availableNow streaming result == identical batch aggregation."""
    stream_out = run_available_now(
        tumbling_counts(read_event_stream(spark, sf_dir), "1 day"),
        spark).collect()
    ev = load_table(spark, sf_dir, "events")
    batch = (ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("value").cast("decimal(18,2)"))
                   .cast("double").alias("total_value"))
             .select(F.col("w.start").alias("window_start"),
                     "event_type", "n", "total_value")).collect()
    key = lambda r: (r.window_start, r.event_type)
    # Epoch-collapse guard (round-3 failure mode): a mis-decoded ts
    # merges every window into ~1970 — parity alone can't catch it
    # because the batch side would collapse identically.
    assert min(r.window_start for r in stream_out).year > 2000
    assert sorted((key(r), r.n, r.total_value) for r in stream_out) == \
           sorted((key(r), r.n, r.total_value) for r in batch)


def test_stateful_funnel_stream_batch_parity(spark, sf_dir):
    """The custom applyInPandasWithState funnel detector, run as a
    one-shot stream, must match the window-based batch derivation of
    the same semantics row for row."""
    from big_data_bowl___2023_spark.streaming import (
        funnel_detect,
        funnel_detect_batch,
    )

    stream_out = run_available_now(
        funnel_detect(read_event_stream(spark, sf_dir), min_views=3),
        spark, output_mode="append").collect()
    batch = funnel_detect_batch(
        load_table(spark, sf_dir, "events"), min_views=3).collect()
    as_set = lambda rows: {(r.user_id, r.first_purchase_event,
                            r.views_before) for r in rows}
    assert stream_out, "funnel detector emitted nothing"
    assert as_set(stream_out) == as_set(batch)


def test_multimodal_decode_deterministic(spark, sf_dir):
    """Stub decode is stable across runs and batch-shape independent
    (repartitioning must not change results)."""
    docs = load_table(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    a = {r.media_id: (r.width, r.height, r.n_channels)
         for r in decode_media(media).collect()}
    b = {r.media_id: (r.width, r.height, r.n_channels)
         for r in decode_media(media.repartition(7)).collect()}
    assert a == b and len(a) == docs.count()
    assert all(16 <= w < 256 and 16 <= h < 256 and 1 <= c <= 3
               for w, h, c in a.values())


def test_multimodal_features_shape(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = extract_features(media_from_documents(docs)).collect()
    assert rows
    for r in rows:
        assert len(r.features) == 8
        assert all(0.0 <= v <= 1.0 for v in r.features)


def test_multimodal_frame_sample_one_to_many(spark, sf_dir):
    """1→N mapInPandas: more output rows than inputs, frame bytes are
    slices of the payload."""
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = media_from_documents(docs)
    frames = frame_sample(media, every_n_bytes=64, max_frames=4).collect()
    assert len(frames) > 20
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_index)
    assert all(sorted(v) == list(range(len(v)))
               for v in by_media.values())


def test_plan_pushdown(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = (li.filter(F.col("l_quantity") > 45.0)
            .select("l_orderkey", "l_quantity"))
    plans.assert_pushed_filters(df, "GreaterThan(l_quantity,45.0)")


def test_plan_broadcast_star_join(spark, sf_dir):
    from big_data_bowl___2023_spark.registry import all_queries
    df = all_queries()["j3_broadcast_dim_revenue"](spark, sf_dir)
    plans.assert_broadcast_join(df, min_count=2)
    plans.assert_no_cartesian(df)


def test_plan_partition_pruning(spark, sf_dir):
    """The partitioned-sink round trip must prune to ONE event_type
    directory: PartitionFilters carries the equality predicate and
    the scan's selected partition count is 1."""
    from big_data_bowl___2023_spark.queries.relational import (
        stage_partitioned_events,
    )
    stage = stage_partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(stage)
    df = ev.filter(F.col("event_type") == "purchase").select("user_id")
    plans.assert_partition_pruned(df, "event_type")
    plan = plans.formatted_plan(df)
    assert "isnotnull(event_type" in plan
    # Pruned read: the value-level filter must NOT appear as a data
    # filter — it is satisfied entirely by directory selection.
    data_filters = [l for l in plan.splitlines()
                    if "PushedFilters" in l]
    assert all("purchase" not in l for l in data_filters)


def test_merged_window_query_single_exchange(spark, sf_dir):
    """w1_lag_delta computes three lag columns over one window spec —
    the plan must shuffle exactly once (one Exchange for the
    partitionBy; a second Exchange would mean the specs diverged)."""
    from big_data_bowl___2023_spark.registry import all_queries
    df = all_queries()["w1_lag_delta"](spark, sf_dir)
    plan = plans.formatted_plan(df)
    n_exchange = sum(1 for line in plan.splitlines()
                     if line.strip().startswith("+- Exchange")
                     or line.strip().startswith("Exchange"))
    assert n_exchange == 1, plan[:2000]


def test_topk_is_take_ordered(spark, sf_dir):
    """o5_ranking's ORDER BY + LIMIT must compile to
    TakeOrderedAndProject (per-partition heaps), not a global Sort."""
    from big_data_bowl___2023_spark.registry import all_queries
    df = all_queries()["o5_ranking"](spark, sf_dir)
    assert "TakeOrderedAndProject" in plans.formatted_plan(df)


def test_entry_plan_is_pruned(spark, sf_dir):
    """Flagship q1 must read only the columns it uses (ReadSchema
    pruned to 7 of 11 lineitem columns)."""
    from big_data_bowl___2023_spark.registry import all_queries
    df = all_queries()["q1_pricing_summary"](spark, sf_dir)
    plan = plans.formatted_plan(df)
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read and "l_quantity" in read

def test_multimodal_resize_bounded_and_deterministic(spark, sf_dir):
    """Resize pass: aspect preserved, both dims <= max_side, output
    payload exactly width*height bytes (the bounded-output contract
    that makes shuffling resized media affordable), deterministic
    across runs."""
    from big_data_bowl___2023_spark.multimodal import (
        decode_media,
        media_from_documents,
        resize_media,
    )
    from big_data_bowl___2023_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = media_from_documents(docs)
    orig = {r.media_id: (r.width, r.height)
            for r in decode_media(media).collect()}
    out = {r.media_id: (r.width, r.height, bytes(r.data))
           for r in resize_media(media, max_side=32).collect()}
    assert set(out) == set(orig)
    for mid, (w, h, data) in out.items():
        ow, oh = orig[mid]
        assert 1 <= w <= 32 and 1 <= h <= 32
        assert len(data) == w * h
        # aspect preserved within integer truncation
        if ow >= oh:
            assert w >= h
        else:
            assert h >= w
    again = {r.media_id: (r.width, r.height, bytes(r.data))
             for r in resize_media(media, max_side=32).collect()}
    assert again == out
