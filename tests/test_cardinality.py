"""HLL cardinality summaries: accuracy vs exact distinct counts,
batch-merge == whole-corpus parity, artifact round trip, and the
no-distinct-key-shuffle plan claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.cardinality import (
    cardinality_estimate,
    cardinality_summary,
    distinct_count_report,
    merge_cardinality,
)
from big_data_bowl___2023_spark.sources.io import load_table

# DataSketches HLL at the default lgConfigK=12 has ~1.6% relative
# standard error; 5% is a >3-sigma acceptance band.
TOL = 0.05


def _close(est, exact):
    return abs(est - exact) <= max(2, TOL * exact)


def test_estimate_accuracy_vs_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = docs.select("doc_id").distinct().count()
    est = distinct_count_report(docs, "doc_id").first() \
        .distinct_estimate
    assert _close(est, exact)


def test_grouped_estimates_match_exact_per_group(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {r.source: r.n for r in
             docs.groupBy("source")
             .agg(F.countDistinct("doc_id").alias("n")).collect()}
    got = {r.source: r.distinct_estimate for r in
           distinct_count_report(docs, "doc_id", ["source"])
           .collect()}
    assert set(got) == set(exact)
    for src, n in exact.items():
        assert _close(got[src], n)


def test_merge_equals_whole_corpus(spark):
    """Per-batch sketches merged ≈ one sketch over the union — the
    growing-corpus contract. Overlapping keys across batches must not
    double-count. NOT exact equality: DataSketches scores a directly
    built sketch with the order-sensitive HIP estimator but a unioned
    sketch with the composite estimator, so the two paths differ
    within the error band — and the direct path's estimate shifts
    with the partial-aggregation tree shape (an `est == whole` assert
    here passed at 8 local threads and failed at 16/32)."""
    b1 = spark.createDataFrame(
        [(i, "s") for i in range(3000)], ["k", "g"])
    b2 = spark.createDataFrame(
        [(i, "s") for i in range(2000, 6000)], ["k", "g"])  # overlap
    merged = merge_cardinality(
        cardinality_summary(b1, "k", ["g"]),
        cardinality_summary(b2, "k", ["g"]))
    est = cardinality_estimate(merged).first().distinct_estimate
    whole = distinct_count_report(
        b1.unionByName(b2), "k", ["g"]).first().distinct_estimate
    assert abs(est - whole) <= 0.02 * 6000   # same data, both paths
    assert _close(est, 6000) and _close(whole, 6000)


def test_merge_associativity_and_order_independence(spark):
    parts = [spark.createDataFrame(
        [(i,) for i in range(s, s + 1500)], ["k"])
        for s in (0, 1000, 2000)]
    sums = [cardinality_summary(p, "k") for p in parts]
    a = cardinality_estimate(
        merge_cardinality(merge_cardinality(sums[0], sums[1]),
                          sums[2])).first().distinct_estimate
    b = cardinality_estimate(
        merge_cardinality(sums[2], sums[0], sums[1])) \
        .first().distinct_estimate
    assert a == b
    assert _close(a, 3500)


def test_null_keys_ignored_null_group_kept(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (None, "a"), (3, None)],
        "k long, g string")
    got = {r.g: r.distinct_estimate for r in
           distinct_count_report(df, "k", ["g"]).collect()}
    assert got["a"] == 2          # NULL key not counted
    assert got[None] == 1         # NULL group is its own row


def test_artifact_parquet_round_trip(spark, tmp_path):
    """The summary is a plain (group, binary) DataFrame: parquet
    round trip preserves the sketch bytes, and a merge of a persisted
    artifact with a fresh batch still estimates correctly."""
    b1 = spark.createDataFrame([(i,) for i in range(4000)], ["k"])
    path = str(tmp_path / "card_art")
    cardinality_summary(b1, "k").write.parquet(path)
    loaded = spark.read.parquet(path)
    b2 = spark.createDataFrame(
        [(i,) for i in range(4000, 5000)], ["k"])
    est = cardinality_estimate(
        merge_cardinality(loaded, cardinality_summary(b2, "k"))) \
        .first().distinct_estimate
    assert _close(est, 5000)


def test_plan_no_distinct_key_shuffle(spark, sf_dir):
    """The report's only exchange carries one sketch row per group
    (partial HLL agg map-side) — never the distinct-key universe, and
    no Python UDF stage."""
    from big_data_bowl___2023_spark.plans.explain import formatted_plan

    docs = load_table(spark, sf_dir, "documents")
    plan = formatted_plan(
        distinct_count_report(docs, "doc_id", ["source"]))
    assert "hll_sketch_agg" in plan
    # partial aggregation before the exchange: the merge-side agg
    # consumes partial sketches, not raw keys
    assert plan.count("HashAggregate") >= 2
    assert "Expand" not in plan          # no count-distinct rewrite
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# ------------------------------------------------- streaming monitor

def test_windowed_distinct_counts_stream_batch_parity(spark, sf_dir,
                                                      tmp_path):
    """The streaming windowed sketch estimates equal the batch run of
    the SAME function over the same data (hll_sketch_agg is
    deterministic for a given multiset), and track exact
    countDistinct within the sketch tolerance."""
    import uuid

    from big_data_bowl___2023_spark.streaming.cardinality import (
        windowed_distinct_counts,
    )

    ev = load_table(spark, sf_dir, "events") \
        .select("ts", "user_id", "event_type")
    path = str(tmp_path / "ev")
    ev.coalesce(2).write.parquet(path)
    stream = spark.readStream.schema(
        spark.read.parquet(path).schema).parquet(path)

    name = f"q_{uuid.uuid4().hex[:12]}"
    q = (windowed_distinct_counts(stream, "user_id", "ts", "1 day",
                                  watermark="1 hour")
         .drop("sketch")
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r.window.start: r.distinct_estimate
           for r in spark.table(name).collect()}

    batch = {r.window.start: r.distinct_estimate
             for r in windowed_distinct_counts(
                 spark.read.parquet(path), "user_id", "ts", "1 day")
             .collect()}
    assert got == batch
    exact = {r.w.start: r.n for r in
             ev.groupBy(F.window("ts", "1 day").alias("w"))
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert set(got) == set(exact)
    for w, n in exact.items():
        assert _close(got[w], n)


def test_window_sketches_merge_to_corpus_distinct(spark, sf_dir,
                                                  tmp_path):
    """Per-window sketches from the stream merge (via the batch
    merge_cardinality) into the corpus-lifetime distinct count —
    archived emissions answer 'distinct users ever' without
    rescanning the stream."""
    import uuid

    from big_data_bowl___2023_spark.streaming.cardinality import (
        windowed_distinct_counts,
    )

    ev = load_table(spark, sf_dir, "events") \
        .select("ts", "user_id")
    path = str(tmp_path / "ev")
    ev.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(
        spark.read.parquet(path).schema).parquet(path)
    name = f"q_{uuid.uuid4().hex[:12]}"
    q = (windowed_distinct_counts(stream, "user_id", "ts", "1 day")
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    # the advertised composition: emissions straight into the batch
    # merge, group_cols=() collapsing windows into one lifetime sketch
    merged = merge_cardinality(spark.table(name), group_cols=())
    assert merged.columns == ["sketch"]
    est = cardinality_estimate(merged).first().distinct_estimate
    exact = ev.select("user_id").distinct().count()
    assert _close(est, exact)
