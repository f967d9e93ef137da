"""Per-batch corpus artifact store (pipelines/artifacts.py).

Contracts under test:
* one write per batch, merged views answer corpus-lifetime
  questions: Bloom covers every fingerprint ever written; HLL
  tracks per-source distinct ids; merged MG summaries + exact
  recount find a cross-batch-heavy fingerprint; CMS estimates are
  sound; t-digest counts/min/max are exact per source; samples
  equal the single-pass bottom-k over the whole corpus;
* retry safety — rewriting a batch id REPLACES its artifacts
  (additive sketches do not double-count a retried batch);
* time travel — a batches=[...] view answers from that prefix only.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.pipelines.artifacts import (
    ArtifactSpec,
    corpus_artifact_views,
    write_batch_artifacts,
)

SPEC = ArtifactSpec(bloom_expected_keys=10_000,
                    heavy_min_freq_ratio=0.02, sample_k=5)

BOILER = ("boilerplate navigation header repeated on every page "
          "of this crawl forever and ever")


def _batches(spark, sf_dir):
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "source"))
    n = docs.count()
    out = []
    for i in range(3):
        b = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i)
        # plant the SAME boilerplate text in every batch under fresh
        # ids: heavy/frequency must see it as one cross-batch key
        boiler = spark.createDataFrame(
            [(10_000_000 + 100 * i + j, BOILER, "web")
             for j in range(8)], b.schema)
        out.append(b.union(boiler))
    return docs, out, n


@pytest.fixture(scope="module")
def store(spark, sf_dir, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("artifact_store"))
    docs, batches, n = _batches(spark, sf_dir)
    for i, b in enumerate(batches):
        write_batch_artifacts(b, out_dir, i, SPEC)
    whole = batches[0].union(batches[1]).union(batches[2])
    return out_dir, docs, batches, whole


def test_corpus_views_answer_lifetime_questions(spark, store):
    out_dir, docs, batches, whole = store
    views = corpus_artifact_views(spark, out_dir, SPEC)

    # Bloom: every fingerprint ever written probes "maybe"
    from big_data_bowl___2023_spark.dedup.bloom import might_contain
    fps = whole.select(F.md5("text").alias("fp")).distinct()
    assert might_contain(fps, "fp", views["bloom"], "hit") \
        .filter(~F.col("hit")).count() == 0

    # HLL: per-source distinct ids within the error band
    from big_data_bowl___2023_spark.operators.cardinality import (
        cardinality_estimate,
    )
    est = {r["source"]: r["distinct_estimate"] for r in
           cardinality_estimate(views["cardinality"]).collect()}
    exact = {r["source"]: r["n"] for r in
             whole.groupBy("source")
             .agg(F.countDistinct("doc_id").alias("n")).collect()}
    assert set(est) == set(exact)
    for s, n_s in exact.items():
        assert abs(est[s] - n_s) <= max(2, 0.05 * n_s)

    # heavy: merged summaries + exact recount find the cross-batch
    # boilerplate fingerprint with its exact count
    from big_data_bowl___2023_spark.operators.heavy import (
        heavy_hitters_from_summary,
    )
    corpus_fps = whole.select(F.md5("text").alias("fingerprint"))
    hh = {r["fingerprint"]: r["count"] for r in
          heavy_hitters_from_summary(
              corpus_fps, views["heavy"], "fingerprint",
              SPEC.heavy_min_freq_ratio).collect()}
    boiler_fp = corpus_fps.filter(
        F.col("fingerprint") == F.md5(F.lit(BOILER))).count()
    assert boiler_fp == 24
    import hashlib
    key = hashlib.md5(BOILER.encode()).hexdigest()
    assert hh.get(key) == 24

    # frequency: sound estimate for the planted key
    from big_data_bowl___2023_spark.operators.frequency import (
        estimate_counts,
    )
    probe = spark.createDataFrame([(key,)], "fingerprint string")
    got = estimate_counts(probe, "fingerprint",
                          views["frequency"]).collect()[0]
    assert got["freq_estimate"] >= 24

    # quantiles: exact count/min/max per source
    qrows = {r["source"]: r for r in views["quantiles"].collect()}
    lens = whole.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.length("text")).alias("lo"),
        F.max(F.length("text")).alias("hi"))
    for r in lens.collect():
        q = qrows[r["source"]]
        assert q["count"] == r["n"]
        assert q["min"] == r["lo"] and q["max"] == r["hi"]

    # samples: identical to the single-pass sketch over the corpus
    from big_data_bowl___2023_spark.operators.bottomk import (
        bottomk_summary,
    )
    direct = bottomk_summary(
        whole.select("source", "doc_id",
                     F.length("text").alias("n_chars_artifact")),
        "doc_id", SPEC.sample_k, group_cols=["source"],
        payload_cols=["n_chars_artifact"])
    assert sorted(map(tuple, views["samples"].collect())) == \
        sorted(map(tuple, direct.collect()))


def test_retry_replaces_not_doubles(spark, store, tmp_path):
    _, docs, batches, _ = store
    out_dir = str(tmp_path / "retry_store")
    # partial (crashed) batch 0: half the docs
    partial = batches[0].limit(50)
    write_batch_artifacts(partial, out_dir, 0, SPEC)
    before = corpus_artifact_views(spark, out_dir, SPEC)
    n_before = sum(r["count"] for r in before["quantiles"].collect())
    assert n_before == 50
    # retry batch 0 in full: counts must REPLACE, not add
    write_batch_artifacts(batches[0], out_dir, 0, SPEC)
    after = corpus_artifact_views(spark, out_dir, SPEC)
    n_after = sum(r["count"] for r in after["quantiles"].collect())
    assert n_after == batches[0].count()
    # same for the additive CMS: total mass equals the batch rows
    from big_data_bowl___2023_spark.operators.frequency import (
        cms_matrix,
    )
    cells, (_, d) = cms_matrix(after["frequency"])
    assert (cells.sum(axis=1) == batches[0].count()).all()


def test_time_travel_prefix_view(spark, store):
    out_dir, docs, batches, _ = store
    only0 = corpus_artifact_views(spark, out_dir, SPEC, batches=[0])
    n0 = sum(r["count"] for r in only0["quantiles"].collect())
    assert n0 == batches[0].count()
    both = corpus_artifact_views(spark, out_dir, SPEC,
                                 batches=[0, 1])
    n01 = sum(r["count"] for r in both["quantiles"].collect())
    assert n01 == batches[0].count() + batches[1].count()


def test_foreach_batch_adapter_stream_and_replay(spark, sf_dir,
                                                 tmp_path):
    """The foreachBatch adapter wires the store to a stream: each
    micro-batch leaves its sketches under batch=N, and a REPLAYED
    batch id (checkpoint recovery re-runs the last uncommitted
    batch) replaces its artifacts instead of double-counting."""
    import time

    from big_data_bowl___2023_spark.pipelines.artifacts import (
        make_artifact_batch_fn,
    )

    src = str(tmp_path / "incoming")
    store = str(tmp_path / "store")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "source"))
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    b0.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    b1.coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream
         .foreachBatch(make_artifact_batch_fn(store, SPEC))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    views = corpus_artifact_views(spark, store, SPEC)
    n = sum(r["count"] for r in views["quantiles"].collect())
    assert n == docs.count()

    # checkpoint-recovery replay: re-running a batch id replaces
    make_artifact_batch_fn(store, SPEC)(b1, 1)
    views2 = corpus_artifact_views(spark, store, SPEC)
    n2 = sum(r["count"] for r in views2["quantiles"].collect())
    assert n2 == n


def test_store_drift_between_batches(spark, store):
    """Second-order artifact question: drift between two ingest
    batches' length distributions, straight from the store's
    quantile views — neither batch rescanned. Random thirds of the
    same corpus read as stable; a batch of doubled lengths alerts.
    (Per-source grain is folded out: at sf0.001 each source holds
    ~8 docs per batch, far below PSI's useful sample size.)"""
    import tempfile

    from big_data_bowl___2023_spark.operators.quantiles import (
        merge_quantile_summaries,
        psi_from_digests,
    )
    from big_data_bowl___2023_spark.pipelines.artifacts import (
        write_batch_artifacts,
    )

    out_dir, docs, batches, _ = store

    def whole(view):
        return merge_quantile_summaries(
            view["quantiles"].drop("source"), group_cols=[])

    v0 = corpus_artifact_views(spark, out_dir, SPEC, batches=[0])
    v1 = corpus_artifact_views(spark, out_dir, SPEC, batches=[1])
    stable = psi_from_digests(whole(v0), whole(v1)).collect()[0]
    assert stable["n_ref"] > 100 and stable["n_cur"] > 100
    assert stable["psi"] < 0.25

    shifted = batches[1].withColumn(
        "text", F.concat(F.col("text"), F.col("text")))
    with tempfile.TemporaryDirectory() as tmp:
        write_batch_artifacts(batches[0], tmp, 0, SPEC)
        write_batch_artifacts(shifted, tmp, 1, SPEC)
        a = corpus_artifact_views(spark, tmp, SPEC, batches=[0])
        b = corpus_artifact_views(spark, tmp, SPEC, batches=[1])
        alert = psi_from_digests(whole(a), whole(b)).collect()[0]
        assert alert["psi"] > 0.25
