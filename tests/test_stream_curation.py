"""Streaming curation (streaming/curation.py): map-side
decontamination parity with the batch operator, the composed
stream-safe gate chain on a hand fixture, and stream/batch parity of
the full composition over the real documents table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.dedup.decontaminate import decontaminate
from big_data_bowl___2023_spark.streaming import (
    benchmark_shingle_set,
    curate_document_stream,
    fingerprint_index,
    read_document_stream,
    run_available_now,
    stream_decontaminate,
)

N = 4  # short shingles so small fixtures can collide on purpose


def _bench(spark):
    return spark.createDataFrame(
        [(100, "the secret benchmark passage lives here precisely")],
        ["bench_id", "text"])


def test_stream_decontaminate_matches_batch(spark, sf_dir):
    """The literal-array intersect filter keeps EXACTLY the documents
    the batch shingle-join decontaminate keeps — same n, same
    min_overlap, real corpus + a benchmark built from real docs so
    overlaps actually occur."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    benchmark = (docs.filter(F.col("doc_id") % 31 == 0)
                 .select(F.col("doc_id").alias("bench_id"), "text"))
    batch = {r.doc_id for r in
             decontaminate(docs, benchmark, n=N,
                           bench_text_col="text").collect()}
    shingles = benchmark_shingle_set(benchmark, n=N)
    assert shingles, "fixture must produce benchmark shingles"
    streamed = {r.doc_id for r in
                stream_decontaminate(docs, shingles, n=N).collect()}
    assert streamed == batch
    assert len(streamed) < docs.count()     # something was dropped


def test_stream_decontaminate_min_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "the secret benchmark passage lives here precisely intact"),
         (2, "completely unrelated words about warehouse logistics")],
        ["doc_id", "text"])
    shingles = benchmark_shingle_set(_bench(spark), n=N)
    kept1 = {r.doc_id for r in
             stream_decontaminate(docs, shingles, n=N).collect()}
    assert kept1 == {2}
    # raising min_overlap past the shared-shingle count keeps doc 1
    kept_hi = {r.doc_id for r in
               stream_decontaminate(docs, shingles, n=N,
                                    min_overlap=10**6).collect()}
    assert kept_hi == {1, 2}


def test_curate_stream_hand_fixture(spark):
    """Every stream-safe gate fires on a batch frame (the stages are
    trigger-agnostic): Gopher drops junk, redaction scrubs PII,
    decontamination drops the benchmark leak, dedup keeps one copy
    per fingerprint and honors history."""
    base = ("a perfectly ordinary paragraph with enough distinct "
            "words to pass the quality gate and contribute value "
            "to the corpus in every measurable way today")
    rows = [
        (1, base, ""),
        (2, base, ""),                          # exact duplicate of 1
        (3, "junk " * 10, ""),                  # fails min word count
        (4, base + " reach me at a@b.io for details or else", ""),
        (5, "the secret benchmark passage lives here precisely "
            + base, ""),                        # contaminated
        (6, "historic " + base, ""),            # already in history
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    history = fingerprint_index(
        spark.createDataFrame([(60, "historic " + base)],
                              ["doc_id", "text"]))
    out = curate_document_stream(
        docs, history=history, benchmark=_bench(spark),
        min_words=20, decontaminate_n=N)
    got = {r.doc_id: r.text for r in out.collect()}
    assert 3 not in got and 5 not in got and 6 not in got
    assert len(set(got) & {1, 2}) == 1          # one fingerprint kept
    assert 4 in got and "a@b.io" not in got[4]
    assert "[PII-email]" in got[4]


def test_curate_stream_batch_parity(spark, sf_dir):
    """availableNow streaming run == the identical composition run as
    a batch, at the fingerprint level (the corpus-membership
    contract), over the real documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    history = fingerprint_index(
        docs.filter(F.col("doc_id") % 5 == 0)).cache()
    history.count()
    benchmark = (docs.filter(F.col("doc_id") % 31 == 1)
                 .select(F.col("doc_id").alias("bench_id"), "text"))

    stream = read_document_stream(spark, sf_dir)
    streamed = run_available_now(
        curate_document_stream(stream, history=history,
                               benchmark=benchmark, min_words=5,
                               decontaminate_n=N),
        spark, output_mode="append")
    batch = curate_document_stream(docs, history=history,
                                   benchmark=benchmark, min_words=5,
                                   decontaminate_n=N)
    s_fp = {r.fingerprint for r in
            streamed.select("fingerprint").collect()}
    b_fp = {r.fingerprint for r in batch.select("fingerprint").collect()}
    assert s_fp == b_fp
    assert 0 < len(s_fp) < docs.count()


def test_stream_decontaminate_null_text_kept(spark):
    """NULL text never matches a shingle — kept, like the batch path
    (whose shingle join simply produces no rows for it)."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    docs = spark.createDataFrame(
        [(1, None), (2, "the secret benchmark passage lives here "
                        "precisely and then some")], schema)
    shingles = benchmark_shingle_set(_bench(spark), n=N)
    kept = {r.doc_id for r in
            stream_decontaminate(docs, shingles, n=N).collect()}
    assert kept == {1}


def test_stream_decontaminate_union_semantics_documented(spark):
    """Pinned contract: at min_overlap>1 the stream gate counts
    shared shingles against the UNION of benchmark items (stricter),
    while the batch operator thresholds per (doc, item) pair — a doc
    sharing one shingle with each of two different items is dropped
    by the stream gate but kept by batch decontaminate."""
    # each 5-word item yields two 4-gram shingles, both present in
    # the doc: per-item overlap = 2, union overlap = 4
    bench2 = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon"),
         (101, "one two three four five")],
        ["bench_id", "text"])
    doc = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon unrelated filler words "
             "one two three four five closing remark")],
        ["doc_id", "text"])
    shingles = benchmark_shingle_set(bench2, n=N)
    assert len(shingles) == 4
    stream_kept = stream_decontaminate(
        doc, shingles, n=N, min_overlap=3).count()
    batch_kept = decontaminate(doc, bench2, n=N, min_overlap=3,
                               bench_text_col="text").count()
    assert stream_kept == 0      # union overlap 4 >= 3
    assert batch_kept == 1       # per-item overlap max 2 < 3


def test_curation_ingest_loop_multi_batch(spark, tmp_path):
    """The foreachBatch ingestion loop: batch 1 bootstraps the output
    + index; batch 2's cross-batch duplicates are suppressed by the
    index the loop itself updated; the index ends as the union of all
    emitted fingerprints. Processor invoked directly (the foreachBatch
    contract) — batch semantics are identical to the wired stream."""
    from big_data_bowl___2023_spark.streaming import (
        make_curation_ingest_batch_fn,
    )

    base = ("a perfectly ordinary paragraph with enough distinct "
            "words to pass the quality gate and contribute value "
            "to the corpus in every measurable way today")
    out_dir = str(tmp_path / "docs")
    idx_dir = str(tmp_path / "index")
    process = make_curation_ingest_batch_fn(out_dir, idx_dir,
                                            min_words=20)

    b1 = spark.createDataFrame(
        [(1, "first " + base, "web"), (2, "second " + base, "web")],
        ["doc_id", "text", "source"])
    process(b1, 0)
    assert spark.read.parquet(out_dir).count() == 2
    assert spark.read.parquet(idx_dir).count() == 2

    b2 = spark.createDataFrame(
        [(3, "first " + base, "web"),      # dup of batch-1 doc 1
         (4, "third " + base, "web"),      # novel
         (5, "third " + base, "web")],     # within-batch dup of 4
        ["doc_id", "text", "source"])
    process(b2, 1)
    spark.catalog.refreshByPath(out_dir)
    spark.catalog.refreshByPath(idx_dir)
    out = spark.read.parquet(out_dir)
    assert out.count() == 3                # docs 1, 2, one of {4,5}
    ids = {r.doc_id for r in out.collect()}
    assert 3 not in ids
    assert len(ids & {4, 5}) == 1
    idx = spark.read.parquet(idx_dir)
    assert idx.count() == 3
    assert idx.distinct().count() == 3     # no duplicate index rows


def test_curation_ingest_loop_bloom_gated_parity(spark, tmp_path):
    """The Bloom-gated ingest loop emits EXACTLY the same corpus as
    the plain loop (zero false negatives -> identical suppression),
    while maintaining an append-only filter-artifact dir alongside
    the index (one summary per batch + nothing rewritten)."""
    from big_data_bowl___2023_spark.streaming import (
        make_curation_ingest_batch_fn,
    )

    base = ("a perfectly ordinary paragraph with enough distinct "
            "words to pass the quality gate and contribute value "
            "to the corpus in every measurable way today")
    batches = [
        [(1, "first " + base, "web"), (2, "second " + base, "web")],
        [(3, "first " + base, "web"),     # cross-batch dup of 1
         (4, "third " + base, "web")],    # novel
        [(5, "second " + base, "web"),    # cross-batch dup of 2
         (6, "third " + base, "web")],    # cross-batch dup of 4
    ]
    plain = make_curation_ingest_batch_fn(
        str(tmp_path / "p_docs"), str(tmp_path / "p_idx"),
        min_words=20)
    gated = make_curation_ingest_batch_fn(
        str(tmp_path / "g_docs"), str(tmp_path / "g_idx"),
        min_words=20, bloom_dir=str(tmp_path / "g_bloom"),
        bloom_expected_keys=1000, bloom_fpr=0.01)
    for i, rows in enumerate(batches):
        b = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        plain(b, i)
        gated(b, i)
    for d in ("p_docs", "g_docs", "p_idx", "g_idx", "g_bloom"):
        spark.catalog.refreshByPath(str(tmp_path / d))
    p_ids = {r.doc_id for r in
             spark.read.parquet(str(tmp_path / "p_docs")).collect()}
    g_ids = {r.doc_id for r in
             spark.read.parquet(str(tmp_path / "g_docs")).collect()}
    assert p_ids == g_ids == {1, 2, 4}
    # index parity too
    p_fp = {r.fingerprint for r in
            spark.read.parquet(str(tmp_path / "p_idx")).collect()}
    g_fp = {r.fingerprint for r in
            spark.read.parquet(str(tmp_path / "g_idx")).collect()}
    assert p_fp == g_fp and len(g_fp) == 3
    # the filter artifact covers every indexed fingerprint
    from big_data_bowl___2023_spark.dedup.bloom import might_contain
    bloom = spark.read.parquet(str(tmp_path / "g_bloom"))
    idx = spark.read.parquet(str(tmp_path / "g_idx"))
    import pyspark.sql.functions as F
    assert might_contain(idx, "fingerprint", bloom, "hit") \
        .filter(~F.col("hit")).count() == 0


def test_bloom_gate_bootstraps_from_existing_index(spark, tmp_path):
    """Turning the Bloom gate on over an index built WITHOUT one:
    the first gated batch scans the index once to build the filter,
    so cross-batch duplicates of the pre-gate era are still
    suppressed (the no-false-negative premise holds from batch 1 of
    the gated loop)."""
    from big_data_bowl___2023_spark.streaming import (
        make_curation_ingest_batch_fn,
    )

    base = ("a perfectly ordinary paragraph with enough distinct "
            "words to pass the quality gate and contribute value "
            "to the corpus in every measurable way today")
    out_dir = str(tmp_path / "docs")
    idx_dir = str(tmp_path / "index")
    bloom_dir = str(tmp_path / "bloom")
    pre = make_curation_ingest_batch_fn(out_dir, idx_dir,
                                        min_words=20)
    pre(spark.createDataFrame(
        [(1, "first " + base, "web")],
        ["doc_id", "text", "source"]), 0)
    assert not (tmp_path / "bloom").exists()

    gated = make_curation_ingest_batch_fn(
        out_dir, idx_dir, min_words=20, bloom_dir=bloom_dir,
        bloom_expected_keys=1000)
    gated(spark.createDataFrame(
        [(2, "first " + base, "web"),     # dup of pre-gate doc 1
         (3, "second " + base, "web")],   # novel
        ["doc_id", "text", "source"]), 1)
    spark.catalog.refreshByPath(out_dir)
    ids = {r.doc_id for r in
           spark.read.parquet(out_dir).collect()}
    assert ids == {1, 3}
    assert (tmp_path / "bloom").exists()


def test_bloom_dir_params_survive_index_read_failure(spark, tmp_path):
    """A transient index-read failure must NOT make the loop append
    summaries sized from the constructor args: once a bloom dir
    exists, its own parameters win. Simulated by deleting the index
    dir (the read fails exactly like a transient IO error) while
    running a loop constructed with DIFFERENT sizing."""
    import shutil

    from big_data_bowl___2023_spark.streaming import (
        make_curation_ingest_batch_fn,
    )

    base = ("a perfectly ordinary paragraph with enough distinct "
            "words to pass the quality gate and contribute value "
            "to the corpus in every measurable way today")
    out_dir = str(tmp_path / "docs")
    idx_dir = str(tmp_path / "index")
    bloom_dir = str(tmp_path / "bloom")
    gated = make_curation_ingest_batch_fn(
        out_dir, idx_dir, min_words=20, bloom_dir=bloom_dir,
        bloom_expected_keys=1000)
    gated(spark.createDataFrame(
        [(1, "first " + base, "web")],
        ["doc_id", "text", "source"]), 0)
    spark.catalog.refreshByPath(bloom_dir)
    params0 = spark.read.parquet(bloom_dir) \
        .select("num_bits", "num_hashes").distinct().collect()
    assert len(params0) == 1

    shutil.rmtree(idx_dir)            # the "transient" failure
    other = make_curation_ingest_batch_fn(
        out_dir, idx_dir, min_words=20, bloom_dir=bloom_dir,
        bloom_expected_keys=50_000)   # different sizing args
    other(spark.createDataFrame(
        [(2, "second " + base, "web")],
        ["doc_id", "text", "source"]), 1)
    spark.catalog.refreshByPath(bloom_dir)
    params1 = spark.read.parquet(bloom_dir) \
        .select("num_bits", "num_hashes").distinct().collect()
    assert params1 == params0         # dir params won; no mixing


def test_bloom_write_precedes_index_write(spark, tmp_path, monkeypatch):
    """Append order is load-bearing: the filter write lands BEFORE
    the index write, so a crash between the two leaves the filter
    AHEAD of the index (harmless: "maybe" rows still hit the exact
    join) rather than behind it (silent permanent duplicate
    admission). Simulated by injecting a failure into exactly the
    INDEX append (round 8: the old simulation corrupted the index
    dir on disk, which the now-strict history read correctly refuses
    up-front — before any append): the filter dir must already
    contain the failed batch's bits."""
    import numpy as np
    import pytest

    from big_data_bowl___2023_spark.dedup.bloom import bloom_bytes
    from big_data_bowl___2023_spark.streaming import (
        make_curation_ingest_batch_fn,
    )

    base = ("a perfectly ordinary paragraph with enough distinct "
            "words to pass the quality gate and contribute value "
            "to the corpus in every measurable way today")
    out_dir = str(tmp_path / "docs")
    idx_dir = str(tmp_path / "index")
    bloom_dir = str(tmp_path / "bloom")
    gated = make_curation_ingest_batch_fn(
        out_dir, idx_dir, min_words=20, bloom_dir=bloom_dir,
        bloom_expected_keys=1000)
    gated(spark.createDataFrame(
        [(1, "first " + base, "web")],
        ["doc_id", "text", "source"]), 0)
    spark.catalog.refreshByPath(bloom_dir)
    before, _ = bloom_bytes(spark.read.parquet(bloom_dir))
    bits_before = int(np.unpackbits(
        np.frombuffer(before, dtype=np.uint8)).sum())

    # crash exactly the INDEX append of batch 1 — the bloom append
    # (which lands first by design) must already be durable
    from pyspark.sql.readwriter import DataFrameWriter

    orig = DataFrameWriter.parquet

    def crash_index(self, path, *a, **kw):
        if idx_dir in str(path):
            raise RuntimeError("injected index-append crash")
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", crash_index)
    with pytest.raises(RuntimeError, match="injected index-append"):
        gated(spark.createDataFrame(
            [(2, "second " + base, "web")],
            ["doc_id", "text", "source"]), 1)
    monkeypatch.undo()

    # the filter is AHEAD: batch 1's fingerprint bits are already in
    # the dir (single-parameter, densifiable) despite the index crash
    spark.catalog.refreshByPath(bloom_dir)
    after, _ = bloom_bytes(spark.read.parquet(bloom_dir))
    bits_after = int(np.unpackbits(
        np.frombuffer(after, dtype=np.uint8)).sum())
    assert bits_after > bits_before


def test_transient_bloom_read_failure_raises_not_bootstraps(
        spark, tmp_path, monkeypatch):
    """Round-8 ADVICE #1: a transient read failure on an ESTABLISHED
    bloom dir must fail the batch (foreachBatch retries it), never be
    treated as dir-absent — that path appended constructor-parameter
    summaries into a dir built with different parameters, mixing the
    dir forever. Injects a runtime fault on exactly the bloom-dir
    read and asserts the batch raises, nothing was appended, and the
    dir still holds one parameter set."""
    import glob

    from pyspark.sql.readwriter import DataFrameReader

    from big_data_bowl___2023_spark.streaming import (
        make_curation_ingest_batch_fn,
    )

    base = ("a perfectly ordinary paragraph with enough distinct "
            "words to pass the quality gate and contribute value "
            "to the corpus in every measurable way today")
    out_dir = str(tmp_path / "docs")
    idx_dir = str(tmp_path / "index")
    bloom_dir = str(tmp_path / "bloom")
    gated = make_curation_ingest_batch_fn(
        out_dir, idx_dir, min_words=20, bloom_dir=bloom_dir,
        bloom_expected_keys=1000)
    gated(spark.createDataFrame(
        [(1, "first " + base, "web")],
        ["doc_id", "text", "source"]), 0)
    files_before = sorted(glob.glob(f"{bloom_dir}/*.parquet"))
    assert files_before

    orig = DataFrameReader.parquet

    def flaky(self, *paths, **kw):
        if any(bloom_dir in str(p) for p in paths):
            raise RuntimeError("injected transient storage failure")
        return orig(self, *paths, **kw)

    monkeypatch.setattr(DataFrameReader, "parquet", flaky)
    with pytest.raises(RuntimeError, match="injected transient"):
        gated(spark.createDataFrame(
            [(2, "second " + base, "web")],
            ["doc_id", "text", "source"]), 1)
    monkeypatch.undo()

    assert sorted(glob.glob(f"{bloom_dir}/*.parquet")) == files_before
    spark.catalog.refreshByPath(bloom_dir)
    params = spark.read.parquet(bloom_dir) \
        .select("num_bits", "num_hashes").distinct().collect()
    assert len(params) == 1           # no bootstrap append, no mix


def test_ingest_loop_audit_lineage(spark, tmp_path):
    """Verdict r11 #8 e2e: with ``audit_dir=`` the ingest loop emits
    per-doc first-dropping-stage lineage per micro-batch — gopher
    drops name their first failing rule, within-batch exact dups name
    the kept twin, cross-batch dups read ``history_duplicate``,
    contaminated docs read ``benchmark_contaminated``, survivors read
    ``kept`` — and a foreachBatch REPLAY overwrites its own batch=N
    subdir with identical lineage instead of duplicating it."""
    from big_data_bowl___2023_spark.streaming import (
        make_curation_ingest_batch_fn,
    )

    base = ("a perfectly ordinary paragraph with enough distinct "
            "words to pass the quality gate and contribute value "
            "to the corpus in every measurable way today")
    out_dir = str(tmp_path / "docs")
    idx_dir = str(tmp_path / "index")
    audit_dir = str(tmp_path / "audit")
    bench = spark.createDataFrame(
        [(100, "the secret benchmark passage lives here precisely")],
        ["bench_id", "text"])
    process = make_curation_ingest_batch_fn(
        out_dir, idx_dir, benchmark=bench, decontaminate_n=N,
        min_words=20, audit_dir=audit_dir)

    b0 = spark.createDataFrame(
        [(1, "first " + base, "web"),
         (2, "second " + base, "web"),
         (3, "too short", "web"),                     # gopher drop
         (4, "first " + base, "web"),                 # dup of 1
         (5, base + " the secret benchmark passage lives here "
          "precisely", "web")],                       # contaminated
        ["doc_id", "text", "source"])
    process(b0, 0)

    a0 = {r["doc_id"]: r for r in
          spark.read.parquet(f"{audit_dir}/batch=0").collect()}
    assert len(a0) == 5                 # every input doc accounted
    assert a0[1]["stage"] == "kept" and a0[2]["stage"] == "kept"
    assert a0[3]["stage"] == "after_gopher"
    assert a0[3]["reason"] == "pass_word_count"  # first failing rule
    assert a0[5]["reason"] == "benchmark_contaminated"
    # within-batch exact dup: one of {1,4} kept, the other names it
    dups = [d for d in (1, 4) if a0[d]["stage"] == "after_stream_dedup"]
    assert len(dups) == 1
    kept_twin = ({1, 4} - set(dups)).pop()
    assert a0[dups[0]]["reason"] == "exact_duplicate"
    assert a0[dups[0]]["detail"] == str(kept_twin)

    b1 = spark.createDataFrame(
        [(6, "second " + base, "web"),                # history dup
         (7, "third " + base, "web")],                # novel
        ["doc_id", "text", "source"])
    process(b1, 1)
    a1 = {r["doc_id"]: r for r in
          spark.read.parquet(f"{audit_dir}/batch=1").collect()}
    assert a1[6]["stage"] == "after_history_dedup"
    assert a1[6]["reason"] == "history_duplicate"
    assert a1[7]["stage"] == "kept"

    # the root reads as one partitioned history with batch a column
    spark.catalog.refreshByPath(audit_dir)
    root = spark.read.parquet(audit_dir)
    assert set(root.columns) >= {"doc_id", "stage", "reason",
                                 "detail", "batch"}
    assert root.count() == 7

    # REPLAY batch 1 (the foreachBatch crash-recovery contract):
    # batch=1 is OVERWRITTEN — never appended — so no doc ever gets
    # two lineage rows; content tracks durable state (the completed
    # first run indexed doc 7's fingerprint, so the replay reads it
    # history_duplicate — already served, same as the corpus append)
    process(b1, 1)
    spark.catalog.refreshByPath(audit_dir)
    replay = {r["doc_id"]: r for r in
              spark.read.parquet(f"{audit_dir}/batch=1").collect()}
    assert len(replay) == 2               # one row per doc, no dups
    assert replay[6]["reason"] == "history_duplicate"
    assert replay[7]["reason"] == "history_duplicate"
    assert spark.read.parquet(audit_dir).count() == 7
    spark.catalog.refreshByPath(out_dir)
    # corpus unchanged by the replay (no duplicate appends):
    # one of {1,4}, plus 2 and 7
    assert spark.read.parquet(out_dir).count() == 3


def test_stream_html_input_stage(spark, tmp_path):
    """html_input=True (r15): the extraction stage is stream-safe —
    a genuine rate-less file stream of crawl pages curates prose,
    and the ingest loop keeps only documents whose EXTRACTED text
    passes the gates; tag soup never reaches a fingerprint."""
    from big_data_bowl___2023_spark.streaming.curation import (
        make_curation_ingest_batch_fn,
    )
    prose = ("the quick brown fox jumps over the lazy dog and then "
             "keeps running through the open field with many more "
             "plain words to satisfy the gopher length gate easily. ") * 3
    pages = [
        (1, "<html><head><style>p{x}</style></head><body><p>"
            + prose.strip() + "</p></body></html>", "web"),
        # all-boilerplate page: extraction empties it → gopher drops
        (2, "<nav>Home | About</nav><script>var x = 1;</script>",
         "web"),
    ]
    docs = spark.createDataFrame(
        pages, "doc_id long, text string, source string")

    # batch-callable foreachBatch fn (the loop's documented contract)
    out_dir = str(tmp_path / "out")
    idx_dir = str(tmp_path / "idx")
    process = make_curation_ingest_batch_fn(out_dir, idx_dir,
                                            min_words=20,
                                            html_input=True)
    process(docs, 0)
    kept = spark.read.parquet(out_dir)
    rows = kept.collect()
    assert {r["doc_id"] for r in rows} == {1}
    assert "<" not in rows[0]["text"] and "{" not in rows[0]["text"]

    # genuine streaming leg: the composed gates run under
    # availableNow with the same verdict
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    stream = (spark.readStream.schema(docs.schema).parquet(src))
    got = run_available_now(
        curate_document_stream(stream, min_words=20,
                               html_input=True),
        spark, output_mode="append")
    srows = got.collect()
    assert {r["doc_id"] for r in srows} == {1}
    assert "<" not in srows[0]["text"]


def test_stream_lang_filter(spark):
    """lang_keep in the stream chain (r15): same gate, stream-safe;
    the batch-callable form and the batch operator agree."""
    en = ("the quick brown fox jumps over the lazy dog and the "
          "seven wizards brew strong coffee near the old stone "
          "bridge during a calm morning of wind and golden leaves")
    es = ("el rapido zorro marron salta sobre el perro perezoso "
          "mientras los siete magos preparan un cafe fuerte cerca "
          "del viejo puente de piedra durante una manana tranquila")
    docs = spark.createDataFrame(
        [(1, en, "a"), (2, es, "a")],
        "doc_id long, text string, source string")
    out = curate_document_stream(docs, min_words=5, lang_keep=["en"])
    assert {r["doc_id"] for r in out.collect()} == {1}


def test_stream_audit_reasons_use_extracted_text(spark, tmp_path):
    """Review r15, streaming face: the ingest-loop audit re-flags
    gopher drops against the post-extraction boundary when
    html_input ran."""
    from big_data_bowl___2023_spark.streaming.curation import (
        make_curation_ingest_batch_fn,
    )
    soup = ("<nav>" + " ".join(f"link{i}" for i in range(40))
            + "</nav><script>var x = 1;</script>")
    docs = spark.createDataFrame(
        [(1, soup, "web")], "doc_id long, text string, source string")
    out_dir = str(tmp_path / "out")
    idx_dir = str(tmp_path / "idx")
    audit_dir = str(tmp_path / "audit")
    process = make_curation_ingest_batch_fn(
        out_dir, idx_dir, min_words=20, html_input=True,
        audit_dir=audit_dir)
    process(docs, 0)
    audit = {r["doc_id"]: (r["stage"], r["reason"]) for r in
             spark.read.parquet(audit_dir).collect()}
    assert audit[1] == ("after_gopher", "pass_word_count")


def test_absent_path_probe_is_silent_and_trace_free(spark, tmp_path,
                                                    capfd):
    """Verdict r15 #6: probing a not-yet-existing fingerprint/bloom
    dir must not spray a JVM WARN stack (FileStreamSink.hasMetadata's
    80-line FileNotFoundException fragment led BENCH_r15's stderr
    tail). The bootstrap probe now answers absence with one
    Hadoop-FS exists() RPC before any read planning — so a sweep's
    stderr tail holds only ordinary log lines."""
    from big_data_bowl___2023_spark.streaming.curation import (
        _read_parquet_if_present,
    )
    capfd.readouterr()                         # drain prior output
    missing = str(tmp_path / "never_written_fps")
    assert _read_parquet_if_present(spark, missing) is None
    err = capfd.readouterr().err
    assert "FileNotFoundException" not in err
    assert "FileStreamSink" not in err
    assert "\tat " not in err                  # no stack frames at all
    # present-dir behavior unchanged: a real parquet dir still reads
    good = str(tmp_path / "present")
    spark.range(3).write.parquet(good)
    df = _read_parquet_if_present(spark, good)
    assert df is not None and df.count() == 3
    # and an existing-but-empty dir still reads as the bootstrap state
    empty = str(tmp_path / "empty_dir")
    (tmp_path / "empty_dir").mkdir()
    assert _read_parquet_if_present(spark, empty) is None
