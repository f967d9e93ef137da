"""E45 — end-to-end curation export: stage counts monotone and
consistent, planted artifacts (duplicate, near-duplicate, PII,
benchmark leak, junk doc) each handled by their stage, shards respect
the packing contract, and the JSONL output round-trips."""

from __future__ import annotations

import pytest

import tempfile

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.pipelines.curation import (
    curate_and_export,
    curation_report,
)
from big_data_bowl___2023_spark.sources.io import load_table

pytestmark = pytest.mark.slow

BASE = ("the quick brown fox jumps over the lazy dog and then runs "
        "far away into the quiet green forest before the cold night "
        "falls while other animals watch from their warm burrows and "
        "wonder where the fox is going tonight with such great haste")


def _fixture(spark):
    near_dup = BASE.replace("lazy", "sleepy")  # high-Jaccard variant
    rows = [
        (1, BASE, "web"),
        (2, BASE, "web"),                       # exact duplicate of 1
        (3, near_dup, "web"),                   # near-duplicate of 1
        (4, ("an entirely separate report on warehouse inventory "
             "levels and quarterly shipping delays across regions "
             "with contact me a@b.io now appended for support ") * 2,
         "mail"),                               # PII, unrelated text
        (5, "junk " * 3, "web"),                # fails word count
        (6, ("completely different text about spark shuffle planning "
             * 8), "docs"),
        (7, ("the secret benchmark passage lives here precisely "
             "unchanged word for word in this document ") * 3, "web"),
    ]
    bench = spark.createDataFrame(
        [(100, "the secret benchmark passage lives here precisely "
               "unchanged word for word")],
        ["bench_id", "text"])
    return spark.createDataFrame(rows, ["doc_id", "text", "source"]), bench


def test_pipeline_end_to_end(spark):
    docs, bench = _fixture(spark)
    with tempfile.TemporaryDirectory() as tmp:
        stats = curate_and_export(docs, f"{tmp}/shards",
                                  benchmark=bench, seq_len=16,
                                  shard_budget=64, min_words=40)
        assert stats["input"] == 7
        assert stats["after_quality"] == 6          # 5 dropped
        assert stats["after_exact_dedup"] == 5      # 2 dropped
        assert stats["after_near_dedup"] == 4       # 3 clustered away
        assert stats["after_decontamination"] == 3  # 7 dropped
        assert stats["chunks"] >= 3 and stats["shards"] >= 1

        out = spark.read.json(f"{tmp}/shards")
        kept_docs = {int(r.doc_id) for r in
                     out.select("doc_id").distinct().collect()}
        # cluster {1,3} keeps the LONGER variant (doc 3)
        assert kept_docs == {3, 4, 6}
        # PII scrubbed before chunking
        assert out.filter(F.col("seq_text").contains("a@b.io")).count() == 0
        assert out.filter(F.col("seq_text").contains("[PII-email]")
                          ).count() > 0
        # boundary-packing contract: every chunk fits the window
        assert out.agg(F.max("n_tokens")).collect()[0][0] <= 16


def test_curation_report(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rep = {r.source: r for r in curation_report(docs).collect()}
    assert len(rep) == docs.select("source").distinct().count()
    for r in rep.values():
        assert r.n_docs > 0 and r.n_tokens > 0
        assert 0.0 <= r.gopher_pass_rate <= 1.0


def test_optional_overlap_and_dsir_stages(spark):
    """Opt-in stages: a doc sharing a long verbatim passage (but low
    overall Jaccard) survives MinHash yet is caught by the winnowing
    overlap stage; DSIR then keeps the docs closest to the target
    domain."""
    passage = ("this exact boilerplate disclaimer paragraph appears "
               "verbatim across otherwise unrelated documents today")
    rows = [
        (1, BASE + " " + passage, "web"),
        # shares ONLY the passage with 1 — Jaccard far below 0.3
        (2, passage + " meanwhile the warehouse report discusses "
            "entirely different operational matters and staffing "
            "levels through winter months with many extra words "
            "about logistics budgets and planning cycles ahead", "web"),
        (3, ("completely different text about spark shuffle planning "
             "and adaptive execution strategies in modern engines "
             * 4), "docs"),
        (4, ("the quarterly financial summary lists revenue cost "
             "margin and outlook figures for every region in detail "
             * 4), "mail"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    target = spark.createDataFrame(
        [(900, "spark shuffle planning adaptive execution engines")],
        ["doc_id", "text"])
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        stats = curate_and_export(
            docs, f"{tmp}/shards", seq_len=16, shard_budget=64,
            min_words=20, overlap_shared=2,
            dsir_target=target, dsir_n_docs=2)
    # MinHash kept all 4 (no high-Jaccard pair); overlap stage merged
    # the passage-sharing pair 1/2 down to its longer member
    assert stats["after_near_dedup"] == 4
    assert stats["after_overlap_dedup"] == 3
    assert stats["after_dsir_selection"] == 2


def test_lazy_stats_same_output_no_counts(spark):
    """lazy_stats=True must write identical shards while returning no
    per-stage counts — the single-action 100 TB mode."""
    docs, bench = _fixture(spark)
    with tempfile.TemporaryDirectory() as tmp:
        stats = curate_and_export(docs, f"{tmp}/lazy", benchmark=bench,
                                  seq_len=16, shard_budget=64,
                                  min_words=40, lazy_stats=True)
        assert stats == {}, "lazy mode must run zero count jobs"
        out = spark.read.json(f"{tmp}/lazy")
        kept_docs = {int(r.doc_id) for r in
                     out.select("doc_id").distinct().collect()}
        assert kept_docs == {3, 4, 6}


def test_optional_line_dedup_stage(spark):
    """Planted cross-document boilerplate line is scrubbed (first
    occurrence kept) when the opt-in stage is enabled."""
    footer = ("subscribe to our newsletter for updates and special "
              "offers every single week")
    base = [
        (1, "alpha original content with plenty of words to say\n"
            + footer, "web"),
        (2, "beta writes an entirely different body of text here\n"
            + footer, "web"),
    ]
    docs = spark.createDataFrame(base, ["doc_id", "text", "source"])
    with tempfile.TemporaryDirectory() as tmp:
        stats = curate_and_export(docs, f"{tmp}/shards", seq_len=16,
                                  shard_budget=64, min_words=5,
                                  line_dedup_min_chars=30)
        assert stats["after_line_dedup"] == 2
        out = spark.read.json(f"{tmp}/shards")
        joined = (out.orderBy("doc_id", "seq_idx")
                  .groupBy("doc_id")
                  .agg(F.concat_ws(" ", F.collect_list("seq_text"))
                       .alias("t")).collect())
        texts = {int(r.doc_id): r.t for r in joined}
        assert "newsletter" in texts[1]      # first occurrence kept
        assert "newsletter" not in texts[2]  # repeat scrubbed


def test_optional_model_quality_stage(spark):
    """A classifier trained on clean-vs-spam weak labels gates the
    pipeline when passed in; the spam doc is dropped by the model
    stage (it passes the mechanical Gopher gate)."""
    from big_data_bowl___2023_spark.functions.quality_model import (
        train_quality_classifier,
        weak_labels_from_source,
    )

    clean = ("careful analysis of the experimental results shows the "
             "method improves accuracy across every evaluated "
             "benchmark while requiring substantially less compute")
    spam = ("click here buy now free offer winner prize claim "
            "instantly guaranteed ") * 4
    train = spark.createDataFrame(
        [(i, clean + f" v{i}", "docs") for i in range(10)]
        + [(50 + i, spam + f" s{i}", "web") for i in range(10)],
        ["doc_id", "text", "source"])
    model = train_quality_classifier(
        weak_labels_from_source(train, ("docs",)))

    docs = spark.createDataFrame(
        [(1, clean + " held out content", "docs"),
         (2, spam + " held out spam", "web")],
        ["doc_id", "text", "source"])
    with tempfile.TemporaryDirectory() as tmp:
        stats = curate_and_export(docs, f"{tmp}/shards", seq_len=16,
                                  shard_budget=64, min_words=5,
                                  quality_model=model)
        assert stats["after_quality"] == 2          # Gopher passes both
        assert stats["after_model_quality"] == 1    # model drops spam
        out = spark.read.json(f"{tmp}/shards")
        assert {int(r.doc_id) for r in
                out.select("doc_id").distinct().collect()} == {1}


def test_optional_source_cap_stage(spark):
    """max_docs_per_source bounds every source's survivors."""
    def body(tag: str) -> str:
        # mostly unique tokens per doc so near-dup stages keep all
        return " ".join(f"{tag}tok{j}" for j in range(12))

    rows = [(i, body(f"w{i}"), "web") for i in range(8)]
    rows += [(100 + i, body(f"m{i}"), "mail") for i in range(2)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    with tempfile.TemporaryDirectory() as tmp:
        stats = curate_and_export(docs, f"{tmp}/shards", seq_len=16,
                                  shard_budget=64, min_words=5,
                                  max_docs_per_source=3)
        assert stats["after_source_cap"] == 5      # min(3,8)+min(3,2)
        out = spark.read.json(f"{tmp}/shards")
        per_src = {r.source: r["count"] for r in
                   out.select("source", "doc_id").distinct()
                      .groupBy("source").count().collect()}
        assert per_src["web"] == 3 and per_src["mail"] == 2


def test_curation_sequences_manifest(spark):
    """Trainer-output mode: same gates (planted artifacts all
    removed), manifest covers every surviving token exactly once and
    matches assemble_sequences applied to the curated set."""
    from big_data_bowl___2023_spark.functions import text as Tx
    from big_data_bowl___2023_spark.operators.chunking import (
        assemble_sequences,
        sequence_manifest,
    )
    from big_data_bowl___2023_spark.pipelines.curation import (
        curation_frame,
        curation_sequences,
    )

    docs, bench = _fixture(spark)
    seq_len = 32
    man = curation_sequences(docs, seq_len=seq_len, sep_tokens=1,
                             benchmark=bench, min_words=20).collect()

    # survivors per the document-grain chain (captured independently)
    captured = {}
    curation_frame(docs, benchmark=bench, min_words=20,
                   stage_hook=lambda k, f: captured.__setitem__(k, f))
    canon = captured["after_decontamination"]
    surv = {r.doc_id for r in canon.select("doc_id").collect()}
    # gates held: junk (5), exact dup (one of 1/2), near-dup (3),
    # leak (7) are gone
    assert 5 not in surv and 7 not in surv
    assert len(surv & {1, 2, 3}) == 1

    # every surviving token appears exactly once across the manifest
    tok = {r.doc_id: r.n for r in
           canon.select("doc_id", Tx.token_count(F.col("text"))
                        .alias("n")).collect()}
    from collections import defaultdict
    per_doc = defaultdict(int)
    for r in man:
        assert r.n_tokens <= seq_len
        for s in r.spans:
            per_doc[s.doc_id] += s.span_len
    assert dict(per_doc) == tok

    # wiring identity: equals assemble_sequences over the curated set
    direct = sequence_manifest(
        assemble_sequences(canon, seq_len, 1, group_cols=("source",)),
        group_cols=("source",)).collect()
    key = lambda r: (r.source, r.seq_id)
    assert (sorted([(key(r), r.n_docs, r.n_tokens) for r in man])
            == sorted([(key(r), r.n_docs, r.n_tokens) for r in direct]))


def test_curation_sequences_with_pinning_hook(spark):
    """Review r11: a user stage_hook exercising the DataFrame-
    replacement protocol (the pin-injection curation_audit uses)
    must leave curation_sequences' manifest identical — the capture
    must record the hook's REPLACEMENT frame, not the stale
    pre-replacement one, or the manifest re-evaluates the unpinned
    chain."""
    from big_data_bowl___2023_spark.pipelines.curation import (
        curation_sequences,
    )
    from big_data_bowl___2023_spark.session import pin

    docs, bench = _fixture(spark)
    plain = sorted(
        tuple(r) for r in curation_sequences(
            docs, seq_len=32, sep_tokens=1, benchmark=bench,
            min_words=20).collect())

    pinned_frames = []

    def pinning_hook(key, frame):
        p = pin(frame)
        pinned_frames.append(p)
        return p

    got = sorted(
        tuple(r) for r in curation_sequences(
            docs, seq_len=32, sep_tokens=1, benchmark=bench,
            min_words=20, stage_hook=pinning_hook).collect())
    assert pinned_frames                      # the hook really ran
    assert got == plain
