"""Per-document curation drop lineage (E116,
pipelines/curation.py::curation_audit): every input doc gets the
FIRST stage that dropped it plus a debuggable reason, survivors get
stage='kept', and the audit reconciles exactly with the per-stage
counts curate_and_export already emits."""

from __future__ import annotations

import pytest

from big_data_bowl___2023_spark.pipelines.curation import (
    curation_audit,
    curation_frame,
)


def _mk_docs(spark):
    base = ("the quick brown fox jumps over the lazy dog while "
            "seven wizards brew strong coffee near the old stone "
            "bridge during a calm autumn morning with gentle wind "
            "and falling golden leaves everywhere around town")
    rows = [
        (1, "a", base),                                # kept
        (2, "a", "too short"),                         # gopher words
        (3, "a", base),                                # exact dup of 1
        (4, "a", " ".join(base.split()[:-3])),         # near dup of 1
        (5, "a", "completely different benchmark sentence about "
                 "ancient maritime navigation charts and celestial "
                 "measurements used by early explorers crossing "
                 "vast unknown oceans guided only by stars and "
                 "seasonal winds toward distant legendary shores "
                 "filled with spices silver and untold stories"),
        (6, "b", "mountain villages celebrate the harvest festival "
                 "with music dancing painted lanterns and long "
                 "tables of warm bread honey roasted vegetables "
                 "shared between neighbors until the late evening "
                 "fires burn low across quiet terraced fields"),
        (7, "b", "engineers tested the new irrigation channel over "
                 "several weeks measuring flow pressure sediment "
                 "and seasonal variation before approving wider "
                 "deployment across the southern farming district "
                 "where drought had limited planting for years"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string")


@pytest.fixture(scope="module")
def audit_world(spark):
    docs = _mk_docs(spark)
    benchmark = (docs.filter("doc_id = 5")
                 .selectExpr("doc_id as bench_id", "text"))
    kwargs = dict(benchmark=benchmark, min_words=5,
                  jaccard_threshold=0.3, max_docs_per_source=1,
                  seq_len=16, shard_budget=64)
    audit = {r["doc_id"]: (r["stage"], r["reason"], r["detail"])
             for r in curation_audit(docs, **kwargs).collect()}
    counts: dict = {}

    def tally(key, frame):
        counts[key] = frame.count()
        return counts[key]

    curation_frame(docs, stage_hook=tally, **kwargs)
    return docs, audit, counts


def test_every_doc_gets_exactly_one_verdict(spark, audit_world):
    docs, audit, _ = audit_world
    assert sorted(audit) == [1, 2, 3, 4, 5, 6, 7]


def test_stages_and_reasons(spark, audit_world):
    _, audit, _ = audit_world
    assert audit[1] == ("kept", "kept", None)
    # gopher gate names the first failing rule
    assert audit[2] == ("after_quality", "pass_word_count", None)
    # exact duplicate names its kept twin
    assert audit[3] == ("after_exact_dedup", "exact_duplicate", "1")
    assert audit[4][:2] == ("after_near_dedup", "near_duplicate")
    assert audit[5][:2] == ("after_decontamination",
                            "benchmark_contaminated")
    # source b has two survivors and quota 1: exactly one kept,
    # one source_quota
    b = sorted([audit[6], audit[7]])
    assert [x[0] for x in b] == sorted(["kept", "after_source_cap"])


def test_audit_reconciles_with_stage_counts(spark, audit_world):
    """The audit's per-stage drop counts must equal the deltas of the
    counts curate_and_export emits — same chain, two views."""
    _, audit, counts = audit_world
    drops: dict = {}
    for stage, _, _ in audit.values():
        drops[stage] = drops.get(stage, 0) + 1
    order = ["input", "after_quality", "after_exact_dedup",
             "after_near_dedup", "after_decontamination",
             "after_source_cap"]
    for prev, cur in zip(order, order[1:]):
        assert drops.get(cur, 0) == counts[prev] - counts[cur], cur
    assert drops.get("kept", 0) == counts["after_source_cap"]


def test_audit_ids_only_no_text_in_wide_joins(spark, audit_world):
    """Schema contract: (doc_id, source, stage, reason, detail)."""
    docs, _, _ = audit_world
    benchmark = (docs.filter("doc_id = 5")
                 .selectExpr("doc_id as bench_id", "text"))
    out = curation_audit(docs, benchmark=benchmark, min_words=5,
                         seq_len=16, shard_budget=64)
    assert [f.name for f in out.schema] == [
        "doc_id", "source", "stage", "reason", "detail"]


def test_line_scrub_emptied_docs_attributed_to_the_scrub(spark):
    """Review r10 finding: remove_repeated_lines EMPTIES
    fully-boilerplate docs instead of dropping them, and the husks
    died later at exact dedup under the wrong label. The audit must
    attribute them to the scrub — all of them, including the min-id
    husk the old anti-join logic reported 'kept'."""
    boiler = "this exact boilerplate line repeats in every document"
    rows = [(i, "a", boiler) for i in range(1, 5)]       # all-boiler
    rows.append((9, "a", boiler + "\n" + " ".join(
        f"unique{j} real content words here" for j in range(12))))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    audit = {r["doc_id"]: (r["stage"], r["reason"])
             for r in curation_audit(docs, min_words=5,
                                     line_dedup_min_chars=10,
                                     seq_len=16,
                                     shard_budget=64).collect()}
    # keep='first': doc 1 retains the globally-first occurrence of
    # the line and stays a real document; docs 2-4 are emptied
    assert audit[1][0] == "kept"
    for i in range(2, 5):
        assert audit[i] == ("after_line_dedup",
                            "emptied_by_line_scrub"), audit[i]
    assert audit[9][0] == "kept"


def test_exact_dup_detail_never_names_a_dropped_doc(spark):
    """Review r10 finding: when the pipeline dedups on REWRITTEN
    (redacted) text, the raw-fingerprint twin can itself be dropped.
    The audit's detail joins against the stage's SURVIVORS only —
    a rewrite-created collision yields NULL, never a phantom id."""
    base = " ".join(f"word{j} steady filler content" for j in range(12))
    rows = [
        (2, "a", base + " call 555-123-9999 now"),       # redacts ==
        (5, "a", base + " call 555-777-1234 now"),       # redacts ==
        (7, "a", base + " call 555-777-1234 now"),       # raw == 5
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    audit = {r["doc_id"]: (r["stage"], r["reason"], r["detail"])
             for r in curation_audit(docs, min_words=5, seq_len=16,
                                     shard_budget=64).collect()}
    assert audit[2][0] == "kept"         # min id per redacted group
    assert audit[5][:2] == ("after_exact_dedup", "exact_duplicate")
    assert audit[7][:2] == ("after_exact_dedup", "exact_duplicate")
    # doc 5's raw twin among SURVIVORS does not exist (its raw group
    # {5,7} was wholly dropped; the kept doc 2 differs raw) → NULL;
    # same for 7 — never the phantom '5'
    assert audit[5][2] is None and audit[7][2] is None


def test_lang_filter_stage_and_attribution(spark):
    """lang_keep (r15): off-language docs drop BEFORE the quality
    gate (the CCNet order) and the audit attributes them
    wrong_language; on-language docs flow through unchanged."""
    en = ("the quick brown fox jumps over the lazy dog and the "
          "seven wizards brew strong coffee near the old stone "
          "bridge during a calm morning of wind and golden leaves "
          "falling everywhere around the little town square")
    es = ("el rapido zorro marron salta sobre el perro perezoso "
          "mientras los siete magos preparan un cafe fuerte cerca "
          "del viejo puente de piedra durante una manana tranquila "
          "con viento suave que mueve las hojas doradas del pueblo")
    docs = spark.createDataFrame(
        [(1, "a", en), (2, "a", es)],
        "doc_id long, source string, text string")
    kwargs = dict(min_words=5, seq_len=16, shard_budget=64,
                  lang_keep=["en"])
    audit = {r["doc_id"]: (r["stage"], r["reason"])
             for r in curation_audit(docs, **kwargs).collect()}
    assert audit[1] == ("kept", "kept")
    assert audit[2] == ("after_lang_filter", "wrong_language")
    out = curation_frame(docs, **kwargs)
    assert {r["doc_id"] for r in out.collect()} == {1}
    # without the gate both survive — the stage is genuinely opt-in
    both = curation_frame(docs, min_words=5, seq_len=16,
                          shard_budget=64)
    assert {r["doc_id"] for r in both.collect()} == {1, 2}
