"""Exact repeated-substring removal (dedup/substrings.py).

Contracts under test:
* spec identity — spans and scrubbed text equal a pure-python replay
  of the documented semantics (gram STRINGS, not hashes, so a hash
  collision would surface as a mismatch);
* keeper property — each duplicated run's globally-first copy
  survives byte-for-byte; every other copy is removed whole;
* below-threshold runs untouched; unaffected docs keep ORIGINAL
  text exactly (odd whitespace included);
* within-doc repeats keep the earliest occurrence;
* interval merge on overlapping/adjacent removal grams;
* scrub of a clean corpus is a no-op (same object, zero jobs wasted);
* plan shape — text never enters an exchange before the final
  rewrite join, and the rewrite broadcasts the span side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.dedup.substrings import (
    repeated_substring_spans,
    repeated_substring_stats,
    scrub_repeated_substrings,
)


# ---------------------------------------------------------------- oracle

def _oracle(rows: list[tuple[str, str]], L: int,
            max_occurrences: int = 1, keep: str = "first"):
    """Pure-python POINTWISE replay of the module spec on gram
    strings: removed positions = union of removal-gram coverage,
    minus (keep="first") the doc's own kept-canonical coverage.
    Returns (spans: {(doc, start, end)}, scrubbed: {doc: text})."""
    toks = {d: t.strip().split() for d, t in rows}
    occ: dict[tuple, list] = {}
    for d, t in toks.items():
        for p in range(len(t) - L + 1):
            occ.setdefault(tuple(t[p:p + L]), []).append((d, p + 1))
    removed: dict[str, set] = {d: set() for d in toks}
    protected: dict[str, set] = {d: set() for d in toks}
    for gram, where in occ.items():
        if len(where) <= max_occurrences:
            continue
        canon = min(where)
        for d, p in where:
            if keep == "first" and (d, p) == canon:
                protected[d].update(range(p, p + L))
            else:
                removed[d].update(range(p, p + L))
    spans = set()
    scrubbed = {}
    for d, t in toks.items():
        rm = removed[d] - (protected[d] if keep == "first" else set())
        i = None
        for p in sorted(rm) + [None]:
            if i is not None and (p is None or p > prev + 1):
                spans.add((d, i, prev + 1))
                i = None
            if p is not None and i is None:
                i = p
            prev = p
        kept = [tok for j, tok in enumerate(t, start=1)
                if j not in rm]
        scrubbed[d] = " ".join(kept) if rm else dict(rows)[d]
    return spans, scrubbed


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _spans_set(df):
    return {(r["doc_id"], r["tok_start"], r["tok_end"])
            for r in df.collect()}


def _texts(df):
    return {r["doc_id"]: r["text"] for r in df.collect()}


def _check(spark, rows, L, max_occurrences=1, keep="first"):
    docs = _docs(spark, rows)
    exp_spans, exp_text = _oracle(rows, L, max_occurrences, keep)
    got_spans = _spans_set(repeated_substring_spans(
        docs, L, max_occurrences, keep))
    assert got_spans == exp_spans
    got_text = _texts(scrub_repeated_substrings(
        docs, L, max_occurrences, keep))
    assert got_text == exp_text
    return got_spans, got_text


# ----------------------------------------------------------------- tests

SHARED = "the quick brown fox jumps over the lazy dog tonight"


def test_cross_doc_passage_matches_oracle(spark):
    rows = [
        ("a", f"alpha opening words {SHARED} alpha closing words"),
        ("b", f"beta starts here {SHARED} and beta ends here"),
        ("c", "gamma has entirely original content throughout it"),
    ]
    spans, text = _check(spark, rows, L=5)
    # keeper: doc a (globally first) keeps the passage verbatim
    assert SHARED in text["a"]
    assert SHARED not in text["b"]
    assert spans and all(d == "b" for d, _, _ in spans)
    # unaffected docs keep original text exactly
    assert text["c"] == rows[2][1]


def test_within_doc_repeat_keeps_earliest(spark):
    body = "x1 x2 x3 x4 x5"
    rows = [("solo", f"{body} middle filler words {body}")]
    spans, text = _check(spark, rows, L=5)
    assert text["solo"].startswith(body)
    assert text["solo"].count(body) == 1


def test_below_threshold_is_untouched(spark):
    rows = [
        ("a", "one two three four unique tail here"),
        ("b", "one two three four different ending words"),
    ]
    # shared run is 4 tokens < L=5: nothing to scrub
    docs = _docs(spark, rows)
    assert _spans_set(repeated_substring_spans(docs, 5)) == set()
    out = scrub_repeated_substrings(docs, 5)
    assert _texts(out) == dict(rows)
    _check(spark, rows, L=4)   # at L=4 the run IS scrubbed from b


def test_overlapping_runs_merge_intervals(spark):
    # b repeats a's passage twice back-to-back: removal grams overlap
    # and must merge into one-or-two clean intervals, never leave a
    # partial copy behind
    rows = [
        ("a", f"{SHARED} plus some original a text"),
        ("b", f"{SHARED} {SHARED} and b's own suffix"),
    ]
    spans, text = _check(spark, rows, L=5)
    assert SHARED not in text["b"]
    assert SHARED in text["a"]


def test_tie_and_whitespace_preservation(spark):
    rows = [
        ("z_unaffected", "  spaced\tout   original\n text kept  "),
        ("a", f"{SHARED} one"),
        ("b", f"{SHARED} two"),
    ]
    _, text = _check(spark, rows, L=5)
    # untouched doc keeps its exact original whitespace
    assert text["z_unaffected"] == rows[0][1]


def test_short_and_empty_docs_pass_through(spark):
    rows = [("e", ""), ("s", "two words"),
            ("a", f"{SHARED} x"), ("b", f"{SHARED} y")]
    _check(spark, rows, L=5)


def test_clean_corpus_is_noop_same_frame(spark):
    docs = _docs(spark, [("a", "all fresh words"),
                         ("b", "nothing shared at all")])
    out = scrub_repeated_substrings(docs, 3)
    assert out is docs          # zero-span fast path returns input


def test_partial_overlap_canonicals_survive_intact(spark):
    """The adversarial case for per-gram canonicals: runs that only
    PARTIALLY overlap across different document pairs pick canonicals
    in different docs, and without the kept-coverage subtraction one
    gram's removal would tear another gram's kept canonical. Every
    duplicated gram's canonical occurrence must survive intact."""
    rows = [("1", "b c d"), ("2", "a b c"), ("3", "a b")]
    docs = _docs(spark, rows)
    _, text = _check(spark, rows, L=2)
    # gram 'a b': canonical is doc 2 pos 1 → survives there
    assert text["2"].startswith("a b")
    # gram 'b c': canonical is doc 1 pos 1 → doc 1 untouched
    assert text["1"] == "b c d"
    # doc 3's copy of 'a b' is the non-canonical one → removed
    assert "a b" not in text["3"]
    # the general keeper property, checked from the gram table:
    # every duplicated gram's canonical occurrence is intact
    for d, s, e in _spans_set(repeated_substring_spans(docs, 2)):
        toks = dict(rows)[d].split()
        removed = set(range(s, e))
        # canonical coverage of this doc must be disjoint from spans
        exp_spans, _ = _oracle(rows, 2)
        assert (d, s, e) in exp_spans


def test_keep_none_removes_every_copy(spark):
    """Lee et al.'s released tool removes ALL copies: after one pass
    no originally-duplicated gram survives anywhere."""
    rows = [("1", "b c d"), ("2", "a b c"), ("3", "a b"),
            ("4", f"{SHARED} twice {SHARED}")]
    _, text = _check(spark, rows, L=2, keep="none")
    # none of the ORIGINAL duplicated grams may remain in any doc
    # (this fixture creates no colliding seam adjacencies, so the
    # check is strict)
    orig = {}
    for d, t in rows:
        toks = t.split()
        for p in range(len(toks) - 1):
            orig.setdefault(tuple(toks[p:p + 2]), []).append(d)
    dup_grams = {g for g, ds in orig.items() if len(ds) > 1}
    for t in text.values():
        toks = t.split()
        grams_here = {tuple(toks[p:p + 2])
                      for p in range(len(toks) - 1)}
        assert not (grams_here & dup_grams), (t, grams_here & dup_grams)


def test_keep_validation(spark):
    with pytest.raises(ValueError, match="keep must be"):
        repeated_substring_spans(
            _docs(spark, [("a", "x y z")]), 2, keep="all")


def test_stats_report_counts_and_first_locus(spark):
    rows = [("a", f"{SHARED}"), ("b", f"{SHARED}"), ("c", f"{SHARED}")]
    stats = repeated_substring_stats(_docs(spark, rows), 5)
    got = stats.collect()
    n_grams = len(SHARED.split()) - 5 + 1
    assert len(got) == n_grams
    assert all(r["n_occurrences"] == 3 and r["n_docs"] == 3
               and r["first_doc"] == "a" for r in got)


def test_min_tokens_validation(spark):
    with pytest.raises(ValueError, match="min_tokens"):
        repeated_substring_stats(_docs(spark, [("a", "x y")]), 1)


def test_rescrub_converges_on_fixture(spark):
    """One pass removes every originally-duplicated run here; the
    stats of the scrubbed corpus are empty (no seam duplicates in
    this fixture), so scrub∘scrub == scrub."""
    rows = [
        ("a", f"lead in {SHARED} tail a"),
        ("b", f"{SHARED} tail b"),
        ("c", f"other copy {SHARED}"),
    ]
    once = scrub_repeated_substrings(_docs(spark, rows), 5)
    assert repeated_substring_stats(once, 5).count() == 0


def test_plan_text_free_shuffles_and_broadcast_rewrite(spark):
    from big_data_bowl___2023_spark.plans.explain import (
        formatted_plan,
    )

    rows = [("a", f"{SHARED} one"), ("b", f"{SHARED} two")]
    docs = _docs(spark, rows)
    spans = repeated_substring_spans(docs, 5)
    plan = formatted_plan(spans)
    # the span pipeline's exchanges carry (hash, doc, pos) — the text
    # column must be pruned out before every shuffle
    for frag in plan.split("Exchange")[1:]:
        node = frag.split("\n\n")[0]    # this Exchange node only
        assert "text#" not in node, node
    out = scrub_repeated_substrings(docs, 5)
    assert "BroadcastHashJoin" in formatted_plan(out)


# --------------------------------------------- benchmark-overlap scrub

def _bench_oracle(train_rows, bench_rows, L):
    """Pointwise replay: remove every train position covered by an
    L-gram that appears anywhere in the benchmark."""
    bench_grams = set()
    for _, t in bench_rows:
        toks = t.strip().split()
        for p in range(len(toks) - L + 1):
            bench_grams.add(tuple(toks[p:p + L]))
    scrubbed, spans = {}, set()
    for d, t in train_rows:
        toks = t.strip().split()
        rm = set()
        for p in range(len(toks) - L + 1):
            if tuple(toks[p:p + L]) in bench_grams:
                rm.update(range(p + 1, p + 1 + L))
        i = None
        for p in sorted(rm) + [None]:
            if i is not None and (p is None or p > prev + 1):
                spans.add((d, i, prev + 1))
                i = None
            if p is not None and i is None:
                i = p
            prev = p
        kept = [tok for j, tok in enumerate(toks, start=1)
                if j not in rm]
        scrubbed[d] = " ".join(kept) if rm else t
    return spans, scrubbed


def test_benchmark_scrub_matches_oracle(spark):
    from big_data_bowl___2023_spark.dedup.substrings import (
        benchmark_overlap_spans,
        scrub_benchmark_overlap,
    )

    bench_rows = [("q1", f"{SHARED}"),
                  ("q2", "what is the capital of freedonia tell me")]
    train_rows = [
        ("t1", f"intro text {SHARED} outro text words here"),
        ("t2", "clean document with no leaked content at all"),
        ("t3", f"{SHARED}"),                       # fully leaked
        ("t4", "someone asked what is the capital of freedonia "
               "tell me and the answer follows"),
    ]
    train = _docs(spark, train_rows)
    bench = _docs(spark, bench_rows)
    exp_spans, exp_text = _bench_oracle(train_rows, bench_rows, 5)
    got_spans = _spans_set(benchmark_overlap_spans(train, bench, 5))
    assert got_spans == exp_spans
    got_text = _texts(scrub_benchmark_overlap(train, bench, 5))
    assert got_text == exp_text
    # semantics spot checks: surgical cut, not doc drop
    assert got_text["t1"] == "intro text outro text words here"
    assert got_text["t2"] == train_rows[1][1]       # byte-identical
    assert got_text["t3"] == ""                     # fully leaked
    assert SHARED not in got_text["t1"]
    # no original benchmark gram survives anywhere in train
    bench_grams = {tuple(SHARED.split()[p:p + 5])
                   for p in range(len(SHARED.split()) - 4)}
    for t in got_text.values():
        toks = t.split()
        assert not ({tuple(toks[p:p + 5])
                     for p in range(len(toks) - 4)} & bench_grams)


def test_benchmark_scrub_broadcasts_small_bench(spark):
    from big_data_bowl___2023_spark.dedup.substrings import (
        scrub_benchmark_overlap,
    )
    from big_data_bowl___2023_spark.plans.explain import (
        formatted_plan,
    )

    train = _docs(spark, [("t", f"{SHARED} tail")])
    bench = _docs(spark, [("q", SHARED)])
    out = scrub_benchmark_overlap(train, bench, 5)
    assert "BroadcastHashJoin" in formatted_plan(out)


def test_scrub_to_fixpoint_drains_seam_duplicates(spark):
    """Removing a span joins its neighbors into a NEW adjacency;
    construct one that duplicates an existing gram so a second round
    is genuinely needed, then assert the loop drains it."""
    from big_data_bowl___2023_spark.dedup.substrings import (
        scrub_to_fixpoint,
    )

    # round 1: SHARED is duplicated between x and z → removed from x
    # (z is canonical by id order: 'a...' < 'x'), creating the seam
    # "u v" in x — which duplicates doc y's gram → round 2 removes it
    rows = [
        ("a_canon", SHARED),
        ("x", f"u {SHARED} v tail"),
        ("y", "u v w"),
    ]
    docs = _docs(spark, rows)
    once = scrub_repeated_substrings(docs, 5)
    assert repeated_substring_stats(once, 2).count() > 0  # seam dup
    out, rounds = scrub_to_fixpoint(docs, 2, max_rounds=5)
    assert rounds >= 2
    assert repeated_substring_stats(out, 2).count() == 0
    with pytest.raises(ValueError, match="max_rounds"):
        scrub_to_fixpoint(docs, 2, max_rounds=0)
