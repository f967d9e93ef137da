"""BPE tokenizer training + apply (functions/bpe.py).

Oracles: the classic Sennrich worked example hand-derived under the
</w> convention, a naive full-recount trainer re-implemented in the
test (the incremental pair-index trainer must match it exactly on
real corpus types), a rank-order replay encoder (greedy apply must
reproduce it), and pure-python word counting for the corpus scan.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.functions import bpe
from big_data_bowl___2023_spark.plans.explain import plan_report

SF = "/root/testdata/sf0.001"


def _docs(spark, n=80):
    return (spark.read.parquet(f"{SF}/documents.parquet")
                 .orderBy("doc_id").limit(n).cache())


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower().strip())


def _py_word_counts(rows) -> dict[str, int]:
    counts: dict[str, int] = {}
    for t in rows:
        for w in _norm(t).split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    return counts


def _naive_train(types, num_merges, min_pair_count=2):
    """Full-recount reference trainer: recompute every pair count
    from scratch each round. O(rounds * corpus-types) — the spec the
    incremental trainer must match."""
    words = {i: tuple(w) + (bpe.END,) for i, (w, _) in enumerate(types)}
    freqs = {i: n for i, (_, n) in enumerate(types)}
    merges = []
    for rank in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for i, w in words.items():
            for p in zip(w, w[1:]):
                counts[p] = counts.get(p, 0) + freqs[i]
        if not counts:
            break
        (left, right), cnt = min(counts.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((rank, left, right, left + right))
        words = {i: bpe._merge_word(w, left, right)
                 for i, w in words.items()}
    return merges


def _replay_encode(word, merges):
    """Rank-order replay: apply each learned merge in sequence."""
    sym = tuple(word) + (bpe.END,)
    for _, left, right, _m in merges:
        sym = bpe._merge_word(sym, left, right)
    return list(sym)


def test_sennrich_fixture_first_merges():
    types = [("newest", 6), ("low", 5), ("widest", 3), ("lower", 2)]
    merges = bpe._train_merges(types, num_merges=5, min_pair_count=2)
    assert [(m[1], m[2]) for m in merges] == [
        ("e", "s"), ("es", "t"), ("est", bpe.END), ("l", "o"),
        ("lo", "w")]
    assert [m[3] for m in merges] == [
        "es", "est", "est" + bpe.END, "lo", "low"]


def test_incremental_trainer_matches_naive_recount(spark):
    docs = _docs(spark)
    wf = bpe.word_frequencies(docs)
    types = [(r["word"], int(r["n"]))
             for r in wf.orderBy(F.desc("n"), F.asc("word"))
                        .limit(300).collect()]
    got = bpe._train_merges(types, num_merges=60, min_pair_count=2)
    want = _naive_train(types, num_merges=60, min_pair_count=2)
    assert got == want
    assert len(got) == 60  # real text has ≥60 viable merges


def test_word_frequencies_matches_python(spark):
    docs = _docs(spark)
    texts = [r["text"] for r in docs.select("text").collect()
             if r["text"] is not None]
    want = _py_word_counts(texts)
    got = {r["word"]: int(r["n"])
           for r in bpe.word_frequencies(docs).collect()}
    assert got == want


def test_train_determinism_under_repartition(spark):
    docs = _docs(spark)
    wf = bpe.word_frequencies(docs)
    a = bpe.train_bpe(wf, num_merges=40).collect()
    b = bpe.train_bpe(wf.repartition(13), num_merges=40).collect()
    key = lambda r: r["rank"]
    assert sorted(a, key=key) == sorted(b, key=key)


def test_greedy_encode_equals_rank_order_replay(spark):
    docs = _docs(spark)
    merges_df = bpe.bpe_merges_from_corpus(docs, num_merges=80)
    merges = sorted(
        ((int(r["rank"]), r["left"], r["right"], r["merged"])
         for r in merges_df.collect()))
    ranks = {(m[1], m[2]): m[0] for m in merges}
    words = [r["word"] for r in
             bpe.word_frequencies(docs).collect()]
    for w in words:
        assert bpe._encode_word(w, ranks) == _replay_encode(w, merges), w


def test_apply_roundtrip_decodes_to_normalized_text(spark):
    docs = _docs(spark)
    merges = bpe.bpe_merges_from_corpus(docs, num_merges=120)
    out = (bpe.apply_bpe(docs, merges)
           .select("text", bpe.bpe_decode(F.col("bpe_tokens"))
                   .alias("decoded"))
           .collect())
    assert out
    for r in out:
        assert r["decoded"] == _norm(r["text"])


def test_apply_matches_python_encode(spark):
    docs = _docs(spark, n=40)
    merges_df = bpe.bpe_merges_from_corpus(docs, num_merges=60)
    ranks = {(r["left"], r["right"]): int(r["rank"])
             for r in merges_df.collect()}
    rows = (bpe.apply_bpe(docs, merges_df)
            .select("text", "bpe_tokens").collect())
    for r in rows:
        want = []
        for w in _norm(r["text"]).split(" "):
            if w:
                want.extend(bpe._encode_word(w, ranks))
        assert list(r["bpe_tokens"]) == want


def test_unseen_characters_fall_through_as_chars(spark):
    df = spark.createDataFrame(
        [("a", "abab abab"), ("b", "qzx")], ["doc_id", "text"])
    train = df.filter(F.col("doc_id") == "a")
    merges = bpe.bpe_merges_from_corpus(train, num_merges=10)
    got = {r["doc_id"]: list(r["bpe_tokens"])
           for r in bpe.apply_bpe(df, merges).collect()}
    # trained word fully merges; novel chars stay single symbols
    assert got["a"] == ["abab" + bpe.END] * 2
    assert got["b"] == ["q", "z", "x", bpe.END]


def test_roundtrip_survives_literal_end_marker_text(spark):
    """The end-of-word marker is a SPACE — impossible inside a
    normalized word — so text containing the classic '</w>' marker
    literally still round-trips exactly."""
    df = spark.createDataFrame(
        [("a", "a</w>b c</w> </w>d"), ("b", "plain words here")],
        ["doc_id", "text"])
    merges = bpe.bpe_merges_from_corpus(df, num_merges=30,
                                        min_pair_count=1)
    got = {r["doc_id"]: r["decoded"] for r in
           bpe.apply_bpe(df, merges)
              .select("doc_id", bpe.bpe_decode(F.col("bpe_tokens"))
                      .alias("decoded")).collect()}
    assert got["a"] == "a</w>b c</w> </w>d"
    assert got["b"] == "plain words here"


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", ""), ("c", "   ")],
        ["doc_id", "text"])
    merges = bpe.train_bpe(
        bpe.word_frequencies(
            df.sparkSession.createDataFrame([("x", "aa aa")],
                                            ["doc_id", "text"])),
        num_merges=3)
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe.apply_bpe(df, merges).collect()}
    assert got["a"] is None
    assert list(got["b"]) == []
    assert list(got["c"]) == []


def test_max_types_cap_limits_training_table(spark):
    df = spark.createDataFrame(
        [("1", "zz zz zz qq qq rr")], ["doc_id", "text"])
    wf = bpe.word_frequencies(df)
    merges = bpe.train_bpe(wf, num_merges=10, max_types=1)
    # only "zz" (top type) trains: every learned symbol is built from
    # z and the end marker; the dropped types never contribute
    rows = merges.collect()
    assert rows
    for r in rows:
        assert set(r["left"] + r["right"]) <= set("z" + bpe.END)


def test_min_pair_count_stops_training():
    types = [("ab", 1), ("cd", 1)]  # every pair occurs once
    assert bpe._train_merges(types, 10, min_pair_count=2) == []


def test_apply_is_map_side_only(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = bpe.bpe_merges_from_corpus(_docs(spark), num_merges=20)
    rep = plan_report(bpe.apply_bpe(docs, merges))
    assert rep["n_exchanges"] == 0
    assert rep["n_broadcast_joins"] + rep["n_sortmerge_joins"] == 0
    assert not rep["has_cartesian"]


def test_token_counts_and_artifact_roundtrip(spark, tmp_path):
    docs = _docs(spark, n=40)
    merges = bpe.bpe_merges_from_corpus(docs, num_merges=60)
    path = str(tmp_path / "merges.parquet")
    merges.write.parquet(path)
    reread = spark.read.parquet(path)
    a = sorted(map(tuple, bpe.apply_bpe(docs, merges)
                   .select("doc_id", "bpe_tokens").collect()))
    b = sorted(map(tuple, bpe.apply_bpe(docs, reread)
                   .select("doc_id", "bpe_tokens").collect()))
    assert [(i, list(t)) for i, t in a] == [(i, list(t)) for i, t in b]
    counts = {r["token"]: int(r["n"])
              for r in bpe.bpe_token_counts(docs, merges).collect()}
    total_subwords = sum(len(t) for _, t in a)
    assert sum(counts.values()) == total_subwords
    # every emitted token ends a word iff it carries the </w> marker
    n_words = sum(
        int(r["n"]) for r in
        bpe.word_frequencies(docs).collect())
    assert sum(n for tok, n in counts.items()
               if tok.endswith(bpe.END)) == n_words
