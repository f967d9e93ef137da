"""Hybrid retrieval fusion (similarity/fusion.py) — RRF vs a pure
python oracle on real retriever outputs, planted-winner geometry,
weights, determinism, and the end-to-end hybrid composition."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.plans.explain import assert_no_cartesian
from big_data_bowl___2023_spark.similarity import ann, retrieval
from big_data_bowl___2023_spark.similarity.fusion import (
    hybrid_topk,
    rrf_fuse,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hybrid_docs(spark):
    """Documents zipped with embeddings by row number — a corpus
    where every doc has both text and a vector (deterministic
    pairing; the geometry is arbitrary but fixed)."""
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .withColumn("__r", F.row_number().over(
                Window.orderBy("doc_id"))))
    vecs = (spark.read.parquet(f"{SF}/embeddings.parquet")
            .withColumn("__r", F.row_number().over(
                Window.orderBy("vec_id"))))
    return (docs.join(vecs, "__r")
                .select("doc_id", "text", "embedding")
                .limit(120).cache())


@pytest.fixture(scope="module")
def queries(spark, hybrid_docs):
    """8 queries: text = first 6 words of a sampled doc, embedding =
    that doc's vector — each query has an obvious best match. Query
    ids live in a disjoint numeric range (doc_id + 10^7) so the dense
    leg's self-match exclusion compares like types."""
    w = Window.orderBy("doc_id")
    return (hybrid_docs.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") % 15 == 3)
            .select((F.col("doc_id") + 10_000_000)
                     .alias("query_id"),
                    F.array_join(F.slice(F.split("text", " "), 1, 6),
                                 " ").alias("query_text"),
                    "embedding")
            .limit(8).cache())


def _py_rrf(lists, weights, c, k):
    """Oracle: dict-based RRF + (score desc, doc asc) top-k."""
    scores: dict[tuple, float] = {}
    for rows, w in zip(lists, weights):
        for q, d, r in rows:
            scores[(q, d)] = scores.get((q, d), 0.0) + w / (c + r)
    byq: dict[str, list] = {}
    for (q, d), s in scores.items():
        byq.setdefault(q, []).append((round(s, 6), d))
    out = {}
    for q, items in byq.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        out[q] = [(d, s, i + 1) for i, (s, d) in enumerate(items[:k])]
    return out


def test_rrf_matches_python_oracle_on_real_retrievers(
        spark, hybrid_docs, queries):
    sparse = retrieval.bm25_topk(hybrid_docs.select("doc_id", "text"),
                                 queries, k=20)
    dense = ann.brute_force_topk(
        hybrid_docs.select("doc_id", "embedding"),
        queries.select(F.col("query_id").alias("doc_id"), "embedding"),
        20, vec_col="embedding", id_col="doc_id"
    ).withColumnRenamed("neighbor_id", "doc_id")
    fused = rrf_fuse([sparse, dense], k=10, c=60.0,
                     weights=[1.0, 0.7]).collect()
    s_rows = [(r["query_id"], r["doc_id"], r["rank"])
              for r in sparse.collect()]
    d_rows = [(r["query_id"], r["doc_id"], r["rank"])
              for r in dense.collect()]
    want = _py_rrf([s_rows, d_rows], [1.0, 0.7], 60.0, 10)
    got: dict[str, list] = {}
    for r in sorted(fused, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["rrf_score"], r["rank"]))
    assert set(got) == set(want)
    for q in want:
        assert [(d, rk) for d, _, rk in got[q]] == \
               [(d, rk) for d, _, rk in want[q]], q
        for (_, gs, _), (_, ws, _) in zip(got[q], want[q]):
            assert gs == pytest.approx(ws, abs=2e-6)


def test_doc_ranked_in_both_lists_beats_single_list_winner(spark):
    # A is rank 1 in both lists; B is rank 1 in one, absent in the
    # other: 2/(c+1) > 1/(c+1), so A must fuse first.
    a = spark.createDataFrame(
        [("q", "A", 1), ("q", "B", 2)], ["query_id", "doc_id", "rank"])
    b = spark.createDataFrame(
        [("q", "A", 1), ("q", "C", 2)], ["query_id", "doc_id", "rank"])
    top = rrf_fuse([a, b], k=3).orderBy("rank").collect()
    assert top[0]["doc_id"] == "A"
    assert {r["doc_id"] for r in top[1:]} == {"B", "C"}


def test_zero_weight_disables_a_list(spark):
    sparse = spark.createDataFrame(
        [("q", "X", 1), ("q", "Y", 2)], ["query_id", "doc_id", "rank"])
    dense = spark.createDataFrame(
        [("q", "Y", 1), ("q", "X", 2)], ["query_id", "doc_id", "rank"])
    top = (rrf_fuse([sparse, dense], k=2, weights=[1.0, 0.0])
           .orderBy("rank").collect())
    assert [r["doc_id"] for r in top] == ["X", "Y"]
    # docs only in the zero-weight list score 0 but still appear last
    assert top[1]["rrf_score"] >= 0.0


def test_tie_breaks_on_doc_id(spark):
    lst = spark.createDataFrame(
        [("q", "zz", 1), ("q", "aa", 1)],
        ["query_id", "doc_id", "rank"])  # identical scores
    top = rrf_fuse([lst], k=2).orderBy("rank").collect()
    assert [r["doc_id"] for r in top] == ["aa", "zz"]


def test_query_missing_from_one_list_still_fuses(spark):
    a = spark.createDataFrame(
        [("q1", "A", 1), ("q2", "B", 1)], ["query_id", "doc_id", "rank"])
    b = spark.createDataFrame(
        [("q1", "C", 1)], ["query_id", "doc_id", "rank"])
    got = rrf_fuse([a, b], k=5).collect()
    qs = {r["query_id"] for r in got}
    assert qs == {"q1", "q2"}
    q2 = [r for r in got if r["query_id"] == "q2"]
    assert len(q2) == 1 and q2[0]["doc_id"] == "B"


def test_input_validation(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
    df = spark.createDataFrame([("q", "A", 1)],
                               ["query_id", "doc_id", "rank"])
    with pytest.raises(ValueError):
        rrf_fuse([df, df], weights=[1.0])


def test_brute_leg_rejects_stray_kwargs(spark, hybrid_docs, queries):
    with pytest.raises(TypeError, match="n_planes"):
        hybrid_topk(hybrid_docs, queries, k=3, n_planes=4)


def test_query_id_colliding_with_doc_id_keeps_the_doc(spark):
    """Query and doc ids are separate namespaces: a query whose id
    numerically equals a doc id must still retrieve that doc (the
    retrievers' self-match exclusion is disabled on the dense leg)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", [1.0, 0.0, 0.0, 0.0]),
         (2, "delta epsilon zeta", [0.0, 1.0, 0.0, 0.0]),
         (3, "eta theta iota", [0.0, 0.0, 1.0, 0.0])],
        "doc_id long, text string, embedding array<double>")
    q = spark.createDataFrame(
        [(2, "delta epsilon zeta", [0.0, 1.0, 0.0, 0.0])],
        "query_id long, query_text string, embedding array<double>")
    got = hybrid_topk(docs, q, k=3)
    top1 = [r for r in got.collect() if r["rank"] == 1]
    assert len(top1) == 1 and top1[0]["doc_id"] == 2


def test_hybrid_topk_equals_manual_composition(
        spark, hybrid_docs, queries):
    got = hybrid_topk(hybrid_docs, queries, k=5, fetch_k=12,
                      weights=(1.0, 1.0))
    sparse = retrieval.bm25_topk(hybrid_docs.select("doc_id", "text"),
                                 queries, k=12)
    dense = ann.brute_force_topk(
        hybrid_docs.select("doc_id", "embedding"),
        queries.select(F.col("query_id").alias("doc_id"), "embedding"),
        12, vec_col="embedding", id_col="doc_id"
    ).withColumnRenamed("neighbor_id", "doc_id")
    want = rrf_fuse([sparse, dense], k=5)
    assert sorted(map(tuple, got.collect())) == \
           sorted(map(tuple, want.collect()))
    assert got.columns == ["query_id", "doc_id", "rrf_score", "rank"]
    # every query comes back, each with ≤ k total-ordered rows
    per_q = {}
    for r in got.collect():
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {r["query_id"] for r in queries.collect()}
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_hybrid_query_text_finds_its_source_doc(
        spark, hybrid_docs, queries):
    """Each query was built from a doc (its first words + its exact
    vector): that doc must fuse at rank 1 — both legs rank it top."""
    got = hybrid_topk(hybrid_docs, queries, k=3)
    top1 = {r["query_id"]: r["doc_id"] for r in got.collect()
            if r["rank"] == 1}
    for r in queries.collect():
        assert top1[r["query_id"]] == r["query_id"] - 10_000_000


def test_hybrid_ivf_leg_and_no_cartesian(spark, hybrid_docs, queries):
    got = hybrid_topk(hybrid_docs, queries, k=4, dense="ivf",
                      n_planes=2)
    assert_no_cartesian(got)
    rows = got.collect()
    assert rows and {r["query_id"] for r in rows} <= \
        {r["query_id"] for r in queries.collect()}
    with pytest.raises(ValueError):
        hybrid_topk(hybrid_docs, queries, k=2, dense="nope")


def test_index_backed_dense_leg_matches_ivf(spark, hybrid_docs,
                                            queries, tmp_path):
    """VERDICT r9 #6 — the serving shape: the dense leg against the
    persistent index (float and quantized tiers) fuses identically to
    the on-the-fly ivf leg over the same rows (ann_index_search is
    bit-identical to ivf_topk; the quantized tier's exact rerank
    restores the same cosines, hence the same ranks)."""
    from big_data_bowl___2023_spark.similarity import build_ann_index

    idx = str(tmp_path / "hidx")
    build_ann_index(hybrid_docs.select("doc_id", "embedding"), idx,
                    id_col="doc_id", quantize=True)
    want = sorted(
        (r["query_id"], r["doc_id"], r["rrf_score"], r["rank"])
        for r in hybrid_topk(hybrid_docs, queries, k=5,
                             dense="ivf").collect())
    got_f = sorted(
        (r["query_id"], r["doc_id"], r["rrf_score"], r["rank"])
        for r in hybrid_topk(hybrid_docs, queries, k=5,
                             dense="index", index_dir=idx).collect())
    got_q = sorted(
        (r["query_id"], r["doc_id"], r["rrf_score"], r["rank"])
        for r in hybrid_topk(hybrid_docs, queries, k=5,
                             dense="index_quantized",
                             index_dir=idx).collect())
    assert got_f == want and got_q == want and want


def test_index_leg_requires_index_dir(spark, hybrid_docs, queries):
    with pytest.raises(ValueError, match="index_dir"):
        hybrid_topk(hybrid_docs, queries, k=3, dense="index")
