"""Heavy hitters (Misra-Gries two-pass) and embedding-space
decontamination: exact-result guarantees vs DuckDB/numpy oracles,
partitioning invariance, and plan assertions for the no-shuffle
claims."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.dedup import (
    semantic_contamination_report,
    semantic_decontaminate,
)
from big_data_bowl___2023_spark.operators.heavy import (
    ceil_phi_n,
    heavy_hitters,
    mg_capacity,
    partition_summaries,
)
from big_data_bowl___2023_spark.plans.explain import formatted_plan
from big_data_bowl___2023_spark.sources.io import load_table


# ---------------------------------------------------------------- heavy

def _oracle(pairs, phi):
    """Exact heavy set via DuckDB over (key,) python rows."""
    con = duckdb.connect()
    con.execute("create table t (key varchar)")
    con.executemany("insert into t values (?)", [(k,) for k in pairs])
    n = len(pairs)
    rows = con.execute(
        "select key, count(*) c from t group by key "
        "having c >= ?", [ceil_phi_n(phi, n)]).fetchall()
    return {(k, c) for k, c in rows}


def test_heavy_hitters_exact_vs_oracle(spark):
    # 3 heavy keys on a 2000-distinct-key tail; phi well above tail freq
    keys = (["hot_a"] * 400 + ["hot_b"] * 250 + ["hot_c"] * 120
            + [f"tail_{i}" for i in range(2000)])
    df = spark.createDataFrame([(k,) for k in keys], ["k"]).repartition(8)
    phi = 0.04                           # ceil(.04*2770)=111 -> all 3
    got = {(r.k, r["count"])
           for r in heavy_hitters(df, "k", phi).collect()}
    assert got == _oracle(keys, phi)
    assert got == {("hot_a", 400), ("hot_b", 250), ("hot_c", 120)}


def test_heavy_hitters_partitioning_invariance(spark):
    keys = (["x"] * 90 + ["y"] * 50 + [f"t{i}" for i in range(500)])
    rows = [(k,) for k in keys]
    a = heavy_hitters(
        spark.createDataFrame(rows, ["k"]).repartition(3), "k", 0.05)
    b = heavy_hitters(
        spark.createDataFrame(rows, ["k"]).repartition(17), "k", 0.05)
    assert (sorted((r.k, r["count"]) for r in a.collect())
            == sorted((r.k, r["count"]) for r in b.collect()))


def test_heavy_hitters_events_table(spark, sf_dir):
    """Real table, low-phi query where every event_type qualifies AND
    a high-phi query that prunes — both must equal the naive groupBy."""
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    for phi in (0.01, 0.30):
        exact = {(r.event_type, r["count"]) for r in
                 ev.groupBy("event_type")
                 .agg(F.count(F.lit(1)).alias("count"))
                 .filter(F.col("count") >= ceil_phi_n(phi, n))
                 .collect()}
        got = {(r.event_type, r["count"])
               for r in heavy_hitters(ev, "event_type", phi).collect()}
        assert got == exact


def test_heavy_hitters_null_keys(spark):
    rows = [("a",)] * 60 + [(None,)] * 40 + [("b",)] * 5
    df = spark.createDataFrame(rows, "k string").repartition(4)
    got = {(r.k, r["count"])
           for r in heavy_hitters(df, "k", 0.3).collect()}
    assert got == {("a", 60), (None, 40)}


def test_summary_stays_bounded(spark):
    """The no-shuffle pass-1 contract: the summary is ≤ partitions ×
    capacity rows no matter how many distinct keys stream through."""
    df = (spark.range(20_000)
          .select(F.concat(F.lit("k"), F.col("id")).alias("k"))
          .repartition(8))
    cap = mg_capacity(0.1)     # 20
    summ = partition_summaries(df, "k", cap)
    assert summ.count() <= 8 * (cap + 1)    # +1 null-count row/part


def test_heavy_plan_shape(spark):
    """Pass 1 has ZERO exchanges; pass 2's only shuffle feeds the
    candidate-row groupBy, and the candidate probe is a broadcast."""
    df = (spark.range(5_000)
          .select((F.col("id") % 7).cast("string").alias("k")))
    plan1 = formatted_plan(partition_summaries(df, "k", 50))
    assert "Exchange" not in plan1
    plan2 = formatted_plan(heavy_hitters(df, "k", 0.05))
    assert "BroadcastExchange" in plan2
    assert "CartesianProduct" not in plan2
    assert "BroadcastNestedLoopJoin" not in plan2


def test_exact_threshold_arithmetic(spark):
    """phi=0.07, n=100: float ceil(0.07*100)=8 would wrongly exclude
    a key at exactly the documented 7% frequency — the Decimal path
    keeps the contract count >= 7."""
    assert ceil_phi_n(0.07, 100) == 7
    assert math.ceil(0.07 * 100) == 8      # the float trap, pinned
    keys = ["edge"] * 7 + [f"t{i}" for i in range(93)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"]).repartition(4)
    got = {(r.k, r["count"])
           for r in heavy_hitters(df, "k", 0.07).collect()}
    assert ("edge", 7) in got


def test_capacity_validation():
    with pytest.raises(ValueError):
        mg_capacity(0.0)
    with pytest.raises(ValueError):
        mg_capacity(1.5)
    with pytest.raises(ValueError):
        mg_capacity(1e-7)       # would need a 20M-key summary
    assert mg_capacity(1.0) == 2


# ------------------------------------------------- semantic decontam

def _np_oracle(corpus_rows, bench_rows, threshold):
    """Brute-force numpy: normalized GEMM, round 6, >= threshold."""
    def norm(m):
        m = np.asarray(m, dtype=np.float64)
        return m / np.linalg.norm(m, axis=1, keepdims=True)
    A, B = norm([r[1] for r in corpus_rows]), norm(
        [r[1] for r in bench_rows])
    S = np.round(A @ B.T, 6)
    ia, ib = np.nonzero(S >= threshold)
    return {(corpus_rows[i][0], bench_rows[j][0], S[i, j])
            for i, j in zip(ia, ib)}


def test_semantic_report_vs_numpy_oracle(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    bench = emb.filter(F.col("vec_id") % 5 == 0)
    rows_c = [(r.vec_id, list(r.embedding)) for r in corpus.collect()]
    rows_b = [(r.vec_id, list(r.embedding)) for r in bench.collect()]
    thr = 0.35          # sf0.001 cross-side max cosine is ~0.47
    got = {(r.vec_id, r.bench_id, r.cosine) for r in
           semantic_contamination_report(corpus, bench, thr).collect()}
    assert got == _np_oracle(rows_c, rows_b, thr)
    assert got, "threshold chosen so the fixture actually collides"


def test_semantic_planted_and_clean(spark):
    # corpus vec 1 IS bench vec 100 (cosine 1.0); vec 2 orthogonal
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        ["vec_id", "embedding"])
    bench = spark.createDataFrame(
        [(100, [2.0, 0.0, 0.0, 0.0])], ["vec_id", "embedding"])
    rep = semantic_contamination_report(corpus, bench, 0.99).collect()
    assert [(r.vec_id, r.bench_id, r.cosine) for r in rep] \
        == [(1, 100, 1.0)]
    clean = semantic_decontaminate(corpus, bench, 0.99)
    assert [r.vec_id for r in clean.collect()] == [2]
    assert clean.columns == corpus.columns
    # clean corpus: nothing within 0.99 of an orthogonal bench
    empty = semantic_contamination_report(
        corpus, spark.createDataFrame(
            [(7, [0.0, 0.0, 1.0, 0.0])], ["vec_id", "embedding"]),
        0.99)
    assert empty.count() == 0


def test_semantic_report_plan_is_mapside(spark, sf_dir):
    """The 100 TB claim: corpus side never shuffles — the scoring
    plan contains no Exchange at all (scan → Arrow eval)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.limit(5)
    plan = formatted_plan(
        semantic_contamination_report(emb, bench, 0.9))
    assert "Exchange" not in plan
    assert "SortMergeJoin" not in plan


def test_semantic_bench_too_big_raises(spark):
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(30)], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="max_bench"):
        semantic_contamination_report(emb, emb, 0.9, max_bench=10)


def test_semantic_empty_bench(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], ["vec_id", "embedding"])
    empty = semantic_contamination_report(
        emb, emb.filter(F.lit(False)), 0.9)
    assert empty.count() == 0
    assert empty.columns == ["vec_id", "bench_id", "cosine"]


def test_merged_summaries_incremental(spark):
    """Growing-corpus monitoring: summaries built per batch, merged
    WITHOUT rescanning old batches, exact recount over the union —
    equals the naive groupBy over the combined corpus. Includes a key
    that is never heavy within any single batch."""
    from big_data_bowl___2023_spark.operators.heavy import (
        heavy_hitters_from_summary,
        merge_summaries,
    )

    b1 = ["hot"] * 50 + ["slow"] * 8 + [f"a{i}" for i in range(120)]
    b2 = ["hot"] * 10 + ["slow"] * 8 + [f"b{i}" for i in range(120)]
    b3 = ["slow"] * 8 + [f"c{i}" for i in range(120)]
    cap = mg_capacity(0.05)     # phi 0.05 -> capacity 40
    dfs, summaries = [], []
    for b in (b1, b2, b3):
        d = spark.createDataFrame([(k,) for k in b],
                                  ["k"]).repartition(3)
        dfs.append(d)
        summaries.append(
            partition_summaries(d, "k", cap).localCheckpoint())

    merged = merge_summaries(*summaries).localCheckpoint()
    union = dfs[0].unionByName(dfs[1]).unionByName(dfs[2])
    got = {(r.k, r["count"]) for r in
           heavy_hitters_from_summary(union, merged, "k",
                                      0.05).collect()}
    assert got == _oracle(b1 + b2 + b3, 0.05)
    # 'slow' (24 of 444) is heavy only combined: never >= phi*n of
    # any single batch's recount threshold once tails dilute it —
    # the merged bound still surfaces it
    assert ("slow", 24) in got


def test_merge_preserves_summary_schema(spark):
    from big_data_bowl___2023_spark.operators.heavy import (
        merge_summaries,
    )

    d = spark.createDataFrame(
        [("x",)] * 10 + [(None,)] * 3, "k string").repartition(2)
    s = partition_summaries(d, "k", 4)
    m = merge_summaries(s, s)
    assert m.columns == ["key", "lower_bound", "is_null_key",
                        "part_rows"]
    r = {(row.key, row.is_null_key): row for row in m.collect()}
    assert r[("x", False)].lower_bound == 20      # summed across both
    assert r[(None, True)].lower_bound == 6


def test_semantic_null_embeddings_ignored(spark):
    """NULL embeddings on either side are skipped, not crashed on."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)],
        "vec_id long, embedding array<double>")
    bench = spark.createDataFrame(
        [(100, [2.0, 0.0]), (101, None)],
        "vec_id long, embedding array<double>")
    rep = semantic_contamination_report(corpus, bench, 0.99).collect()
    assert [(r.vec_id, r.bench_id, r.cosine) for r in rep] \
        == [(1, 100, 1.0)]


def test_empty_summary_fails_safe(spark):
    """An empty/mismatched summary must NOT degrade into the exact
    unthresholded full-shuffle groupBy the operator exists to avoid —
    it returns an empty result in the output schema instead."""
    from big_data_bowl___2023_spark.operators.heavy import (
        heavy_hitters_from_summary,
    )

    corpus = spark.createDataFrame(
        [("x",)] * 50 + [(f"t{i}",) for i in range(100)], "k string")
    empty_summary = partition_summaries(
        corpus.filter(F.lit(False)), "k", 8)
    out = heavy_hitters_from_summary(corpus, empty_summary, "k", 0.1)
    assert out.columns == ["k", "count"]
    assert out.count() == 0
