"""E30 — training-mixture construction: realized token shares track
the target weights, undersized sources clamp to full inclusion,
unlisted sources drop out, and membership is deterministic and
monotone in the budget (a bigger budget only ADDS documents — the
property that makes incremental mixture growth reproducible)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.functions import text as Tx
from big_data_bowl___2023_spark.operators.sampling import build_mixture
from big_data_bowl___2023_spark.sources.io import load_table


def _synthetic(spark):
    """3 sources × 3000 docs, 10 tokens each — big enough that hash
    sampling noise is ~2%."""
    return (spark.range(9000)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("src"), (F.col("id") % 3))
                    .alias("source"),
                    F.lit(10).alias("n_tokens")))


def test_realized_shares_track_weights(spark):
    df = _synthetic(spark)
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    total = 30_000  # one third of the corpus' 90k tokens
    mix = build_mixture(df, weights, total)
    got = {r.source: r.t for r in
           mix.groupBy("source").agg(F.sum("n_tokens").alias("t"))
           .collect()}
    realized_total = sum(got.values())
    assert abs(realized_total - total) / total < 0.1
    for s, w in weights.items():
        share = got[s] / realized_total
        assert abs(share - w) / w < 0.1, (s, share, w)


def test_clamp_unlisted_and_monotone_budget(spark, sf_dir):
    docs = (load_table(spark, sf_dir, "documents")
            .withColumn("n_tokens", Tx.token_count(F.col("text"))))
    srcs = [r.source for r in
            docs.select("source").distinct().orderBy("source").limit(3)
            .collect()]
    # src[0] weighted far beyond its size -> clamps to everything it has
    weights = {srcs[0]: 0.9, srcs[1]: 0.1}
    corpus_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]
    mix = build_mixture(docs, weights, int(corpus_tokens))
    in0 = docs.filter(F.col("source") == srcs[0]).count()
    got0 = mix.filter(F.col("source") == srcs[0]).count()
    assert got0 == in0  # clamped: fully included
    # unlisted sources contribute nothing
    assert mix.filter(~F.col("source").isin(list(weights))).count() == 0

    # determinism + monotonicity in the budget
    small = build_mixture(docs, weights, int(corpus_tokens * 0.2))
    small2 = build_mixture(docs, weights, int(corpus_tokens * 0.2))
    assert {r.doc_id for r in small.collect()} \
        == {r.doc_id for r in small2.collect()}
    big = build_mixture(docs, weights, int(corpus_tokens * 0.5))
    assert {r.doc_id for r in small.collect()} \
        <= {r.doc_id for r in big.collect()}


def test_temperature_weights_properties():
    from big_data_bowl___2023_spark.operators.sampling import (
        temperature_weights,
    )

    totals = {"web": 8_000, "books": 1_500, "code": 500}
    nat = temperature_weights(totals, 1.0)
    # T=1 reproduces natural shares
    assert abs(nat["web"] - 0.8) < 1e-12
    assert abs(sum(nat.values()) - 1.0) < 1e-12
    # higher temperature flattens toward uniform (rare sources gain)
    hot = temperature_weights(totals, 4.0)
    assert hot["code"] > nat["code"] and hot["web"] < nat["web"]
    assert abs(sum(hot.values()) - 1.0) < 1e-12
    # very high T ~ uniform
    flat = temperature_weights(totals, 1e9)
    for v in flat.values():
        assert abs(v - 1 / 3) < 1e-3
    # T<1 sharpens toward the dominant source
    cold = temperature_weights(totals, 0.5)
    assert cold["web"] > nat["web"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        temperature_weights(totals, 0.0)


def test_build_temperature_mixture_rebalances(spark, sf_dir):
    """At high temperature the realized token shares move toward
    uniform relative to the natural (T=1) mixture."""
    from big_data_bowl___2023_spark.functions import text as Tx
    from big_data_bowl___2023_spark.operators.sampling import (
        build_temperature_mixture,
    )
    from big_data_bowl___2023_spark.sources.io import load_table

    docs = (load_table(spark, sf_dir, "documents")
            .withColumn("n_tokens", Tx.token_count(F.col("text"))))
    total = int(docs.agg(F.sum("n_tokens")).first()[0] * 0.5)

    def shares(mix):
        rows = (mix.groupBy("source").agg(F.sum("n_tokens").alias("t"))
                .collect())
        z = sum(r.t for r in rows)
        return {r.source: r.t / z for r in rows}

    s_nat = shares(build_temperature_mixture(docs, total, 1.0))
    s_hot = shares(build_temperature_mixture(docs, total, 8.0))
    n = len(s_nat)
    # hot mixture is closer to uniform in L1 distance
    d_nat = sum(abs(v - 1 / n) for v in s_nat.values())
    d_hot = sum(abs(v - 1 / n) for v in s_hot.values())
    assert d_hot <= d_nat
    # determinism: same seed, same membership
    a = {r.doc_id for r in
         build_temperature_mixture(docs, total, 8.0).select("doc_id")
         .collect()}
    b = {r.doc_id for r in
         build_temperature_mixture(docs, total, 8.0).select("doc_id")
         .collect()}
    assert a == b
