"""Deterministic sampling + shard packing: cross-engine equality with
DuckDB is impossible here (xxhash64 is Spark-specific), so the tests
pin the semantic contracts instead — determinism across runs, exact
per-stratum counts, budget respect, and plan shape (hash_sample must
stay a scan-side filter)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.sampling import (
    hash_sample, pack_by_budget, pack_by_budget_strict,
    stratified_sample_exact,
)
from big_data_bowl___2023_spark.sources.io import load_table


def test_hash_sample_deterministic_and_unbiased(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    s1 = hash_sample(docs, 0.3)
    s2 = hash_sample(docs, 0.3)
    ids1 = {r.doc_id for r in s1.select("doc_id").collect()}
    ids2 = {r.doc_id for r in s2.select("doc_id").collect()}
    assert ids1 == ids2                      # rerun-stable
    assert 0.15 * n <= len(ids1) <= 0.45 * n  # near the target fraction
    # a different seed draws a genuinely different sample
    ids3 = {r.doc_id for r in hash_sample(docs, 0.3, seed=7)
            .select("doc_id").collect()}
    assert ids3 != ids1
    # nested property: a tighter cut is a subset of a looser one
    ids_small = {r.doc_id for r in hash_sample(docs, 0.1)
                 .select("doc_id").collect()}
    assert ids_small <= ids1


def test_hash_sample_is_scanside_filter(spark, sf_dir):
    """No Exchange in the plan — the sample must not shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (hash_sample(docs, 0.5)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


def test_stratified_sample_exact_counts(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    frac = 0.2
    sampled = stratified_sample_exact(orders, ["o_orderstatus"], frac,
                                      id_col="o_orderkey")
    per = {r.o_orderstatus: r.n for r in
           orders.groupBy("o_orderstatus")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r.o_orderstatus: r.n for r in
           sampled.groupBy("o_orderstatus")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
    import math
    for status, n in per.items():
        assert got[status] == math.ceil(n * frac), status
    # deterministic across runs
    a = {r.o_orderkey for r in sampled.select("o_orderkey").collect()}
    b = {r.o_orderkey for r in
         stratified_sample_exact(orders, ["o_orderstatus"], frac,
                                 id_col="o_orderkey")
         .select("o_orderkey").collect()}
    assert a == b


def test_pack_by_budget_respects_budget(spark, sf_dir):
    docs = (load_table(spark, sf_dir, "documents")
            .withColumn("n_tokens", F.size(F.split(F.col("text"), " "))))
    budget = 400
    packed = pack_by_budget(docs, budget, "n_tokens", ["lang"])
    rows = packed.select("lang", "shard", "doc_id", "n_tokens").collect()

    # reconstruct shards and check: no shard exceeds budget unless it
    # is a single oversized row, and shard ids are dense from 0
    by_shard = {}
    for r in rows:
        by_shard.setdefault((r.lang, r.shard), []).append(r.n_tokens)
    for (lang, shard), sizes in by_shard.items():
        assert shard >= 0
        if len(sizes) > 1:
            assert sum(sizes) <= budget + max(sizes), (lang, shard)
    for lang in {r.lang for r in rows}:
        shards = sorted(s for (lg, s) in by_shard if lg == lang)
        assert shards[0] == 0

    # deterministic: identical assignment on rerun
    again = {(r.lang, r.doc_id): r.shard
             for r in pack_by_budget(docs, budget, "n_tokens", ["lang"])
             .select("lang", "doc_id", "shard").collect()}
    for r in rows:
        assert again[(r.lang, r.doc_id)] == r.shard


def test_pack_variants_hand_fixture(spark):
    """Sizes 2,2,2 with budget 5 separate the two contracts:
    boundary packing floors the exclusive cumsum (0,2,4 -> all shard
    0, total 6 = bounded overflow), strict packing resets on overflow
    (2+2=4 fits, +2 would be 6 -> new shard)."""
    df = (spark.createDataFrame([(1, 2), (2, 2), (3, 2)],
                                "doc_id: long, n: long")
          .withColumn("p", F.lit("x")))
    boundary = sorted(r.shard for r in
                      pack_by_budget(df, 5, "n", ["p"]).collect())
    assert boundary == [0, 0, 0]
    strict = sorted(r.shard for r in
                    pack_by_budget_strict(df, 5, "n", ["p"]).collect())
    assert strict == [0, 0, 1]


def test_pack_strict_never_exceeds_budget(spark, sf_dir):
    docs = (load_table(spark, sf_dir, "documents")
            .withColumn("n_tokens", F.size(F.split(F.col("text"), " "))))
    budget = 400
    packed = pack_by_budget_strict(docs, budget, "n_tokens", ["lang"])
    sums = (packed.groupBy("lang", "shard")
                  .agg(F.sum("n_tokens").alias("total"),
                       F.count(F.lit(1)).alias("n"),
                       F.max("n_tokens").alias("mx"))
                  .collect())
    assert sums
    for r in sums:
        if r.n > 1:
            assert r.total <= budget, (r.lang, r.shard, r.total)
        else:
            assert r.total <= budget or r.mx > budget
    # strict packing keeps every input row exactly once
    assert packed.count() == docs.count()


def test_cap_per_group_quota_and_determinism(spark, sf_dir):
    from big_data_bowl___2023_spark.operators.sampling import (
        cap_per_group,
    )

    docs = load_table(spark, sf_dir, "documents")
    capped = cap_per_group(docs, ["source"], 25)
    sizes = {r.source: r["count"]
             for r in capped.groupBy("source").count().collect()}
    orig = {r.source: r["count"]
            for r in docs.groupBy("source").count().collect()}
    for s, n in sizes.items():
        assert n == min(25, orig[s])
    again = cap_per_group(docs.repartition(13), ["source"], 25)
    assert {r.doc_id for r in capped.select("doc_id").collect()} == \
           {r.doc_id for r in again.select("doc_id").collect()}


def test_cap_per_group_priority_keeps_best(spark):
    from big_data_bowl___2023_spark.operators.sampling import (
        cap_per_group,
    )

    rows = [(i, "web", float(i % 10)) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    kept = cap_per_group(df, ["source"], 6, priority_col="score")
    scores = sorted(r.score for r in kept.collect())
    # 30 rows, scores 0-9 three times each: the top-6 are {9,9,9,8,8,8}
    assert scores == [8.0, 8.0, 8.0, 9.0, 9.0, 9.0]


def test_quantile_buckets_balance_and_order(spark, sf_dir):
    from big_data_bowl___2023_spark.operators.sampling import (
        quantile_buckets,
    )

    li = load_table(spark, sf_dir, "lineitem")
    b = quantile_buckets(li.select("l_extendedprice"),
                         "l_extendedprice", 4)
    sizes = {r.bucket: r["count"]
             for r in b.groupBy("bucket").count().collect()}
    n = sum(sizes.values())
    assert set(sizes) == {0, 1, 2, 3}
    for c in sizes.values():            # ~balanced quartiles
        assert 0.2 < c / n < 0.3
    # bucket order respects value order
    stats = {r.bucket: (r.lo, r.hi) for r in
             b.groupBy("bucket")
              .agg(F.min("l_extendedprice").alias("lo"),
                   F.max("l_extendedprice").alias("hi")).collect()}
    for i in range(3):
        assert stats[i][1] <= stats[i + 1][0]


def test_quantile_buckets_nulls(spark):
    from big_data_bowl___2023_spark.operators.sampling import (
        quantile_buckets,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, None)],
        ["id", "x"])
    got = {r.id: r.bucket for r in quantile_buckets(df, "x", 2).collect()}
    assert got[5] is None
    assert got[1] == 0 and got[4] == 1


def test_epoch_shuffle_determinism_and_seed_sensitivity(spark, sf_dir):
    from big_data_bowl___2023_spark.operators.sampling import (
        epoch_shuffle,
    )
    from big_data_bowl___2023_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = [r.doc_id for r in epoch_shuffle(docs, seed=1).collect()]
    b = [r.doc_id for r in
         epoch_shuffle(docs.repartition(13), seed=1).collect()]
    c = [r.doc_id for r in epoch_shuffle(docs, seed=2).collect()]
    assert a == b                       # layout-independent
    assert sorted(a) == sorted(c)       # permutation of same rows
    assert a != c                       # seed changes the order
    assert a != sorted(a)               # actually shuffled

    # sharded form replays the identical global order shard by shard
    sharded = epoch_shuffle(docs, seed=1, n_shards=4)
    sp = (sharded.withColumn("pid", F.spark_partition_id())
          .collect())
    by_shard: dict = {}
    for r in sp:
        by_shard.setdefault(r.pid, []).append(r.doc_id)
    replay = [d for pid in sorted(by_shard) for d in by_shard[pid]]
    assert replay == a


def test_hash_sample_exact(spark, sf_dir):
    from big_data_bowl___2023_spark.operators.sampling import (
        hash_sample_exact,
    )
    from big_data_bowl___2023_spark.plans.explain import formatted_plan
    from big_data_bowl___2023_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    s1 = sorted(r.doc_id for r in
                hash_sample_exact(docs, 50, seed=1).collect())
    s1b = sorted(r.doc_id for r in
                 hash_sample_exact(docs.repartition(9), 50,
                                   seed=1).collect())
    s2 = sorted(r.doc_id for r in
                hash_sample_exact(docs, 50, seed=2).collect())
    assert len(s1) == 50 and s1 == s1b      # exact k, layout-proof
    assert s1 != s2                          # seed-independent draws
    assert hash_sample_exact(docs, n + 10, seed=1).count() == n
    assert hash_sample_exact(docs, 50, seed=1).columns == docs.columns
    # TakeOrdered, not a global sort materialization
    assert "TakeOrderedAndProject" in formatted_plan(
        hash_sample_exact(docs, 50, seed=1))
