"""Bottom-k / KMV uniform-sample artifacts (operators/bottomk.py).

Contracts under test:
* the sample is EXACTLY the k distinct keys with the smallest seeded
  hash (verified against a whole-corpus Spark-SQL recompute);
* deterministic and layout-invariant — bit-identical rows under any
  partitioning;
* merged per-batch artifacts == the single-pass sketch exactly, and
  re-merging an included batch changes nothing (idempotent);
* duplicate keys collapse, carrying the least payload tuple;
* KMV distinct estimate: exact below k, within the error envelope
  at k; NULL keys excluded / NULL groups kept;
* parquet round trip; bounded candidate shuffle (raw rows never
  shuffle: ≤ 2 Exchanges, both over candidate rows);
* different seeds draw different samples.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.bottomk import (
    bottomk_summary,
    kmv_distinct_estimate,
    merge_bottomk,
)

K = 32


def _keys(spark, n, prefix="key", group=None):
    df = spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("k"))
    if group is not None:
        df = df.withColumn("g", F.lit(group))
    return df


def _expected(df, key_col, k, seed=0):
    """Brute-force oracle: whole-corpus hash sort in plain Spark."""
    return {r["k"] for r in
            df.select(key_col)
              .distinct()
              .withColumn("h", F.xxhash64(F.lit(seed), F.col(key_col)))
              .orderBy("h", key_col).limit(k).collect()}


def test_sample_is_exact_bottom_k(spark):
    df = _keys(spark, 5000)
    got = bottomk_summary(df, "k", K)
    rows = got.collect()
    assert len(rows) == K
    assert {r["k"] for r in rows} == _expected(df, "k", K)
    # hash column is the real hash (artifact is self-verifying)
    for r in rows:
        assert r["kmv_hash"] is not None


def test_layout_invariance_bit_exact(spark):
    df = _keys(spark, 2000)
    a = sorted(map(tuple, bottomk_summary(
        df.coalesce(1), "k", K).collect()))
    b = sorted(map(tuple, bottomk_summary(
        df.repartition(17), "k", K).collect()))
    assert a == b


def test_merge_exact_and_idempotent(spark):
    a = _keys(spark, 1500, "a")
    b = _keys(spark, 1500, "b")
    whole = sorted(map(tuple, bottomk_summary(
        a.union(b), "k", K).collect()))
    sa = bottomk_summary(a, "k", K)
    sb = bottomk_summary(b, "k", K)
    merged = merge_bottomk(sa, sb, key_col="k", k=K)
    assert sorted(map(tuple, merged.collect())) == whole
    again = merge_bottomk(merged, sb, key_col="k", k=K)
    assert sorted(map(tuple, again.collect())) == whole
    with pytest.raises(ValueError, match="at least"):
        merge_bottomk(key_col="k", k=K)


def test_duplicate_keys_collapse_least_payload(spark):
    df = spark.createDataFrame(
        [("dup", "z-src", 9), ("dup", "a-src", 1),
         ("only", "m-src", 5)],
        "k string, src string, n int").repartition(4)
    rows = {r["k"]: r for r in
            bottomk_summary(df, "k", 10,
                            payload_cols=["src", "n"]).collect()}
    assert len(rows) == 2
    assert rows["dup"]["src"] == "a-src" and rows["dup"]["n"] == 1
    assert rows["only"]["src"] == "m-src"


def test_grouped_null_group_and_null_keys(spark):
    df = spark.createDataFrame(
        [("a", "k1"), ("a", "k2"), (None, "k3"), ("a", None)],
        "g string, k string")
    got = bottomk_summary(df, "k", 10, group_cols=["g"])
    by_g = {}
    for r in got.collect():
        by_g.setdefault(r["g"], set()).add(r["k"])
    assert by_g == {"a": {"k1", "k2"}, None: {"k3"}}
    est = {r["g"]: r["distinct_estimate"] for r in
           kmv_distinct_estimate(got,
                                 group_cols=["g"]).collect()}
    assert est == {"a": 2.0, None: 1.0}  # below k -> exact


def test_kmv_estimate_envelope_at_k(spark):
    n, k = 20_000, 256
    df = _keys(spark, n)
    est = kmv_distinct_estimate(
        bottomk_summary(df, "k", k)).collect()[0]
    # relative error ~1/sqrt(k-2) ≈ 6.3%; accept 4 sigma
    assert abs(est["distinct_estimate"] - n) < 0.25 * n


def test_parquet_round_trip_and_growth(spark, tmp_path):
    old = _keys(spark, 1000, "old")
    path = str(tmp_path / "bottomk")
    bottomk_summary(old, "k", K).write.parquet(path)
    reloaded = spark.read.parquet(path)
    fresh = bottomk_summary(_keys(spark, 1000, "new"), "k", K)
    grown = merge_bottomk(reloaded, fresh, key_col="k", k=K)
    whole = bottomk_summary(
        _keys(spark, 1000, "old").union(_keys(spark, 1000, "new")),
        "k", K)
    assert sorted(map(tuple, grown.collect())) == \
        sorted(map(tuple, whole.collect()))


def test_seed_sensitivity_and_validation(spark):
    df = _keys(spark, 3000)
    s0 = {r["k"] for r in bottomk_summary(df, "k", K,
                                          seed=0).collect()}
    s1 = {r["k"] for r in bottomk_summary(df, "k", K,
                                          seed=1).collect()}
    assert s0 != s1                      # different draws
    assert len(s0) == len(s1) == K
    with pytest.raises(ValueError, match="k must be"):
        bottomk_summary(df, "k", 0)
    with pytest.raises(ValueError, match="collision"):
        bottomk_summary(df, "k", 5, payload_cols=["k"])


def test_candidate_only_shuffle_plan(spark):
    """Raw rows never shuffle: the plan's Exchanges sit above the
    mapInPandas partial stage (candidate rows only), and there are at
    most 2 (global key-dedup + top-k window share partitioning when
    the grouping allows; ceiling 2 either way)."""
    import re
    df = _keys(spark, 1000).withColumn("g", F.lit("s"))
    plan = bottomk_summary(df, "k", K, group_cols=["g"]) \
        ._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) <= 2
    # the scan-side stage is the Python partial, below any Exchange
    assert "MapInPandas" in plan


def test_sample_on_documents_with_payload(spark, sf_dir):
    """Product shape: 10 inspectable docs per source, deterministic,
    with payload columns along for the ride."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = bottomk_summary(docs, "doc_id", 10, group_cols=["source"],
                        payload_cols=["lang", "n_chars"])
    per_src = {r["source"]: r["n"] for r in
               s.groupBy("source").agg(
                   F.count(F.lit(1)).alias("n")).collect()}
    n_sources = docs.select("source").distinct().count()
    assert len(per_src) == n_sources
    assert all(n == 10 for n in per_src.values())
    # payloads are real document attributes
    joined = s.join(docs, ["doc_id", "source"], "inner")
    assert joined.count() == s.count()


def test_null_payload_layout_invariant(spark):
    """A key whose payload is NULL in one partition and set in
    another must resolve identically under any layout (Spark's
    NULLS-FIRST struct ordering, mirrored by the pandas phase)."""
    df = spark.createDataFrame(
        [("dup", None, 7), ("dup", "b-src", 1), ("x", "m", 2)],
        "k string, src string, n int")
    rows = {}
    for layout in (df.coalesce(1), df.repartition(5)):
        got = sorted(map(tuple, bottomk_summary(
            layout, "k", 10, payload_cols=["src", "n"]).collect()))
        rows.setdefault("all", []).append(got)
    assert rows["all"][0] == rows["all"][1]
    by_k = {t[0]: t for t in rows["all"][0]}
    assert by_k["dup"][2] is None        # NULL payload wins (first)


def test_merge_k_larger_than_build_refused(spark):
    df = _keys(spark, 500)
    s = bottomk_summary(df, "k", 16)
    with pytest.raises(ValueError, match="exceeds a build k"):
        merge_bottomk(s, s, key_col="k", k=32)
    # shrinking k is fine
    small = merge_bottomk(s, key_col="k", k=8)
    assert small.count() == 8
    assert small.collect()[0]["kmv_k"] == 8


def test_artifact_self_describes_k(spark):
    df = _keys(spark, 100)
    s = bottomk_summary(df, "k", 16)
    assert {r["kmv_k"] for r in s.collect()} == {16}
    # the estimator reads k from the artifact: below-k group exact
    tiny = bottomk_summary(_keys(spark, 5), "k", 16)
    est = kmv_distinct_estimate(tiny).collect()[0]
    assert est["distinct_estimate"] == 5.0


def test_kmv_overlap_known_jaccard(spark):
    """A=0..2499, B=1500..3999: |∩|=1000, |∪|=4000, J=0.25. At k=256
    the estimator's σ(J)≈0.027 — accept 4σ. Estimates come from the
    ARTIFACTS only (no corpus join)."""
    from big_data_bowl___2023_spark.operators.bottomk import (
        kmv_overlap_estimate,
    )
    k = 256
    a = spark.range(0, 2500).select(
        F.concat(F.lit("key"), F.col("id")).alias("k"))
    b = spark.range(1500, 4000).select(
        F.concat(F.lit("key"), F.col("id")).alias("k"))
    est = kmv_overlap_estimate(
        bottomk_summary(a, "k", k),
        bottomk_summary(b, "k", k), "k").collect()[0]
    assert abs(est["jaccard"] - 0.25) < 0.11
    assert abs(est["union_estimate"] - 4000) < 1000
    assert abs(est["intersection_estimate"] - 1000) < 450


def test_kmv_overlap_exact_below_k_and_disjoint(spark):
    from big_data_bowl___2023_spark.operators.bottomk import (
        kmv_overlap_estimate,
    )
    a = _keys(spark, 20, "s")          # s0..s19
    b = spark.range(10, 30).select(
        F.concat(F.lit("s"), F.col("id")).alias("k"))  # s10..s29
    est = kmv_overlap_estimate(
        bottomk_summary(a, "k", 64),
        bottomk_summary(b, "k", 64), "k").collect()[0]
    assert est["jaccard"] == pytest.approx(10 / 30)
    assert est["union_estimate"] == 30.0
    assert est["intersection_estimate"] == pytest.approx(10.0)
    # disjoint corpora: zero across the board
    c = _keys(spark, 20, "t")
    z = kmv_overlap_estimate(
        bottomk_summary(a, "k", 64),
        bottomk_summary(c, "k", 64), "k").collect()[0]
    assert z["jaccard"] == 0.0
    assert z["intersection_estimate"] == 0.0


def test_kmv_overlap_guards(spark):
    from big_data_bowl___2023_spark.operators.bottomk import (
        kmv_overlap_estimate,
    )
    df = _keys(spark, 100)
    with pytest.raises(ValueError, match="shared build k"):
        kmv_overlap_estimate(bottomk_summary(df, "k", 16),
                             bottomk_summary(df, "k", 32), "k")
    with pytest.raises(ValueError, match="different seeds"):
        kmv_overlap_estimate(bottomk_summary(df, "k", 16, seed=0),
                             bottomk_summary(df, "k", 16, seed=9),
                             "k")


def test_kmv_overlap_grouped(spark):
    from big_data_bowl___2023_spark.operators.bottomk import (
        kmv_overlap_estimate,
    )
    a = spark.createDataFrame(
        [("g1", f"k{i}") for i in range(10)]
        + [("g2", f"k{i}") for i in range(5)], "g string, k string")
    b = spark.createDataFrame(
        [("g1", f"k{i}") for i in range(5, 15)]
        + [("g2", f"x{i}") for i in range(5)], "g string, k string")
    est = {r["g"]: r for r in kmv_overlap_estimate(
        bottomk_summary(a, "k", 32, group_cols=["g"]),
        bottomk_summary(b, "k", 32, group_cols=["g"]),
        "k", group_cols=["g"]).collect()}
    assert est["g1"]["jaccard"] == pytest.approx(5 / 15)
    assert est["g2"]["jaccard"] == 0.0


def test_merge_refuses_mixed_seeds(spark):
    df = _keys(spark, 200)
    s0 = bottomk_summary(df, "k", 16, seed=0)
    s1 = bottomk_summary(df, "k", 16, seed=1)
    with pytest.raises(ValueError, match="different seeds"):
        merge_bottomk(s0, s1, key_col="k", k=16).collect()


def test_kmv_overlap_matrix_matches_pairwise_and_exact(spark):
    """The all-pairs matrix from ONE grouped artifact agrees with
    pairwise kmv_overlap_estimate calls, and is EXACT on small
    groups: three sources with known overlaps."""
    from big_data_bowl___2023_spark.operators.bottomk import (
        kmv_overlap_estimate,
        kmv_overlap_matrix,
    )
    rows = [("s1", f"k{i}") for i in range(20)] \
        + [("s2", f"k{i}") for i in range(10, 30)] \
        + [("s3", f"x{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "src string, k string")
    art = bottomk_summary(df, "k", 64, group_cols=["src"])
    mat = {(r["group_a"], r["group_b"]): r for r in
           kmv_overlap_matrix(art, "k", "src").collect()}
    assert set(mat) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert mat[("s1", "s2")]["jaccard"] == pytest.approx(10 / 30)
    assert mat[("s1", "s2")]["intersection_estimate"] == \
        pytest.approx(10.0)
    assert mat[("s1", "s3")]["jaccard"] == 0.0
    assert mat[("s2", "s3")]["jaccard"] == 0.0
    # agrees with the two-artifact pairwise path
    for (ga, gb), r in mat.items():
        pair = kmv_overlap_estimate(
            bottomk_summary(df.filter(F.col("src") == ga), "k", 64),
            bottomk_summary(df.filter(F.col("src") == gb), "k", 64),
            "k").collect()[0]
        assert r["jaccard"] == pytest.approx(pair["jaccard"])
        assert r["union_estimate"] == \
            pytest.approx(pair["union_estimate"])
    # guards
    with pytest.raises(ValueError, match="mixed build k"):
        kmv_overlap_matrix(
            bottomk_summary(df, "k", 16, group_cols=["src"])
            .unionByName(art), "k", "src")


def test_kmv_overlap_hash_check_is_lazy_single_job(spark):
    """Round-8 (r7 ADVICE #3): the co-occurring-key hash check rides
    the result aggregation instead of a separate eager count() job —
    so (a) building the estimate schedules no full-artifact action,
    and (b) a corrupted artifact (same seed metadata, disagreeing
    hashes) poisons the RESULT computation with the original
    message, not the call."""
    from big_data_bowl___2023_spark.operators.bottomk import (
        HASH_COL,
        kmv_overlap_estimate,
    )
    df = _keys(spark, 100)
    sa = bottomk_summary(df, "k", 16)
    # same kmv_seed metadata, silently different hash scale — the
    # exact corruption the belt-and-braces check exists to catch
    sb = bottomk_summary(df, "k", 16) \
        .withColumn(HASH_COL, F.col(HASH_COL) + 1)
    est = kmv_overlap_estimate(sa, sb, "k")     # no raise: lazy
    with pytest.raises(Exception, match="cannot be compared"):
        est.collect()
    # the guard rides EVERY output column: pruning down to
    # union_estimate alone must still trip it
    with pytest.raises(Exception, match="cannot be compared"):
        est.select("union_estimate").collect()
    # healthy artifacts still estimate exactly (below-k corpora)
    ok = kmv_overlap_estimate(sa, bottomk_summary(df, "k", 16),
                              "k").collect()[0]
    assert ok["jaccard"] == 1.0


def test_bottomk_rejects_group_payload_and_key_collisions(spark):
    """Round-8 (r7 ADVICE #5): the column-overlap guard covers ALL
    pairwise collisions — group∩payload and key∈groups slipped the
    old check and produced duplicate-named output columns."""
    df = spark.createDataFrame(
        [("a", "g", 1)], "k string, g string, v long")
    with pytest.raises(ValueError, match="collision"):
        bottomk_summary(df, "k", 4, group_cols=["g"],
                        payload_cols=["g"])       # group repeated
    with pytest.raises(ValueError, match="collision"):
        bottomk_summary(df, "k", 4, group_cols=["k"])  # key in groups
    with pytest.raises(ValueError, match="collision"):
        bottomk_summary(df, "k", 4, payload_cols=["v", "v"])
