"""Operators curated OUT of the 50-slot driver registry (round 2)
keep their verification here: the registry only holds driver-checked
rows, pytest holds the rest.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl___2023_spark import dedup as dd
from big_data_bowl___2023_spark.ml.models import train_test_split
from big_data_bowl___2023_spark.operators import aggregates as agg
from big_data_bowl___2023_spark.similarity import brp_lsh_topk
from big_data_bowl___2023_spark.sources.io import load_table


def test_summary_stats_ordering(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = agg.summary_stats(li, "l_quantity").collect()[0]
    assert (row["min"] <= row["q1"] <= row["median"]
            <= row["q3"] <= row["max"])
    assert row["min"] <= row["mean"] <= row["max"]


def test_distinct_rows_matches_drop_duplicates(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    cols = ["c_nationkey", "c_mktsegment"]
    assert (agg.distinct_rows(c, cols).count()
            == c.select(*cols).dropDuplicates().count())


def test_train_test_split_seeded_and_partitioning(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    tr1, te1 = train_test_split(o)
    tr2, te2 = train_test_split(o)
    assert tr1.count() + te1.count() == o.count()
    assert tr1.count() == tr2.count() and te1.count() == te2.count()
    # 80/20 within loose tolerance on the smoke SF
    frac = tr1.count() / o.count()
    assert 0.7 < frac < 0.9


def test_mllib_minhash_pairs_runs_and_bounds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.mllib_minhash_pairs(docs, 0.3).collect()
    for r in pairs:
        assert r.doc_a < r.doc_b
        assert 0.3 - 1e-9 <= r.jaccard <= 1.0


def test_jsonl_roundtrip_lossless(spark, sf_dir, tmp_path):
    """documents → sharded JSONL → schema-pinned glob read loses
    nothing (S1/S2 for the corpus interchange format)."""
    from big_data_bowl___2023_spark.sources.io import (
        read_jsonl_glob,
        write_jsonl,
    )

    docs = load_table(spark, sf_dir, "documents")
    stage = str(tmp_path / "docs_jsonl")
    write_jsonl(docs.repartition(3), stage)
    back = read_jsonl_glob(spark, f"{stage}/part-*.json", docs.schema)
    orig = {r.doc_id: (r.text, r.lang) for r in docs.collect()}
    got = {r.doc_id: (r.text, r.lang) for r in back.collect()}
    assert got == orig


def test_brp_lsh_topk_rank_bounds(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    out = brp_lsh_topk(emb, queries, 5)
    per_q = out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("rank").alias("max_rank")).collect()
    assert per_q
    for r in per_q:
        assert r.n <= 5 and r.max_rank <= 5


def test_approx_distinct_within_rsd(spark, sf_dir):
    """HLL++ estimate within ~3 rsd of the exact distinct count."""
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    est = agg.approx_distinct(ev, [], "user_id", rsd=0.05).collect()[0][0]
    assert abs(est - exact) <= max(3, 0.15 * exact)


def test_approx_quantiles_bracket_exact_median(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.agg(F.median("value")).collect()[0][0]
    q = agg.approx_quantiles(ev, [], "value").collect()[0]["quantiles"]
    assert q[0] <= exact <= q[2]
    assert abs(q[1] - exact) < 5.0


def test_corr_matrix_against_duckdb(spark, sf_dir):
    """One-pass Pearson matrix matches DuckDB's corr() per pair and
    has a unit diagonal."""
    import duckdb

    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    got = {(r.col_a, r.col_b): r.corr
           for r in agg.corr_matrix(li, cols).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW li AS SELECT * FROM "
                f"'{sf_dir}/lineitem.parquet'")
    for (a, b), v in got.items():
        ref = con.execute(
            f"SELECT ROUND(corr({a}, {b}), 6) FROM li").fetchone()[0]
        if a == b:
            assert v == 1.0
        assert abs(v - ref) <= 1e-6


def test_simhash_sketch_matches_duckdb(spark, sf_dir):
    """dedup_simhash was demoted from the driver registry in round 4
    (the dedup_simhash_hamming oracle re-derives the sketches anyway);
    its bit-exact oracle parity is kept here."""
    import duckdb

    from big_data_bowl___2023_spark.queries.dedup_queries import (
        _simhash_oracle,
        dedup_simhash,
    )

    got = {r.doc_id: r.simhash
           for r in dedup_simhash(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    ref = dict(con.execute(_simhash_oracle()).fetchall())
    assert got == ref


def test_corpus_diff_matches_duckdb(spark, sf_dir):
    """corpus_diff vs a DuckDB full-outer re-derivation: old = the
    documents table, new = documents with one doc dropped, one
    modified, and one added."""
    import duckdb

    from big_data_bowl___2023_spark.dedup.exact import corpus_diff

    old = load_table(spark, sf_dir, "documents")
    max_id = old.agg(F.max("doc_id")).first()[0]
    new = (old.filter(F.col("doc_id") != 0)
           .withColumn("text",
                       F.when(F.col("doc_id") == 1,
                              F.concat(F.col("text"), F.lit(" edited")))
                        .otherwise(F.col("text")))
           .unionByName(old.orderBy("doc_id").limit(1).withColumn(
               "doc_id", F.lit(max_id + 1))))
    got = {(r.doc_id, r.change) for r in
           corpus_diff(old, new).collect()}
    assert (0, "removed") in got
    assert (1, "modified") in got
    assert (max_id + 1, "added") in got
    assert len(got) == 3

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    ref = set(map(tuple, con.execute(f"""
        WITH old AS (SELECT doc_id, md5(lower(trim(text))) AS fp
                     FROM documents),
        new AS (
          SELECT doc_id,
                 md5(lower(trim(CASE WHEN doc_id = 1
                                THEN text || ' edited' ELSE text END)))
                   AS fp
          FROM documents WHERE doc_id != 0
          UNION ALL
          (SELECT {max_id + 1}, md5(lower(trim(text)))
           FROM documents ORDER BY doc_id LIMIT 1))
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.fp != n.fp THEN 'modified' END AS change
        FROM old o FULL OUTER JOIN new n USING (doc_id)
        WHERE (o.doc_id IS NULL OR n.doc_id IS NULL OR o.fp != n.fp)
        """).fetchall()))
    assert got == ref


def test_p10_compound_predicate_matches_duckdb(spark, sf_dir):
    """p10_compound_predicate was demoted from the driver registry in
    round 5 (compound booleans stay driver-checked via p8/p13/f1);
    its exact oracle parity is kept here."""
    import duckdb

    from big_data_bowl___2023_spark.queries.relational import (
        P10_ORACLE,
        p10_compound_predicate,
    )

    got = {tuple(r) for r in p10_compound_predicate(spark, sf_dir)
           .collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{sf_dir}/lineitem.parquet'")
    ref = set(map(tuple, con.execute(P10_ORACLE).fetchall()))
    assert got == ref


def test_t_lang_distribution_matches_duckdb(spark, sf_dir):
    """t_lang_distribution was demoted from the driver registry in
    round 5 (tokenize/count_in_set stays driver-checked via
    t_text_features/t_quality_score); oracle parity kept here."""
    import duckdb

    from big_data_bowl___2023_spark.queries.text import (
        T_LANG_ORACLE,
        t_lang_distribution,
    )

    got = {tuple(r) for r in t_lang_distribution(spark, sf_dir)
           .collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    ref = set(map(tuple, con.execute(T_LANG_ORACLE).fetchall()))
    assert got == ref


def test_u2_except_matches_duckdb(spark, sf_dir):
    """u2_except was demoted from the driver registry in round 15 to
    free a slot for t_html_extract (U2/A9 stay driver-checked via
    j7_anti_join and the dedup distinct paths); its exact EXCEPT
    DISTINCT oracle parity is kept here."""
    import duckdb

    from big_data_bowl___2023_spark.queries.relational import (
        U2_ORACLE,
        u2_except,
    )

    got = {tuple(r) for r in u2_except(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    ref = set(map(tuple, con.execute(U2_ORACLE).fetchall()))
    assert got == ref
