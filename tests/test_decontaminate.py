"""E25 — benchmark decontamination: hand fixture with planted
contamination, a DuckDB oracle cross-check on the documents table, and
a plan assertion that the benchmark side is broadcast (no corpus
shuffle for the match)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.dedup import (
    contamination_report,
    decontaminate,
)
from big_data_bowl___2023_spark.sources.io import load_table


def test_planted_contamination(spark):
    bench = spark.createDataFrame(
        [(100, "the capital of france is paris and it is large")],
        ["bench_id", "text"])
    docs = spark.createDataFrame(
        [(1, "trivia time the capital of france is paris and it is "
             "large says the quiz"),                      # contains passage
         (2, "a completely unrelated document about spark joins and "
             "shuffles at petabyte scale with long text"),
         (3, "capital of france no leak here just a mention")],
        ["doc_id", "text"])

    rep = contamination_report(docs, bench, n=8).collect()
    assert {(r.doc_id, r.bench_id) for r in rep} == {(1, 100)}
    # doc 1 holds the 10-token passage -> 10-8+1 = 3 distinct 8-grams
    assert rep[0].n_overlap == 3

    clean = decontaminate(docs, bench, n=8)
    assert {r.doc_id for r in clean.collect()} == {2, 3}
    assert clean.columns == docs.columns


def test_report_vs_duckdb_oracle(spark, sf_dir):
    """documents split: doc_id % 10 == 0 plays the benchmark role,
    n = 3 word-grams so the synthetic corpus actually collides."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    bench = (docs.filter(F.col("doc_id") % 10 == 0)
             .select(F.col("doc_id").alias("bench_id"), "text"))

    got = {(r.doc_id, r.bench_id, r.n_overlap)
           for r in contamination_report(corpus, bench, n=3).collect()}

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'")
    oracle = con.sql("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      unnest(list_transform(range(1, len(t) - 1),
                             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                          AS s
               FROM toks)
        SELECT c.doc_id, b.doc_id AS bench_id, COUNT(*) AS n_overlap
        FROM sh c JOIN sh b ON c.s = b.s
        WHERE c.doc_id % 10 != 0 AND b.doc_id % 10 = 0
        GROUP BY 1, 2""").fetchall()
    assert got == {(a, b, n) for a, b, n in oracle}
    assert len(got) > 0


def test_benchmark_side_is_broadcast(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = (docs.filter(F.col("doc_id") % 10 == 0)
             .select(F.col("doc_id").alias("bench_id"), "text"))
    plan = contamination_report(
        docs, bench, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_min_overlap_1_fast_path_matches_report_path(spark, sf_dir):
    """r16: the semi-join fast path in contaminated_doc_ids must flag
    exactly the docs the per-pair report path flags at min_overlap=1
    — same corpus, same benchmark, row-for-row."""
    from pyspark.sql import functions as F

    from big_data_bowl___2023_spark.dedup.decontaminate import (
        contaminated_doc_ids,
        contamination_report,
    )
    from big_data_bowl___2023_spark.sources.io import load_table

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id",
                    F.regexp_replace("text", " merge ", "\n")
                    .alias("text")))
    benchmark = (docs.filter(F.col("doc_id") % 97 == 0)
                 .select(F.col("doc_id").alias("bench_id"), "text"))
    fast = sorted(r.doc_id for r in
                  contaminated_doc_ids(docs, benchmark).collect())
    want = sorted(r.doc_id for r in
                  contamination_report(docs, benchmark, min_overlap=1)
                  .select("doc_id").distinct().collect())
    assert fast == want
    assert len(fast) > 0        # the fixture corpus must exercise it
