"""Source overlap matrix (dedup audit) and compression-ratio quality
signal: DuckDB/python-zlib oracle parity plus plan shape."""

from __future__ import annotations

import zlib

import duckdb
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.dedup import source_overlap_matrix
from big_data_bowl___2023_spark.functions.text import compression_signal
from big_data_bowl___2023_spark.plans.explain import formatted_plan
from big_data_bowl___2023_spark.sources.io import load_table


def test_source_overlap_hand_fixture(spark):
    docs = spark.createDataFrame(
        [(1, "cc"), (2, "cc"), (3, "wiki"), (4, "books"), (5, "wiki")],
        ["doc_id", "source"])
    pairs = spark.createDataFrame(
        [(1, 2),      # cc-cc (diagonal)
         (1, 3),      # cc-wiki
         (3, 1),      # wiki-cc -> canonicalizes onto the same cell
         (4, 5),      # books-wiki
         (2, 5)],     # cc-wiki
        ["doc_a", "doc_b"])
    got = {(r.source_a, r.source_b, r.n_pairs)
           for r in source_overlap_matrix(pairs, docs).collect()}
    assert got == {("cc", "cc", 1), ("cc", "wiki", 3),
                   ("books", "wiki", 1)}


def test_source_overlap_vs_duckdb(spark, sf_dir):
    """Synthetic id-derived pair set over the real documents table;
    oracle recomputes the canonicalized matrix in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = (docs.select(F.col("doc_id").alias("doc_a"))
             .filter(F.col("doc_a") % 3 == 0)
             .withColumn("doc_b", F.col("doc_a") + 1))
    got = {(r.source_a, r.source_b, r.n_pairs)
           for r in source_overlap_matrix(pairs, docs).collect()}
    want = {tuple(r) for r in duckdb.sql(f"""
        with d as (select doc_id, source
                   from read_parquet('{sf_dir}/documents.parquet')),
        p as (select doc_id as doc_a, doc_id + 1 as doc_b
              from d where doc_id % 3 = 0)
        select least(da.source, db.source)    as source_a,
               greatest(da.source, db.source) as source_b,
               count(*)                       as n_pairs
        from p join d da on p.doc_a = da.doc_id
               join d db on p.doc_b = db.doc_id
        group by 1, 2""").fetchall()}
    assert got == want and got


def test_compression_ratio_matches_zlib(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    got = {r.doc_id: r.compression_ratio
           for r in compression_signal(docs).collect()}
    for r in docs.collect():
        raw = r.text.encode("utf-8")
        want = len(zlib.compress(raw, 6)) / len(raw) if raw else 1.0
        assert got[r.doc_id] == want


def test_compression_ordering_and_edges(spark):
    df = spark.createDataFrame(
        [(1, "spam " * 200),                       # hyper-repetitive
         (2, "The quarterly report outlines divergent revenue "
             "trajectories across geographies and product lines, "
             "with commentary on currency headwinds."),
         (3, ""), (4, None)],
        "doc_id long, text string")
    out = {r.doc_id: r.compression_ratio
           for r in compression_signal(df).collect()}
    assert out[1] < 0.2 < out[2]        # boilerplate vs prose
    assert out[3] == 1.0 and out[4] == 1.0


def test_compression_plan_mapside(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = formatted_plan(compression_signal(docs))
    assert "Exchange" not in plan


def test_source_overlap_null_source_stays_distinct(spark):
    """least/greatest skip NULLs — the null-safe canonicalization must
    keep a NULL-source doc as its own matrix row instead of collapsing
    the pair onto the other source's diagonal."""
    docs = spark.createDataFrame(
        [(1, None), (2, "web"), (3, "web")],
        "doc_id long, source string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], ["doc_a", "doc_b"])
    got = {(r.source_a, r.source_b, r.n_pairs)
           for r in source_overlap_matrix(pairs, docs).collect()}
    assert got == {(None, "web", 1), ("web", "web", 1)}
