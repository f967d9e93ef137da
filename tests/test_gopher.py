"""E44 — Gopher quality rules: each rule triggered by a targeted
fixture, the combined filter keeps only the clean document, DuckDB
parity for the word-count rule, and threshold overrides work."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.functions.gopher import (
    gopher_filter,
    gopher_flags,
)
from big_data_bowl___2023_spark.sources.io import load_table

GOOD = " ".join(["the quick brown fox jumps over a lazy dog near"] * 6)

FIXTURE = [
    (1, GOOD),                                     # passes everything
    (2, "too short"),                              # word count
    (3, " ".join(["a"] * 60)),                     # mean word len < 3
    (4, " ".join(["#tag…"] * 60)),                 # symbol frac (+len)
    (5, " ".join(["1234"] * 60)),                  # alpha frac
    (6, "\n".join(["same line here ok"] * 20)      # dup lines
     + "\n" + GOOD),
    (7, None),                                     # null text
]


def test_each_rule_fires_and_filter_keeps_clean(spark):
    df = spark.createDataFrame(FIXTURE, "doc_id: long, text: string")
    fl = {r.doc_id: r for r in gopher_flags(df).collect()}
    assert fl[1].pass_gopher
    assert not fl[2].pass_word_count
    assert not fl[3].pass_mean_word_len
    assert not fl[4].pass_symbol_frac
    assert not fl[5].pass_alpha_frac
    assert not fl[6].pass_dup_lines
    assert not fl[7].pass_gopher  # null fails closed
    kept = gopher_filter(df)
    assert [r.doc_id for r in kept.collect()] == [1]
    assert kept.columns == ["doc_id", "text"]


def test_word_count_rule_vs_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = (gopher_flags(docs)
           .agg(F.sum(F.col("pass_word_count").cast("long")))
           .collect()[0][0])
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'")
    oracle = con.sql("""
        SELECT SUM(CASE WHEN n BETWEEN 50 AND 100000 THEN 1 ELSE 0 END)
        FROM (SELECT len(list_filter(string_split(text, ' '),
                                     t -> t != '')) AS n
              FROM documents)""").fetchone()[0]
    assert got == oracle


def test_threshold_overrides(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    strict = gopher_filter(docs, min_words=120).count()
    loose = gopher_filter(docs, min_words=10).count()
    assert strict < loose
