"""Per-source corpus data card: DuckDB oracle for the SQL-expressible
columns, python re-aggregation for the signal columns (whose per-doc
kernels carry their own oracles elsewhere), and plan shape."""

from __future__ import annotations

import statistics
import zlib

import duckdb
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.pipelines.curation import corpus_profile
from big_data_bowl___2023_spark.plans.explain import formatted_plan
from big_data_bowl___2023_spark.sources.io import load_table


def _card(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs, {r.source: r.asDict()
                  for r in corpus_profile(docs).collect()}


def test_counts_tokens_dups_vs_duckdb(spark, sf_dir):
    docs, card = _card(spark, sf_dir)
    want = {r[0]: r for r in duckdb.sql(f"""
        with d as (select *,
                     len(string_split(text, ' ')) as tok,
                     md5(text) as fp
                   from read_parquet('{sf_dir}/documents.parquet')),
        dups as (select source, count(*) as n_dup from d
                 where fp in (select fp from d group by fp
                              having count(*) > 1)
                 group by source)
        select d.source, count(*) as n_docs, sum(tok) as n_tokens,
               round(avg(tok), 6) as avg_tokens,
               round(coalesce(any_value(n_dup), 0)
                     / count(*), 6) as dup_rate
        from d left join dups on d.source = dups.source
        group by d.source""").fetchall()}
    assert set(card) == set(want) and card
    for src, w in want.items():
        c = card[src]
        assert (c["n_docs"], c["n_tokens"]) == (w[1], w[2])
        assert c["avg_tokens"] == float(w[3])
        assert c["exact_dup_rate"] == float(w[4])


def test_signal_columns_match_per_doc_kernels(spark, sf_dir):
    """The card's averaged signals equal python aggregation of the
    same per-doc expressions (each kernel is oracle-tested in its own
    suite; this pins the card's wiring and rounding)."""
    from big_data_bowl___2023_spark.functions import text as Tx
    from big_data_bowl___2023_spark.functions.gopher import all_pass
    from big_data_bowl___2023_spark.functions.text import detect_lang

    docs, card = _card(spark, sf_dir)
    per_doc = (docs.select(
        "source", "text",
        all_pass(F.col("text")).cast("double").alias("p"),
        Tx.quality_score(F.col("text")).alias("q"),
        (detect_lang(F.col("text")) == "en").cast("double").alias("en"))
        .collect())
    by_src: dict = {}
    for r in per_doc:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        c = card[src]
        assert c["gopher_pass_rate"] == round(
            sum(r.p for r in rows) / len(rows), 6)
        assert c["mean_quality"] == round(
            sum(r.q for r in rows) / len(rows), 6)
        assert c["en_share"] == round(
            sum(r.en for r in rows) / len(rows), 6)
        comp = sorted(
            len(zlib.compress(r.text.encode())) / len(r.text.encode())
            for r in rows)
        assert c["compression_p50"] == round(
            statistics.median(comp), 6)


def test_profile_plan_shape(spark, sf_dir):
    """Signal agg + fingerprint window + final broadcast join — no
    cartesian, dup tally broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    plan = formatted_plan(corpus_profile(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
