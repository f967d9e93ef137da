"""Cross-document packed-sequence assembly: hand-derived span fixture,
DuckDB span-math oracle on real documents, lossless/exact-fill
invariants, determinism, and the no-text-shuffle plan claim."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.functions import text as Tx
from big_data_bowl___2023_spark.operators.chunking import (
    assemble_sequences,
    sequence_manifest,
)
from big_data_bowl___2023_spark.plans.explain import formatted_plan
from big_data_bowl___2023_spark.sources.io import load_table


def _hand_spans(sizes_in_order, seq_len, sep):
    """Python oracle: walk the concatenated stream doc by doc."""
    out = []
    pos = 0
    for doc_id, n in sizes_in_order:
        start, end = pos, pos + n
        k = start // seq_len
        while k * seq_len < end:
            s, e = max(start, k * seq_len), min(end, (k + 1) * seq_len)
            out.append((k, doc_id, s - start, s - k * seq_len, e - s))
            k += 1
        pos = end + sep
    return sorted(out)


def _order(spark, df, id_col="doc_id"):
    """The operator's deterministic doc order (id-hash asc)."""
    return [(r.doc_id, r.n) for r in
            df.select("doc_id", "n",
                      F.xxhash64(F.col(id_col)).alias("h"))
            .orderBy("h", "doc_id").collect()]


def test_hand_fixture_exact_spans(spark):
    # token counts 5, 3, 7 over seq_len 4, sep 1
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h"), (3, "i j k l m n o")],
        ["doc_id", "text"])
    sized = docs.select("doc_id",
                        Tx.token_count(F.col("text")).alias("n"))
    order = _order(spark, sized)
    want = _hand_spans(order, seq_len=4, sep=1)
    got = sorted((r.seq_id, r.doc_id, r.doc_offset, r.seq_offset,
                  r.span_len)
                 for r in assemble_sequences(docs, 4).collect())
    assert got == want


@pytest.mark.parametrize("seq_len,sep", [(128, 1), (64, 0), (50, 2)])
def test_real_docs_vs_duckdb_span_oracle(spark, sf_dir, seq_len, sep):
    """Span arithmetic cross-checked in SQL: same sizes, same order,
    generate_series over the covered sequence ids."""
    docs = load_table(spark, sf_dir, "documents")
    sized = (docs.select("doc_id",
                         Tx.token_count(F.col("text")).alias("n"))
             .filter(F.col("n") > 0)
             .select("doc_id", "n",
                     F.xxhash64(F.col("doc_id")).alias("h")))
    pdf = sized.toPandas()
    con = duckdb.connect()
    con.register("sized", pdf)
    want = {tuple(r) for r in con.execute(f"""
        with ordered as (
          select doc_id, n,
                 sum(n + {sep}) over (order by h, doc_id
                     rows between unbounded preceding and current row)
                 - n - {sep} as start
          from sized),
        spans as (
          select doc_id, n, start,
                 unnest(generate_series(
                     cast(start // {seq_len} as bigint),
                     cast((start + n - 1) // {seq_len} as bigint)))
                   as seq_id
          from ordered)
        select seq_id, doc_id,
               greatest(seq_id * {seq_len} - start, 0) as doc_offset,
               greatest(start - seq_id * {seq_len}, 0) as seq_offset,
               least(start + n, (seq_id + 1) * {seq_len})
                 - greatest(start, seq_id * {seq_len}) as span_len
        from spans""").fetchall()}
    got = {(r.seq_id, r.doc_id, r.doc_offset, r.seq_offset, r.span_len)
           for r in assemble_sequences(
               docs, seq_len, sep_tokens=sep).collect()}
    assert got == want and got


def test_invariants_and_manifest(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    seq_len = 100
    spans = assemble_sequences(docs, seq_len, sep_tokens=1)
    # lossless: per-doc span lengths sum to the doc's token count
    per_doc = {r.doc_id: r.tot for r in
               spans.groupBy("doc_id")
               .agg(F.sum("span_len").alias("tot")).collect()}
    sizes = {r.doc_id: r.n for r in
             docs.select("doc_id",
                         Tx.token_count(F.col("text")).alias("n"))
             .filter(F.col("n") > 0).collect()}
    assert per_doc == sizes
    # no sequence overflows; interior sequences are full up to their
    # separator share (>= seq_len - n_docs*sep real tokens)
    man = sequence_manifest(spans).collect()
    last = max(r.seq_id for r in man)
    for r in man:
        assert r.n_tokens <= seq_len
        if r.seq_id != last:
            assert r.n_tokens >= seq_len - r.n_docs  # sep_tokens=1
        # manifest spans are seq-offset ordered and contiguous-safe
        offs = [s.seq_offset for s in r.spans]
        assert offs == sorted(offs)


def test_determinism_and_group_split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, assemble_sequences(
        docs.repartition(3), 64).collect()))
    b = sorted(map(tuple, assemble_sequences(
        docs.repartition(17), 64).collect()))
    assert a == b
    # grouped: each source packs its own stream; ids restart per group
    g = assemble_sequences(docs, 64, group_cols=("source",))
    starts = (g.groupBy("source")
              .agg(F.min("seq_id").alias("mn")).collect())
    assert all(r.mn == 0 for r in starts)


def test_no_text_in_the_window_plan(spark, sf_dir):
    """Only (id, token-count) rows enter the running-sum shuffle —
    the text column is pruned before the exchange."""
    import re

    docs = load_table(spark, sf_dir, "documents")
    plan = formatted_plan(assemble_sequences(docs, 128))
    # formatted detail block: "(k) Exchange\nInput [n]: [cols...]"
    blocks = re.findall(r"\(\d+\) Exchange[^\n]*\nInput[^\n]*", plan)
    assert blocks, "window implies one exchange"
    for b in blocks:
        assert "text#" not in b, b


def test_validation(spark):
    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        assemble_sequences(docs, 0)
    with pytest.raises(ValueError):
        assemble_sequences(docs, 8, sep_tokens=-1)
