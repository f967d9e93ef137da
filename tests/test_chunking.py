"""E38 — sequence chunking: hand-counted windows, disjoint-window
reconstruction, overlap coverage, and a DuckDB list-slicing oracle
over the documents table."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.chunking import chunk_sequences
from big_data_bowl___2023_spark.sources.io import load_table


def test_hand_counted_windows(spark):
    text = " ".join(f"t{i}" for i in range(1, 11))  # 10 tokens
    df = spark.createDataFrame([(1, text), (2, "a b c"), (3, "")],
                               ["doc_id", "text"])
    out = {(r.doc_id, r.seq_idx): (r.seq_text, r.n_tokens)
           for r in chunk_sequences(df, seq_len=4, stride=2).collect()}
    # doc 1: starts at tokens 1,3,5,7 -> 4 windows, last is t7..t10
    assert out[(1, 0)] == ("t1 t2 t3 t4", 4)
    assert out[(1, 1)] == ("t3 t4 t5 t6", 4)
    assert out[(1, 2)] == ("t5 t6 t7 t8", 4)
    assert out[(1, 3)] == ("t7 t8 t9 t10", 4)
    # doc 2: shorter than seq_len -> one short window
    assert out[(2, 0)] == ("a b c", 3)
    # doc 3: empty -> no rows; doc 2 has exactly one
    assert {k[0] for k in out} == {1, 2}
    assert len(out) == 5


def test_stride_beyond_seq_len_no_empty_windows(spark):
    """Regression: n=10, L=2, S=5 — the count formula overshoots and
    would emit a start index past the last token; the empty window
    must be filtered, the real windows kept."""
    text = " ".join(f"t{i}" for i in range(1, 11))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = {r.seq_idx: (r.seq_text, r.n_tokens)
           for r in chunk_sequences(df, seq_len=2, stride=5).collect()}
    assert out == {0: ("t1 t2", 2), 1: ("t6 t7", 2)}
    assert all(n > 0 for _, n in out.values())


def test_disjoint_windows_reconstruct_document(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    chunks = chunk_sequences(docs, seq_len=7)  # stride defaults to 7
    rebuilt = (chunks.groupBy("doc_id")
               .agg(F.concat_ws(
                   " ", F.array_sort(F.collect_list(
                       F.struct("seq_idx", "seq_text"))).seq_text)
                   .alias("rebuilt")))
    diff = (docs.join(rebuilt, "doc_id")
            .filter(F.col("text") != F.col("rebuilt")))
    assert diff.count() == 0


def test_windows_vs_duckdb_oracle(spark, sf_dir):
    L, S = 8, 3
    docs = load_table(spark, sf_dir, "documents")
    got = {(r.doc_id, r.seq_idx, r.seq_text, r.n_tokens)
           for r in chunk_sequences(docs, L, S).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'")
    oracle = con.sql(f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
        seqs AS (SELECT doc_id, t,
                        unnest(range(CAST(CASE WHEN len(t) <= {L} THEN 1
                            ELSE ceil((len(t) - {L}) / {S}.0) + 1 END
                            AS BIGINT))) AS i
                 FROM toks WHERE len(t) > 0)
        SELECT doc_id, i,
               array_to_string(t[i*{S} + 1 : i*{S} + {L}], ' '),
               len(t[i*{S} + 1 : i*{S} + {L}])
        FROM seqs""").fetchall()
    assert got == {tuple(r) for r in oracle}
    assert len(got) > 0
