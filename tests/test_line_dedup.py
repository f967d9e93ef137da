"""Corpus-wide repeated-line removal (dedup/lines.py): planted
boilerplate handled per policy, short-line exemption, determinism
under repartitioning, and full-pipeline parity against a DuckDB
oracle on a multi-line corpus derived from the real documents table.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.dedup.lines import (
    remove_repeated_lines,
    repeated_line_stats,
)
from big_data_bowl___2023_spark.sources.io import load_table

FOOTER = "subscribe to our newsletter for updates and special offers"
BANNER = "this website uses cookies to improve your experience today"


def _fixture(spark):
    rows = [
        (1, f"alpha unique content first\n{FOOTER}\nmore alpha text here"),
        (2, f"{BANNER}\nbeta has its own words\n{FOOTER}"),
        (3, f"{BANNER}\ngamma writes something else entirely\nok"),
        (4, "delta is fully original\nno repeats at all in here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_stats_report(spark):
    docs = _fixture(spark)
    stats = {r.sample_line.strip(): r
             for r in repeated_line_stats(docs, min_chars=30).collect()}
    assert set(stats) == {FOOTER, BANNER}
    assert stats[FOOTER].n_occurrences == 2
    assert stats[FOOTER].n_docs == 2
    assert stats[FOOTER].first_doc == 1
    assert stats[BANNER].first_doc == 2 and stats[BANNER].first_line_no == 0


def test_keep_first_policy(spark):
    docs = _fixture(spark)
    out = {r.doc_id: r.text
           for r in remove_repeated_lines(docs, min_chars=30).collect()}
    # doc 1 holds the first FOOTER occurrence → keeps it
    assert out[1] == (
        f"alpha unique content first\n{FOOTER}\nmore alpha text here")
    # doc 2: BANNER first occurrence kept, FOOTER (second) removed
    assert out[2] == f"{BANNER}\nbeta has its own words"
    # doc 3: BANNER second occurrence removed; short 'ok' line exempt
    assert out[3] == "gamma writes something else entirely\nok"
    assert out[4] == docs.filter("doc_id = 4").first().text


def test_keep_none_policy(spark):
    docs = _fixture(spark)
    out = {r.doc_id: r.text
           for r in remove_repeated_lines(docs, min_chars=30,
                                          keep="none").collect()}
    for t in out.values():
        assert FOOTER not in t and BANNER not in t
    assert out[1] == "alpha unique content first\nmore alpha text here"


def test_all_lines_removed_yields_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, FOOTER), (2, FOOTER)], ["doc_id", "text"])
    out = {r.doc_id: r.text
           for r in remove_repeated_lines(docs, min_chars=30,
                                          keep="none").collect()}
    assert out == {1: "", 2: ""}


def test_partitioning_invariance(spark):
    docs = _fixture(spark)
    a = {(r.doc_id, r.text) for r in
         remove_repeated_lines(docs, min_chars=30).collect()}
    b = {(r.doc_id, r.text) for r in
         remove_repeated_lines(docs.repartition(7), min_chars=30)
         .collect()}
    assert a == b


def test_stats_report_partitioning_invariant(spark):
    """The audit report (sample_line included) is rerun-stable: every
    column is deterministic under arbitrary repartitioning because
    sample_line is min_by((doc, line_no)), not first()."""
    docs = _fixture(spark)
    a = {tuple(r) for r in
         repeated_line_stats(docs, min_chars=30).collect()}
    b = {tuple(r) for r in
         repeated_line_stats(docs.repartition(11), min_chars=30)
         .collect()}
    assert a == b
    # sample_line is specifically the text at (first_doc, first_line_no)
    for r in repeated_line_stats(docs, min_chars=30).collect():
        src = docs.filter(F.col("doc_id") == r.first_doc).first().text
        assert src.split("\n")[r.first_line_no] == r.sample_line


def test_regex_special_delimiter_roundtrips(spark):
    """A regex-special delimiter ('|') is treated as a literal on the
    split side and the rejoin side — no silent corruption."""
    long_a = "this segment repeats verbatim across both documents"
    rows = [(1, f"unique one alpha beta|{long_a}|tail one here"),
            (2, f"{long_a}|unique two gamma delta something")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.text
           for r in remove_repeated_lines(
               docs, min_chars=30, delimiter="|").collect()}
    assert out[1] == f"unique one alpha beta|{long_a}|tail one here"
    assert out[2] == "unique two gamma delta something"


def test_matches_duckdb_oracle_on_documents(spark, sf_dir):
    """Full-pipeline parity on real data: both engines derive the
    same multi-line corpus from documents.parquet (every ' merge '
    becomes a newline), then remove corpus-wide repeated lines with
    the keep-first rule."""
    min_chars = 10
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id",
                    F.regexp_replace("text", " merge ", "\n")
                     .alias("text")))
    got = {r.doc_id: r.text
           for r in remove_repeated_lines(docs, min_chars=min_chars)
           .collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    ref = dict(con.execute(f"""
        WITH src AS (
          SELECT doc_id, replace(text, ' merge ', chr(10)) AS text
          FROM documents),
        splits AS (
          SELECT doc_id, string_split(text, chr(10)) AS parts
          FROM src),
        pos AS (
          SELECT doc_id, unnest(range(1, len(parts) + 1)) AS i
          FROM splits),
        lines AS (
          SELECT p.doc_id, p.i - 1 AS line_no, s.parts[p.i] AS line
          FROM pos p JOIN splits s USING (doc_id)),
        keyed AS (
          SELECT doc_id, line_no, line,
                 CASE WHEN length(trim(line)) >= {min_chars}
                      THEN md5(trim(line)) END AS h
          FROM lines),
        rep AS (
          SELECT h, MIN(doc_id * 1000000 + line_no) AS first_key
          FROM keyed WHERE h IS NOT NULL
          GROUP BY h HAVING COUNT(*) > 1),
        kept AS (
          SELECT k.doc_id, k.line_no, k.line
          FROM keyed k LEFT JOIN rep r ON k.h = r.h
          WHERE r.h IS NULL
             OR k.doc_id * 1000000 + k.line_no = r.first_key)
        SELECT s.doc_id,
               COALESCE(
                 (SELECT string_agg(kk.line, chr(10)
                                    ORDER BY kk.line_no)
                  FROM kept kk WHERE kk.doc_id = s.doc_id), '')
        FROM src s""").fetchall())
    assert got == ref


def test_duplication_profile_matches_duckdb(spark, sf_dir):
    """Per-doc duplication fraction vs a DuckDB re-derivation on real
    documents (trigram shingles, distinct per doc)."""
    from big_data_bowl___2023_spark.dedup.ngram import (
        duplication_profile,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = {r.doc_id: (r.n_shingles, r.n_duplicated, r.dup_fraction)
           for r in duplication_profile(docs, n=3).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    ref = {d: (ns, nd, round(nd / ns, 6)) for d, ns, nd in con.execute("""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
          FROM documents),
        pos AS (
          SELECT doc_id, unnest(range(1, len(t) - 1)) AS i
          FROM toks WHERE len(t) >= 3),
        sh AS (
          SELECT DISTINCT p.doc_id,
                 array_to_string(t[p.i : p.i + 2], ' ') AS shingle
          FROM pos p JOIN toks USING (doc_id)),
        freq AS (
          SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
        SELECT s.doc_id, COUNT(*) AS n_shingles,
               SUM(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS n_dup
        FROM sh s JOIN freq f USING (shingle)
        GROUP BY s.doc_id""").fetchall()}
    assert got == ref


def test_duplication_profile_planted_extremes(spark):
    from big_data_bowl___2023_spark.dedup.ngram import (
        duplication_profile,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # exact clone
        (3, "one unique sentence nobody else wrote here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.dup_fraction
           for r in duplication_profile(docs, n=3).collect()}
    assert got[1] == 1.0 and got[2] == 1.0   # every shingle shared
    assert got[3] == 0.0


def test_regex_quote_split_rejoin_identity(spark):
    """For any delimiter — regex metacharacters, '\\E' (the quote
    escape itself), multi-char — split on the quoted pattern then
    rejoin with the literal delimiter reconstructs the text."""
    from big_data_bowl___2023_spark.dedup.lines import _regex_quote

    delims = [".", "|", "**", "$^", "\\E", "a.b", "(", "[]", "\t",
              ".*+?", "\\Q"]
    text_parts = ["alpha", "beta gamma", "", "delta"]
    rows = []
    for i, d in enumerate(delims):
        rows.append((i, d, d.join(text_parts)))
    df = spark.createDataFrame(rows, ["i", "delim", "text"])
    for i, d in enumerate(delims):
        got = (df.filter(F.col("i") == i)
               .select(F.array_join(
                   F.split(F.col("text"), _regex_quote(d)),
                   d).alias("r"))
               .first().r)
        assert got == d.join(text_parts), repr(d)
