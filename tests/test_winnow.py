"""Winnowing fingerprints (dedup/winnow.py): DuckDB oracle parity on
the real documents table, the SIGMOD'03 shared-substring guarantee on
planted fixtures, density bounds, and hot-fingerprint capping."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.dedup.winnow import (
    fingerprint_overlap_pairs,
    kgram_hashes,
    winnow_fingerprints,
)
from big_data_bowl___2023_spark.sources.io import load_table

K, W = 3, 4


def _oracle_fps(sf_dir: str, k: int = K, w: int = W):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'")
    return con.execute(f"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
          FROM documents),
        kgpos AS (
          SELECT doc_id, unnest(range(1, len(t) - {k - 2})) AS pos
          FROM toks WHERE len(t) >= {k}),
        kg AS (
          SELECT p.doc_id, p.pos,
                 md5(array_to_string(t[p.pos : p.pos + {k - 1}], ' ')) AS kh
          FROM kgpos p JOIN toks USING (doc_id)),
        win AS (
          SELECT doc_id, pos,
                 min(kh || ':' || lpad(CAST(pos AS VARCHAR), 12, '0'))
                     OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW
                           AND {w - 1} FOLLOWING) AS wmin,
                 count(*) OVER (PARTITION BY doc_id) AS n_kg
          FROM kg),
        sel AS (SELECT DISTINCT doc_id, wmin FROM win
                WHERE pos <= n_kg - {w - 1})
        SELECT doc_id, CAST(substr(wmin, 34, 12) AS BIGINT) AS fp_pos,
               substr(wmin, 1, 32) AS fp
        FROM sel""").fetchall()


def test_fingerprints_match_duckdb_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = {(r.doc_id, r.fp_pos, r.fp)
           for r in winnow_fingerprints(docs, K, W).collect()}
    want = set(map(tuple, _oracle_fps(sf_dir)))
    assert got == want and got


def test_shared_substring_guarantee(spark):
    """Any shared token run of length >= w + k - 1 must yield >= 1
    shared fingerprint (the winnowing theorem) — planted overlap of
    exactly w + k - 1 tokens across otherwise-disjoint documents."""
    run = " ".join(f"shared{i}" for i in range(W + K - 1))
    rows = [
        (1, "alpha beta gamma " + run + " delta epsilon zeta"),
        (2, "one two three four " + run + " five six seven"),
        (3, "totally unrelated words only here nothing common at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b)
             for r in fingerprint_overlap_pairs(docs, K, W).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_no_shared_kgram_no_pair(spark):
    rows = [(1, "aa bb cc dd ee ff gg hh"),
            (2, "ii jj kk ll mm nn oo pp")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert fingerprint_overlap_pairs(docs, K, W).count() == 0


def test_density_and_coverage_bounds(spark, sf_dir):
    """Winnowing selects one fingerprint per full window, so per doc:
    n_fp <= n_kgrams (trivial) and n_fp >= ceil(n_windows / w) (each
    selection can cover at most w windows); expected density ~2/(w+1)
    of k-grams."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    kg = (kgram_hashes(docs, K).groupBy("doc_id")
          .agg(F.count(F.lit(1)).alias("n_kg")))
    fp = (winnow_fingerprints(docs, K, W).groupBy("doc_id")
          .agg(F.count(F.lit(1)).alias("n_fp")))
    joined = kg.join(fp, "doc_id").collect()
    assert joined
    for r in joined:
        n_windows = r.n_kg - (W - 1)
        if n_windows <= 0:
            continue
        assert r.n_fp <= r.n_kg
        assert r.n_fp >= -(-n_windows // W), r.doc_id


def test_max_doc_freq_caps_hot_fingerprints(spark):
    """A boilerplate run shared by MANY docs is dropped by the DF cap
    (no d^2 pair blowup), while a rare overlap is kept."""
    boiler = " ".join(f"b{i}" for i in range(W + K - 1))
    rare = " ".join(f"r{i}" for i in range(W + K - 1))
    rows = [(i, f"doc number {i} starts " + boiler + f" filler{i} end{i}")
            for i in range(40)]
    rows += [(100, "left unique words " + rare + " tail one"),
             (101, "right other tokens " + rare + " tail two")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = fingerprint_overlap_pairs(docs, K, W, max_doc_freq=10)
    pairs = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (100, 101) in pairs
    # boilerplate-only pairs are gone: nothing pairs the 40 clones
    assert not any(a < 40 and b < 40 for a, b in pairs)


def test_fingerprints_partitioning_invariant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    base = {(r.doc_id, r.fp_pos, r.fp)
            for r in winnow_fingerprints(docs, K, W).collect()}
    rep = {(r.doc_id, r.fp_pos, r.fp)
           for r in winnow_fingerprints(docs.repartition(13), K, W).collect()}
    assert base == rep
