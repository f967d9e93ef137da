"""DSIR importance resampling (operators/dsir.py): DuckDB oracle
parity for weights AND the Gumbel-top-k selection, domain-affinity
sanity, determinism, and the broadcast-model plan shape."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.dsir import (
    dsir_resample,
    importance_weights,
)
from big_data_bowl___2023_spark.sources.io import load_table

N_HEX, ALPHA = 3, 1.0


def _oracle(sf_dir: str, n_docs: int):
    """Weights + selection recomputed end-to-end in DuckDB: raw =
    documents, target = doc_id % 7 = 0 subset."""
    b = 16 ** N_HEX
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    grams = """
      SELECT doc_id, unnest(t) AS g FROM {src}
      UNION ALL
      SELECT doc_id, unnest(list_transform(range(1, len(t)),
                            i -> t[i] || ' ' || t[i+1])) AS g
      FROM {src}"""
    hexpoly = "+".join(
        f"(strpos('0123456789abcdef', substr(hx, {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}" for i in range(8))
    sql = f"""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                   FROM documents),
      tok_t AS (SELECT * FROM tok WHERE doc_id % 7 = 0),
      g_r AS ({grams.format(src='tok')}),
      g_t AS ({grams.format(src='tok_t')}),
      f_r AS (SELECT doc_id, substr(md5(g), 1, {N_HEX}) AS bucket,
                     count(*) AS cnt FROM g_r GROUP BY 1, 2),
      m_r AS (SELECT bucket, SUM(cnt) AS n FROM f_r GROUP BY 1),
      m_t AS (SELECT substr(md5(g), 1, {N_HEX}) AS bucket,
                     count(*) AS n FROM g_t GROUP BY 1),
      tots AS (SELECT (SELECT SUM(n) FROM m_r) + {ALPHA} * {b} AS dr,
                      (SELECT COALESCE(SUM(n), 0) FROM m_t)
                          + {ALPHA} * {b} AS dt),
      ratio AS (
        SELECT COALESCE(m_t.bucket, m_r.bucket) AS bucket,
               COALESCE(ln((m_t.n + {ALPHA}) / tots.dt),
                        ln({ALPHA} / tots.dt))
               - COALESCE(ln((m_r.n + {ALPHA}) / tots.dr),
                          ln({ALPHA} / tots.dr)) AS lw
        FROM m_t FULL JOIN m_r ON m_t.bucket = m_r.bucket, tots),
      w AS (
        SELECT f_r.doc_id,
               SUM(f_r.cnt * COALESCE(ratio.lw,
                   (SELECT ln({ALPHA} / dt) - ln({ALPHA} / dr)
                    FROM tots))) AS logw
        FROM f_r LEFT JOIN ratio ON f_r.bucket = ratio.bucket
        GROUP BY 1),
      keyed AS (
        SELECT doc_id, logw,
               logw - ln(-ln((({hexpoly.replace('hx',
                   "substr(md5(CAST(doc_id AS VARCHAR) || ':g0'), 1, 8)")})
                   + 0.5) / {float(16 ** 8)})) AS key
        FROM w)
      SELECT doc_id, logw, key FROM keyed
      ORDER BY key DESC, doc_id LIMIT {n_docs}"""
    return con.execute(sql).fetchall()


def test_weights_and_selection_match_duckdb(spark, sf_dir):
    raw = load_table(spark, sf_dir, "documents")
    target = raw.filter(F.col("doc_id") % 7 == 0)
    want = _oracle(sf_dir, n_docs=50)
    want_w = {r[0]: r[1] for r in want}

    got = dsir_resample(raw, target, n_docs=50,
                        n_hex=N_HEX, alpha=ALPHA).collect()
    assert len(got) == 50
    assert {r.doc_id for r in got} == set(want_w)
    for r in got:
        assert r.logw == pytest.approx(want_w[r.doc_id], rel=1e-9, abs=1e-9)


def test_target_like_docs_rank_higher(spark):
    """Docs written in the target domain's vocabulary must carry
    higher importance weights than off-domain docs."""
    target = spark.createDataFrame(
        [(100 + i, "apple banana cherry fruit salad apple banana")
         for i in range(5)], "doc_id long, text string")
    raw_rows = [(i, "apple banana cherry tasty fruit bowl") for i in range(10)]
    raw_rows += [(50 + i, "gearbox torque flange actuator spindle housing")
                 for i in range(10)]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    w = {r.doc_id: r.logw
         for r in importance_weights(raw, target).collect()}
    fruit = [w[i] for i in range(10)]
    metal = [w[50 + i] for i in range(10)]
    assert min(fruit) > max(metal)
    sel = dsir_resample(raw, target, n_docs=10)
    assert {r.doc_id for r in sel.collect()} == set(range(10))


def test_resample_deterministic_and_partitioning_invariant(spark, sf_dir):
    raw = load_table(spark, sf_dir, "documents")
    target = raw.filter(F.col("doc_id") % 5 == 0)
    a = {r.doc_id for r in dsir_resample(raw, target, 30).collect()}
    b = {r.doc_id for r in
         dsir_resample(raw.repartition(13), target, 30).collect()}
    assert a == b and len(a) == 30


def test_temperature_flattens_selection(spark):
    """T→∞ ignores weights (pure deterministic lottery); T=tiny is a
    near-argmax of logw. The two selections must differ on a corpus
    with a clear domain split, and tiny-T must pick the on-domain
    docs."""
    target = spark.createDataFrame(
        [(900, "alpha beta gamma alpha beta")], "doc_id long, text string")
    rows = [(i, "alpha beta gamma delta") for i in range(8)]
    rows += [(100 + i, "zeta eta theta iota kappa") for i in range(8)]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    sharp = {r.doc_id for r in
             dsir_resample(raw, target, 8, temperature=1e-6).collect()}
    assert sharp == set(range(8))
    flat = {r.doc_id for r in
            dsir_resample(raw, target, 8, temperature=1e9).collect()}
    assert flat != sharp
    assert any(d >= 100 for d in flat)


def test_model_join_is_broadcast(spark, sf_dir):
    from big_data_bowl___2023_spark import plans
    raw = load_table(spark, sf_dir, "documents")
    target = raw.filter(F.col("doc_id") % 7 == 0)
    plan = plans.formatted_plan(importance_weights(raw, target))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
