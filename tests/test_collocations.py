"""PMI/NPMI collocation mining (E119, operators/collocations.py):
bigram/unigram counts and scores against a DuckDB oracle on the real
documents table, plus hand-checked properties on constructed text."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.collocations import (
    bigram_counts,
    collocations,
)
from big_data_bowl___2023_spark.sources.io import load_table

# the oracle's tokenization = text.norm_tokens: lower, trim, collapse
# whitespace, split on single spaces (post-collapse), drop empties.
_ORACLE = r"""
WITH split AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(lower(text)),
                                     '\s+', ' ', 'g'), ' ') AS arr
  FROM docs
),
toks AS (
  SELECT doc_id, arr[i+1] AS word, i AS pos
  FROM split, UNNEST(range(len(arr))) AS t(i)
  WHERE arr[i+1] <> ''
),
big AS (
  SELECT a.word AS "left", b.word AS "right", COUNT(*) AS n
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2
),
uni AS (SELECT word, COUNT(*) AS nw FROM toks GROUP BY 1),
tot AS (SELECT (SELECT SUM(n) FROM big) AS N,
               (SELECT SUM(nw) FROM uni) AS Nw)
SELECT big."left", big."right", big.n AS n_pair,
       l.nw AS n_left, r.nw AS n_right,
       ROUND({score}, 6) AS score
FROM big, tot
JOIN uni l ON big."left" = l.word
JOIN uni r ON big."right" = r.word
WHERE big.n >= {min_count}
"""
_PMI = "LN((big.n / tot.N) / ((l.nw / tot.Nw) * (r.nw / tot.Nw)))"
_NPMI = f"({_PMI}) / (-LN(big.n / tot.N))"


def _oracle(pdf, metric, min_count):
    con = duckdb.connect()
    con.register("docs", pdf)
    q = _ORACLE.format(
        score=_PMI if metric == "pmi" else _NPMI,
        min_count=min_count)
    return {(r[0], r[1]): (r[2], r[3], r[4], r[5])
            for r in con.execute(q).fetchall()}


@pytest.mark.parametrize("metric", ["pmi", "npmi"])
def test_matches_duckdb_oracle_on_documents(spark, sf_dir, metric):
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text")
    got = {(r["left"], r["right"]):
           (r["n_pair"], r["n_left"], r["n_right"], r["score"])
           for r in collocations(docs, min_count=5,
                                 metric=metric).collect()}
    want = _oracle(docs.toPandas(), metric, 5)
    assert got == want and len(got) > 10


def test_npmi_hand_properties(spark):
    """A pair that ONLY ever occurs together scores NPMI 1-ish; a
    pair occurring at independence scores ~0; min_count cuts hapax
    noise; top_k is total-ordered."""
    rows = [(i, "zig zag filler%d common" % i) for i in range(20)]
    rows += [(100 + i, "common filler%d" % i) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["left"], r["right"]): r["score"]
           for r in collocations(docs, min_count=5,
                                 metric="npmi").collect()}
    # 'zig zag' co-occur always and only together
    assert ("zig", "zag") in out
    assert out[("zig", "zag")] > 0.8
    # hapax pairs (filler%d ...) are cut by min_count
    assert not any(left.startswith("filler") for left, _ in out)
    top = collocations(docs, min_count=5, metric="npmi",
                       top_k=1).collect()
    assert len(top) == 1 and top[0]["left"] == "zig"
    with pytest.raises(ValueError, match="metric"):
        collocations(docs, metric="nope").collect()


def test_bigrams_respect_document_boundaries(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")],
        "doc_id long, text string")
    got = {(r["left"], r["right"]): r["n"]
           for r in bigram_counts(docs).collect()}
    # no cross-document ('beta','beta') or ('beta','gamma') from
    # doc 1's tail meeting doc 2's head: exactly the two in-doc pairs
    assert got == {("alpha", "beta"): 1, ("beta", "gamma"): 1}


def test_plan_shape(spark, sf_dir):
    """Two grouped counts + broadcast totals: no cartesian beyond the
    one-row broadcast cross joins, no single-partition window."""
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text")
    plan = collocations(docs, min_count=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
