"""E33 — PII redaction: planted identifiers are scrubbed and counted;
the regex semantics replay identically in DuckDB (patterns live in the
Java-regex ∩ RE2 common subset); clean text passes through untouched."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.functions.redact import (
    PII_PATTERNS,
    redact_documents,
    redaction_report,
)
from big_data_bowl___2023_spark.sources.io import load_table

FIXTURE = [
    (1, "contact jane.doe+spam@example.co.uk or call 555-123-4567 now"),
    (2, "server at 192.168.1.100 logged ssn 123-45-6789 twice"),
    (3, "a perfectly clean sentence about spark shuffles"),
    (4, "two mails: a@b.io c.d@e.org and ip 10.0.0.1"),
]


def test_redaction_scrubs_and_preserves(spark):
    df = spark.createDataFrame(FIXTURE, ["doc_id", "text"])
    out = {r.doc_id: r.text for r in redact_documents(df).collect()}
    assert out[1] == "contact [PII-email] or call [PII-phone] now"
    assert out[2] == "server at [PII-ipv4] logged ssn [PII-ssn] twice"
    assert out[3] == FIXTURE[2][1]  # untouched
    assert out[4] == "two mails: [PII-email] [PII-email] and ip [PII-ipv4]"
    # no raw identifiers survive anywhere
    joined = " ".join(out.values())
    assert "@" not in joined and "192.168" not in joined


def test_report_counts_and_duckdb_parity(spark):
    df = spark.createDataFrame(FIXTURE, ["doc_id", "text"])
    rep = redaction_report(df).collect()[0]
    assert rep.n_email == 3 and rep.n_ipv4 == 2
    assert rep.n_phone == 1 and rep.n_ssn == 1
    assert rep.docs_with_pii == 3 and rep.n_docs == 4

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(FIXTURE, columns=["doc_id", "text"]))
    for kind, pat in PII_PATTERNS.items():
        oracle = con.sql(
            "SELECT SUM(len(regexp_extract_all(text, ?))) "
            "FROM docs", params=[pat]).fetchone()[0]
        assert oracle == rep[f"n_{kind}"], kind


def test_clean_corpus_reports_zero(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rep = redaction_report(docs).collect()[0]
    assert rep.docs_with_pii == 0  # synthetic corpus is clean
    # and redaction is then the identity on every document
    same = (redact_documents(docs)
            .join(docs.withColumnRenamed("text", "orig"), "doc_id")
            .filter(F.col("text") != F.col("orig")))
    assert same.count() == 0
