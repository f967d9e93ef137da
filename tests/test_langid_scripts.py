"""Unicode-script language-ID coverage (verdict r15 #3): the marker-
stopword tier is space-delimited-script only, so Chinese/Japanese/
Korean/Thai read 'und' without the script-fraction tier. These pin
the two-tier `detect_lang` on CJK fixtures, the integer-ratio
threshold boundary, and bit-exact DuckDB parity of the extended
`t_text_features` oracle CASE on the same fixtures.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.functions import text as Tx

FIXTURES = [
    # (doc_id, text, expected lang)
    (1, "the cat sat on a mat and the dog is here", "en"),
    (2, "el perro y la casa que los gatos las ven", "es"),
    (3, "人工知能は計算機科学の一分野であり、ひらがなとカタカナを含む。", "ja"),
    (4, "機器學習是人工智能的一個分支，研究計算機算法。", "zh"),
    (5, "기계 학습은 인공 지능의 한 분야이다.", "ko"),
    (6, "การเรียนรู้ของเครื่องเป็นสาขาหนึ่งของปัญญาประดิษฐ์", "th"),
    (7, "", "und"),
    (8, "12345 67890 !!!", "und"),
    # kanji-heavy Japanese: Han dominates but kana >= 5% still wins
    (9, "東京都新宿区西新宿の超高層建築物群は昭和時代に建設された。です。", "ja"),
    # a CJK quote inside English text below every threshold stays en
    (10, "the word 中 is a Han character and the text is English", "en"),
]


def _preds(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {r["doc_id"]: r["lang"]
            for r in df.select(
                "doc_id",
                Tx.detect_lang(F.col("text")).alias("lang")).collect()}


def test_cjk_fixtures_classify(spark):
    got = _preds(spark, [(i, t) for i, t, _ in FIXTURES])
    want = {i: lang for i, _, lang in FIXTURES}
    assert got == want


def test_threshold_boundary_integer_exact(spark):
    """kana/nonspace >= 1/20 is compared as kana*20 >= nonspace —
    exactly one kana char among 20 nonspace chars passes, among 21
    fails. No float division anywhere to diverge from the oracle."""
    kana19 = (19, "あ" + "x" * 19, None)    # 1/20 -> ja
    kana20 = (20, "あ" + "x" * 20, None)    # 1/21 -> und (x isn't a marker)
    got = _preds(spark, [(i, t) for i, t, _ in (kana19, kana20)])
    assert got[19] == "ja"
    assert got[20] == "und"
    # Han main threshold 3/20: 3 of 20 passes, 3 of 21 fails
    han3_20 = (21, "中中中" + "x" * 17, None)
    han3_21 = (22, "中中中" + "x" * 18, None)
    got = _preds(spark, [(i, t) for i, t, _ in (han3_20, han3_21)])
    assert got[21] == "zh"
    assert got[22] == "und"


def test_ja_priority_over_zh(spark):
    """A Han+kana mix is Japanese even when Han chars dominate —
    the kana tier is checked first by construction (15 ideograph
    pairs + です = 6.25% kana, above the 5% tier; Han is at 94%,
    far above its own 15% tier, and must NOT win)."""
    got = _preds(spark, [(1, "漢字" * 15 + "です")])
    assert got[1] == "ja"


def test_oracle_case_parity_on_fixtures(spark):
    """The extended t_text_features oracle CASE (DuckDB, RE2) and
    the Spark detect_lang column agree row-by-row on the CJK
    fixtures — same patterns, same integer-ratio compares."""
    import duckdb

    from big_data_bowl___2023_spark import registry

    sql = registry.all_oracles()["t_text_features"]
    rows = [(i, t) for i, t, _ in FIXTURES]
    sdf = spark.createDataFrame(rows, "doc_id int, text string")
    spark_out = {r["doc_id"]: r["lang_pred"]
                 for r in sdf.select(
                     "doc_id",
                     Tx.detect_lang(F.col("text")).alias("lang_pred")
                 ).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    duck_out = {i: lang for i, lang in con.execute(
        f"SELECT doc_id, lang_pred FROM ({sql})").fetchall()}
    assert spark_out == duck_out


def test_lang_keep_gate_passes_cjk(spark):
    """The curation lang_keep gate can now target a CJK corpus —
    the r15 limitation (CJK reads 'und', so no gate value could
    keep it) is gone."""
    from big_data_bowl___2023_spark.pipelines.curation import (
        curation_frame,
    )
    rows = [(1, "機器學習是人工智能的一個分支，研究計算機算法。" * 4, "web"),
            (2, "the quick brown fox jumps over the lazy dog " * 5, "web")]
    docs = spark.createDataFrame(
        rows, "doc_id int, text string, source string")
    seen = {}

    def hook(name, frame):
        seen[name] = frame
        return frame

    curation_frame(docs, min_words=0, lang_keep=["zh"],
                   stage_hook=hook)
    kept = seen["after_lang_filter"].select("doc_id").collect()
    # the GATE passes the zh doc and drops the en one; later
    # English-tuned Gopher word-shape rules are a separate stage
    # (and legitimately drop space-free text unless retuned)
    assert [r["doc_id"] for r in kept] == [1]


def test_detect_lang_stays_shuffle_free(spark):
    """Script counts are regexp_count projections — the feature scan
    must stay a zero-Exchange codegen pass."""
    df = spark.createDataFrame(
        [(1, "中文")], "doc_id int, text string")
    plan = (df.select(Tx.detect_lang(F.col("text")).alias("l"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
