"""Driver-checked text-analysis queries over ``documents`` (north-star
extensions: language-ID, quality scoring, token counting, document
fingerprinting). All pure built-in expressions — no UDFs — with exact
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import html as Hx
from ..functions import text as Tx
from ..registry import query
from ._util import load_table

_EN = ", ".join(f"'{w}'" for w in Tx.LANG_MARKERS["en"])
_ES = ", ".join(f"'{w}'" for w in Tx.LANG_MARKERS["es"])
_FR = ", ".join(f"'{w}'" for w in Tx.LANG_MARKERS["fr"])
_DE = ", ".join(f"'{w}'" for w in Tx.LANG_MARKERS["de"])


# Registry curation (round 2): t_token_count, t_fingerprint and
# t_langid were one projection each over the same scan; they are now
# one driver-checked query (one pass computes all three features — the
# shape a curation pipeline actually runs at 100 TB).

@query(
    "t_text_features",
    fr"""WITH scored AS (
          SELECT doc_id, text,
                 len(list_filter(string_split(text,' '), x -> x IN ({_EN}))) AS s_en,
                 len(list_filter(string_split(text,' '), x -> x IN ({_ES}))) AS s_es,
                 len(list_filter(string_split(text,' '), x -> x IN ({_FR}))) AS s_fr,
                 len(list_filter(string_split(text,' '), x -> x IN ({_DE}))) AS s_de,
                 len(regexp_extract_all(text, '{Tx.SCRIPT_RANGES["ja"]}')) AS c_ja,
                 len(regexp_extract_all(text, '{Tx.SCRIPT_RANGES["ko"]}')) AS c_ko,
                 len(regexp_extract_all(text, '{Tx.SCRIPT_RANGES["th"]}')) AS c_th,
                 len(regexp_extract_all(text, '{Tx.SCRIPT_RANGES["zh"]}')) AS c_zh,
                 length(regexp_replace(text, '[ \t\n\r\f]', '', 'g')) AS n_ns
          FROM documents)
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(regexp_extract_all(text, '{Tx.BPE_PATTERN}'))
                   AS n_bpe_tokens,
               md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
                   AS fingerprint,
               CASE
                 WHEN n_ns > 0 AND c_ja * {Tx.SCRIPT_DEN}
                      >= n_ns * {Tx.SCRIPT_KANA_NUM} THEN 'ja'
                 WHEN n_ns > 0 AND c_ko * {Tx.SCRIPT_DEN}
                      >= n_ns * {Tx.SCRIPT_MAIN_NUM} THEN 'ko'
                 WHEN n_ns > 0 AND c_th * {Tx.SCRIPT_DEN}
                      >= n_ns * {Tx.SCRIPT_MAIN_NUM} THEN 'th'
                 WHEN n_ns > 0 AND c_zh * {Tx.SCRIPT_DEN}
                      >= n_ns * {Tx.SCRIPT_MAIN_NUM} THEN 'zh'
                 WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de
                      AND s_en > 0 THEN 'en'
                 WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
                 WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
                 WHEN s_de > 0 THEN 'de'
                 ELSE 'und'
               END AS lang_pred
        FROM scored""",
)
def t_text_features(spark, sf_dir):
    """Per-document text features in ONE codegen scan: whitespace
    token count, BPE-ish pre-tokenizer piece count (the LLM token
    budget estimate), md5 fingerprint over normalized text (the
    exact-dedup key), and two-tier language ID — Unicode-script
    character fractions for space-free scripts (ja/ko/th/zh, r16)
    ahead of marker-stopword scores (first language in marker order
    wins ties). No explode, no UDF — four curation features for one
    pass over the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    txt = F.col("text")
    return docs.select(
        "doc_id",
        Tx.token_count(txt).alias("n_tokens"),
        Tx.bpe_token_count(txt).alias("n_bpe_tokens"),
        Tx.fingerprint(txt).alias("fingerprint"),
        Tx.detect_lang(txt).alias("lang_pred"))


@query(
    "t_quality_score",
    f"""WITH base AS (
          SELECT doc_id,
                 string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS n_tokens
          FROM documents)
        SELECT doc_id, n_tokens,
               ROUND(sw_ratio, 6) AS stopword_ratio,
               ROUND(avg_len, 6) AS avg_token_len,
               ROUND(0.5 * sw_ratio
                     + 0.3 * LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
                     + 0.2 * (avg_len / 10.0), 6) AS quality
        FROM (
          SELECT doc_id, n_tokens,
                 CASE WHEN n_tokens > 0 THEN
                   CAST(len(list_filter(toks, x -> x IN ({_EN})))
                        AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                 ELSE 0.0 END AS sw_ratio,
                 CASE WHEN n_tokens > 0 THEN
                   CAST(list_aggregate(list_transform(toks,
                        x -> length(x)), 'sum') AS DOUBLE)
                     / CAST(n_tokens AS DOUBLE)
                 ELSE 0.0 END AS avg_len
          FROM base)""",
)
def t_quality_score(spark, sf_dir):
    """Quality scoring: stopword density + length saturation + token
    shape — the pretraining-corpus filter features, computed in one
    codegen pass per document."""
    docs = load_table(spark, sf_dir, "documents")
    txt = F.col("text")
    return docs.select(
        "doc_id",
        Tx.token_count(txt).alias("n_tokens"),
        F.round(Tx.stopword_ratio(txt), 6).alias("stopword_ratio"),
        F.round(Tx.avg_token_len(txt), 6).alias("avg_token_len"),
        F.round(Tx.quality_score(txt), 6).alias("quality"))


# Registry curation (round 5): t_lang_distribution demoted from the
# 50-slot driver registry to free a slot for the Q10 analogue
# (qpipe_time_to_throw) — its tokenize/count_in_set path is already
# driver-exercised by t_text_features and t_quality_score. Oracle
# parity continues in tests/test_demoted_ops.py.
T_LANG_ORACLE = f"""WITH scored AS (
          SELECT doc_id, lang,
                 len(list_filter(string_split(text,' '), x -> x IN ({_EN}))) AS s_en
          FROM documents)
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN s_en > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_en_markers
        FROM scored GROUP BY lang"""


def t_lang_distribution(spark, sf_dir):
    """Corpus language rollup: declared language vs marker evidence —
    the aggregate view a curation pipeline monitors."""
    docs = load_table(spark, sf_dir, "documents")
    s_en = Tx.count_in_set(Tx.tokenize(F.col("text")),
                           Tx.LANG_MARKERS["en"])
    return (docs.withColumn("s_en", s_en)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("s_en") > 0, 1).otherwise(0))
                  .alias("n_en_markers")))


# ---------------------------------------------- HTML → text (round 15)

# Deterministic crawl-page envelope wrapped around each document's
# text so the extraction query exercises every rule on REAL corpus
# rows (the testdata documents are plain text): invisible script/
# style content, a comment, nav/header boilerplate (no terminal
# punctuation), a "javascript" line, a too-short list item, a kept
# list item, leaked code with braces, and an entity line including
# the &amp;lt; double-decode trap. Shared verbatim by the Spark query
# and the DuckDB oracle; no single quotes so it embeds in a SQL
# literal unchanged.
_HTML_PRE = (
    '<html><head><title>Doc</title>'
    '<style>body { color: #fff; }</style>'
    '<script type="text/javascript">var x = 1;</script></head>'
    '<body><!-- header --><div class="nav">Home | About | Contact</div>'
    '<h1>Tiny header</h1><p>')
_HTML_POST = (
    '.</p><p>Enable javascript to view this page properly.</p>'
    '<ul><li>One.</li><li>Item two ok.</li></ul>'
    '<p>function f() { return 1; }.</p>'
    '<p>R&amp;D &amp;lt;tags&amp;gt; stay literal in this line.</p>'
    '</body></html>')


@query(
    "t_html_extract",
    f"""WITH ex AS (
          SELECT doc_id,
                 {Hx.oracle_sql_expr(
                     f"'{_HTML_PRE}' || text || '{_HTML_POST}'")}
                     AS extracted_text
          FROM documents)
        SELECT doc_id, extracted_text,
               len(string_split(extracted_text, chr(10))) AS n_lines
        FROM ex""",
)
def t_html_extract(spark, sf_dir):
    """HTML → training-text extraction (functions/html.py): tag/
    script/style strip + C4 §2.1 boilerplate line rules, end to end
    over a synthesized crawl page per document. One codegen
    projection — no UDF, no explode, no shuffle; the oracle restates
    the identical RE2-safe chain in DuckDB, so the hash pins both
    the markup strip and every line rule."""
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(F.lit(_HTML_PRE), F.col("text"),
                    F.lit(_HTML_POST))
    extracted = Hx.extract_html_text(html)
    return (docs.select("doc_id", extracted.alias("extracted_text"))
            .withColumn("n_lines",
                        F.size(F.split(F.col("extracted_text"),
                                       "\n"))))
