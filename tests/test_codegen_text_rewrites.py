"""r16 optimization guards: the codegen rewrites of the hot text /
gopher expressions must stay BIT-IDENTICAL to the interpreted
higher-order forms they replaced (driver hashes depend on it).

Each test re-states the replaced implementation inline (the
interpreted array filter / fold) and asserts null-safe equality
row-for-row over adversarial fixtures chosen to hit the documented
edge cases: Java ``$`` vs ``\\z`` (trailing newline), double spaces
(empty tokens), tokens that merely CONTAIN a marker, regex
metacharacters in text, null/empty documents, and CJK/Thai script
mixes for the two-tier language ID.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.functions import gopher as G
from big_data_bowl___2023_spark.functions import text as Tx

FIXTURES = [
    "the\n",                       # Java $ would count this; \z must not
    "a  the  of",                  # empty tokens from double spaces
    "",
    "the",
    " the ",
    "android is, the. (a) of",     # containment is not equality
    "is the of and a",             # every en marker once
    "el la que der die und ist",   # cross-language tie material
    "# ## a#b …x t…t",             # symbol-word shapes
    "12 34 ab5 ….",                # alpha-word shapes
    "one\ntwo\none\n\n  \nthree",  # duplicate + blank lines
    "\t\ttabs only",               # tabs are NOT token separators
    "№  ¶ •",
    "あいうえおかきくけこ",          # kana → ja
    "안녕하세요 세계",               # hangul → ko
    "สวัสดีชาวโลก",                 # thai → th
    "你好世界这是中文文本",          # han → zh
    "あいう 你好 the",              # ja beats zh beats markers
    None,
    "word " * 80 + "#tag …dots",
]


def _frame(spark):
    return spark.createDataFrame([(t,) for t in FIXTURES],
                                 "text string")


def _assert_all_equal(df, pairs):
    checks = [(~old.eqNullSafe(new)).cast("int").alias(f"m{i}")
              for i, (old, new) in enumerate(pairs)]
    row = df.select(*checks).agg(
        *[F.sum(f"m{i}").alias(f"m{i}")
          for i in range(len(pairs))]).collect()[0]
    assert all((v or 0) == 0 for v in row), row.asDict()


def test_marker_count_matches_interpreted_filter(spark):
    txt = F.col("text")
    pairs = [
        (Tx.count_in_set(Tx.tokenize(txt), words),
         Tx.marker_count(txt, words))
        for words in Tx.LANG_MARKERS.values()
    ]
    _assert_all_equal(_frame(spark), pairs)


def test_avg_token_len_matches_interpreted_fold(spark):
    txt = F.col("text")
    toks = Tx.tokenize(txt)
    n = F.size(toks)
    old = F.when(
        n > 0,
        F.aggregate(toks, F.lit(0),
                    lambda a, t: a + F.length(t)).cast("double")
        / n.cast("double")).otherwise(F.lit(0.0))
    _assert_all_equal(_frame(spark), [(old, Tx.avg_token_len(txt))])


def test_detect_lang_matches_when_chain(spark):
    """The when-free pick-array form vs the original nested-CASE
    two-tier chain, re-stated verbatim."""
    txt = F.col("text")
    scores = {lang: Tx.count_in_set(Tx.tokenize(txt), m)
              for lang, m in Tx.LANG_MARKERS.items()}
    best_lang, best_score = F.lit("und"), F.lit(0)
    for lang in Tx.LANG_MARKERS:
        s = scores[lang]
        better = s > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, s).otherwise(best_score)
    sc = Tx.script_counts(txt)
    n = Tx.nonspace_char_count(txt)
    den, kana, main = (Tx.SCRIPT_DEN, Tx.SCRIPT_KANA_NUM,
                       Tx.SCRIPT_MAIN_NUM)
    old = best_lang
    for s in reversed(Tx.SCRIPT_RANGES):
        num = kana if s == "ja" else main
        old = F.when((n > 0) & (sc[s] * den >= n * num),
                     F.lit(s)).otherwise(old)
    _assert_all_equal(_frame(spark), [(old, Tx.detect_lang(txt))])


def test_gopher_flags_match_interpreted_filters(spark):
    txt = F.col("text")
    w = F.filter(Tx.tokenize(txt), lambda t: t != "")
    n = F.size(w).cast("double")
    mean_len = F.when(n > 0, F.aggregate(
        w, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n)

    def frac(pred):
        return F.when(n > 0,
                      F.size(F.filter(w, pred)).cast("double") / n)

    old = {
        "pass_word_count": (n >= G.MIN_WORDS) & (n <= G.MAX_WORDS),
        "pass_mean_word_len":
            (mean_len >= G.MIN_MEAN_WORD_LEN)
            & (mean_len <= G.MAX_MEAN_WORD_LEN),
        "pass_symbol_frac":
            frac(lambda t: t.contains("#") | t.contains("…"))
            <= G.MAX_SYMBOL_WORD_FRAC,
        "pass_alpha_frac":
            frac(lambda t: t.rlike("[A-Za-z]"))
            >= G.MIN_ALPHA_WORD_FRAC,
    }
    new = G.flags(txt)
    _assert_all_equal(_frame(spark),
                      [(old[k], new[k]) for k in old])


def test_shingle_array_letbind_matches_inline_chain(spark):
    """r16: `dedup.ngram.shingle_array` binds the token array once
    (transform(array(tokenize(text)), t -> chain(t))) instead of
    evaluating tokenize per chain reference. Values must stay
    bit-identical to the original inline slice/zip_with chain for
    every n the engine uses (2 = minhash/jaccard, 8 = decon),
    including NULL text (NULL array) and < n tokens (empty array)."""
    from big_data_bowl___2023_spark.dedup.ngram import shingle_array

    txt = F.col("text")

    def inline_chain(n):
        toks = Tx.tokenize(txt)
        cols = [F.slice(toks, i + 1,
                        F.greatest(F.size(toks) - n + 1, F.lit(0)))
                for i in range(n)]
        sh = cols[0]
        for c in cols[1:]:
            sh = F.zip_with(sh, c, lambda a, b: F.concat_ws(" ", a, b))
        return sh

    _assert_all_equal(_frame(spark),
                      [(inline_chain(n), shingle_array(txt, n))
                       for n in (1, 2, 3, 8)])


def test_dsir_gram_letbind_matches_union_of_orders(spark):
    """r16: the let-bound unigram+bigram array in
    `dsir.hashed_ngram_counts` must emit exactly the multiset the
    two-order union emitted (bag counts — DSIR features)."""
    from big_data_bowl___2023_spark.operators.dsir import (
        hashed_ngram_counts,
    )

    df = _frame(spark).withColumn(
        "doc_id", F.monotonically_increasing_id())
    got = hashed_ngram_counts(df).orderBy("doc_id", "bucket")

    toks = Tx.tokenize(F.col("text"))
    g = F.greatest(F.size(toks) - 1, F.lit(0))
    bi = F.zip_with(F.slice(toks, 1, g), F.slice(toks, 2, g),
                    lambda a, b: F.concat_ws(" ", a, b))
    grams = df.select("doc_id",
                      F.explode(F.concat(toks, bi)).alias("shingle"))
    bucket = F.substring(
        F.md5(F.encode(F.col("shingle"), "UTF-8")), 1, 3)
    want = (grams.select("doc_id", bucket.alias("bucket"))
            .groupBy("doc_id", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy("doc_id", "bucket"))
    assert [r.asDict() for r in got.collect()] \
        == [r.asDict() for r in want.collect()]
