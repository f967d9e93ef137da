"""HTML → text extraction (functions/html.py): hand-built fixtures
for the markup strip and every C4 §2.1 line rule, DuckDB parity of
the restated oracle chain, the opt-in curation stage, and the
zero-Exchange plan claim (VERDICT r14 task #2).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.functions import html as Hx


def _extract(spark, payloads: list[str],
             min_words: int = Hx.DEFAULT_MIN_WORDS) -> list[str]:
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)],
                               "i int, html string")
    rows = (df.select("i", Hx.extract_html_text(
        F.col("html"), min_words).alias("t"))
            .orderBy("i").collect())
    return [r["t"] for r in rows]


def test_script_style_comments_stripped_with_content(spark):
    html = ("<html><head><style>p { margin: 0; }</style>"
            "<script>if (a < b) { alert('x'); }</script>"
            "<noscript>Turn it on.</noscript></head>"
            "<body><!-- secret note with many words here. -->"
            "<p>Real content stays right here.</p></body></html>")
    [out] = _extract(spark, [html])
    assert out == "Real content stays right here."


def test_block_structure_becomes_lines(spark):
    html = ("<div>First block line survives intact.</div>"
            "<p>Second block line also survives.</p>"
            "Inline <b>bold</b> and <i>italic</i> join the tail line.")
    [out] = _extract(spark, [html])
    assert out.split("\n") == [
        "First block line survives intact.",
        "Second block line also survives.",
        "Inline bold and italic join the tail line.",
    ]


def test_entities_decode_after_tag_strip(spark):
    # &lt;em&gt; must survive as literal text "<em>", never be
    # stripped as a tag; &amp;lt; must decode ONCE to "&lt;"
    html = ("<p>Use &lt;em&gt; tags &amp; write &amp;lt; for less-than"
            " &quot;properly&quot; I&#39;d say.</p>")
    [out] = _extract(spark, [html])
    assert out == ("Use <em> tags & write &lt; for less-than"
                   " \"properly\" I'd say.")


def test_c4_line_rules(spark):
    html = ("<p>Home | About | Contact</p>"            # no terminal .
            "<p>Too short.</p>"                        # < 3 words
            "<p>Enable javascript to continue reading.</p>"
            "<p>var f = function() { return; }.</p>"   # braces
            "<p>Lorem ipsum dolor sit amet filler.</p>"
            "<p>This sentence is boilerplate-free and kept.</p>"
            "<p>Is this kept too?</p>"
            '<p>"A quoted ending works."</p>')
    [out] = _extract(spark, [html])
    assert out.split("\n") == [
        "This sentence is boilerplate-free and kept.",
        "Is this kept too?",
        '"A quoted ending works."',
    ]


def test_min_words_knob(spark):
    html = "<p>Four words right here.</p><p>Only three here.</p>"
    [strict] = _extract(spark, [html], min_words=4)
    assert strict == "Four words right here."
    [loose] = _extract(spark, [html], min_words=3)
    assert loose.split("\n") == ["Four words right here.",
                                 "Only three here."]


def test_everything_boilerplate_yields_empty(spark):
    [out] = _extract(spark, ["<nav>Home</nav><footer>(c) 2026</footer>"])
    assert out == ""


def test_oracle_chain_parity(spark):
    """The DuckDB restatement (oracle_sql_expr) is the SAME function:
    byte-identical output on fixtures exercising every rule."""
    fixtures = [
        "<html><head><style>a { b }</style><script>x<y</script></head>"
        "<body><!-- c --><p>Alpha beta gamma delta.</p></body></html>",
        "<div>Keep this full sentence line.</div><p>Home | Nav</p>"
        "<p>Enable javascript now please.</p><p>code { x }.</p>",
        "<p>R&amp;D &amp;lt;keeps&amp;gt; &quot;entity&#39;s&quot;"
        " rules intact.</p>",
        "<ul><li>One.</li><li>Item two fine here.</li></ul>"
        "<table><tr><td>Cell a</td><td>cell b joined stays.</td></tr>"
        "</table>",
        "plain text with no markup at all ends here.",
        "",
    ]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(fixtures)],
                               "i int, html string")
    got = [r["t"] for r in df.select(
        "i", Hx.extract_html_text(F.col("html")).alias("t"))
        .orderBy("i").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE fx (i INT, html VARCHAR)")
    con.executemany("INSERT INTO fx VALUES (?, ?)",
                    list(enumerate(fixtures)))
    ref = [r[0] for r in con.execute(
        f"SELECT {Hx.oracle_sql_expr('html')} FROM fx ORDER BY i")
        .fetchall()]
    assert got == ref


def test_curation_html_stage(spark):
    """html_input=True cleans tag soup before the quality gate: a
    crawl page whose prose passes gopher once extracted survives,
    and the stage boundary fires for the audit hook."""
    from big_data_bowl___2023_spark.pipelines.curation import (
        curation_frame,
    )
    prose = ("the quick brown fox jumps over the lazy dog and then "
             "keeps running through the field with more and more "
             "words because the gopher gate wants real length. ") * 4
    page = ("<html><head><script>var nav = {};</script></head><body>"
            "<div>Home | About</div><p>" + prose.strip() + "</p>"
            "</body></html>")
    docs = spark.createDataFrame(
        [(1, page, "web"), (2, "<p>Too short.</p>", "web")],
        "doc_id long, text string, source string")
    seen = []
    out = curation_frame(docs, min_words=20, seq_len=64,
                         html_input=True,
                         stage_hook=lambda k, f: seen.append(k))
    rows = out.collect()
    assert "after_html_extract" in seen
    assert {r["doc_id"] for r in rows} == {1}
    # no tag soup reaches the packed chunks
    joined = " ".join(r["text"] if "text" in r else "" for r in rows)
    assert "<" not in joined and "script" not in joined


def test_extraction_plan_is_shuffle_free(spark):
    """The 100 TB claim: extraction is ONE codegen projection — the
    physical plan for scan→extract carries no Exchange and no
    Python UDF eval node."""
    df = spark.range(8).select(
        F.concat(F.lit("<p>row "), F.col("id"),
                 F.lit(" body text here.</p>")).alias("html"))
    plan = (df.select(Hx.extract_html_text(F.col("html")).alias("t"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


@pytest.mark.parametrize("payload", [
    "<p>unterminated <b tag soup",
    "<<<>>><p></p>",
    "&amp;&amp;lt;&bogus; &#39;",
    "<script>never closed",
])
def test_malformed_markup_never_raises(spark, payload):
    [out] = _extract(spark, [payload])
    assert isinstance(out, str)


def test_randomized_cross_engine_parity(spark):
    """120 seeded pseudo-random tag-soup documents — composed from
    tags (balanced and not), entities (valid and bogus), text runs,
    comments, scripts, and stray delimiters — must extract
    byte-identically through the Spark chain and the DuckDB
    restatement. One job per engine (the whole corpus rides a single
    DataFrame), so this covers the input space the fixed fixtures
    cannot without per-example Spark overhead."""
    import random

    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "delta", "words", "lines",
             "keep", "drop", "javascript", "lorem", "ipsum", "x"]
    tags = ["p", "div", "li", "h2", "td", "span", "b", "nav",
            "script", "style", "table", "br"]
    ents = ["&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;",
            "&amp;lt;", "&bogus;", "&#xA;"]

    def frag():
        k = rng.random()
        if k < 0.35:
            return " ".join(rng.choices(words, k=rng.randint(1, 8))) \
                + rng.choice([".", "!", "?", "", " "])
        if k < 0.55:
            t = rng.choice(tags)
            return f"<{t}>" if rng.random() < 0.6 else f"</{t}>"
        if k < 0.65:
            return rng.choice(ents)
        if k < 0.75:
            return "<!-- " + " ".join(rng.choices(words, k=3)) + " -->"
        if k < 0.85:
            return rng.choice(["<", ">", "{", "}", "\n", "  ",
                               "<<p", "< notatag", "</"])
        t = rng.choice(["script", "style"])
        return (f"<{t}>" + " ".join(rng.choices(words, k=4))
                + (f"</{t}>" if rng.random() < 0.8 else ""))

    fixtures = ["".join(frag() for _ in range(rng.randint(1, 30)))
                for _ in range(120)]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(fixtures)], "i int, html string")
    got = [r["t"] for r in df.select(
        "i", Hx.extract_html_text(F.col("html")).alias("t"))
        .orderBy("i").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE fx (i INT, html VARCHAR)")
    con.executemany("INSERT INTO fx VALUES (?, ?)",
                    list(enumerate(fixtures)))
    ref = [r[0] for r in con.execute(
        f"SELECT {Hx.oracle_sql_expr('html')} FROM fx ORDER BY i")
        .fetchall()]
    assert got == ref


def test_review_r15_null_text_matches_oracle(spark):
    """NULL text must agree across engines: both read as ''
    (review r15 — the Spark chain coalesces up front; the oracle's
    trailing COALESCE was already '')."""
    df = spark.createDataFrame([(1, None), (2, "<p>Real line here.</p>")],
                               "i int, html string")
    got = {r["i"]: r["t"] for r in df.select(
        "i", Hx.extract_html_text(F.col("html")).alias("t")).collect()}
    assert got[1] == "" and got[2] == "Real line here."
    con = duckdb.connect()
    con.execute("CREATE TABLE fx (i INT, html VARCHAR)")
    con.executemany("INSERT INTO fx VALUES (?, ?)",
                    [(1, None), (2, "<p>Real line here.</p>")])
    ref = {i: t for i, t in con.execute(
        f"SELECT i, {Hx.oracle_sql_expr('html')} FROM fx").fetchall()}
    assert ref == got


def test_emptied_page_attributed_downstream(spark):
    """A crawl page whose EVERY line is boilerplate extracts to ''
    and must die at the quality gate with a named rule — the audit
    answers 'why did this page vanish' even though the extraction
    stage itself never drops rows."""
    from big_data_bowl___2023_spark.pipelines.curation import (
        curation_audit,
    )
    prose = ("the quick brown fox jumps over the lazy dog and then "
             "keeps running through the field with more and more "
             "words because the gopher gate wants real length. ") * 3
    docs = spark.createDataFrame(
        [(1, "<p>" + prose.strip() + "</p>", "web"),
         (2, "<nav>Home | About</nav><script>x</script>", "web")],
        "doc_id long, text string, source string")
    audit = {r["doc_id"]: (r["stage"], r["reason"]) for r in
             curation_audit(docs, min_words=20, seq_len=64,
                            html_input=True).collect()}
    assert audit[1] == ("kept", "kept")
    assert audit[2][0] == "after_quality"      # died at gopher...
    assert audit[2][1] == "pass_word_count"    # ...for zero words


def test_audit_reasons_use_extracted_text(spark):
    """Review r15: a page whose RAW tag soup has plenty of 'words'
    but extracts to '' must be re-flagged against the EXTRACTED
    text — the rule the pipeline actually applied."""
    from big_data_bowl___2023_spark.pipelines.curation import (
        curation_audit,
    )
    soup = ("<nav>" + " ".join(f"link{i}" for i in range(40))
            + "</nav><script>var x = 1;</script>")
    docs = spark.createDataFrame(
        [(1, soup, "web")], "doc_id long, text string, source string")
    audit = {r["doc_id"]: (r["stage"], r["reason"]) for r in
             curation_audit(docs, min_words=20, seq_len=64,
                            html_input=True).collect()}
    # 40 raw tokens would PASS min_words=20 — only the extracted
    # empty text names the true cause
    assert audit[1] == ("after_quality", "pass_word_count")


def test_r16_quoted_attribute_gt_does_not_leak(spark):
    """Verdict r15 #8a: a '>' inside a quoted attribute value must
    not end the tag match early — TAG_RE allows quoted segments, so
    `<p title="a>b">` strips as ONE tag instead of leaking `b">`."""
    fixtures = [
        '<p title="a>b">Quoted markers survive the strip here.</p>',
        "<p title='x>y'>Single quoted attr behaves the same way.</p>",
        '<a href="/x" data-arrow="-->" title="2 > 1">Two quoted '
        'attributes with angle junk work too.</a>'
        '<p>Tail sentence stays intact after the link.</p>',
        # unquoted attrs keep working
        '<p class=lead>Unquoted attributes still strip fine.</p>',
    ]
    outs = _extract(spark, fixtures)
    assert outs[0] == "Quoted markers survive the strip here."
    assert outs[1] == "Single quoted attr behaves the same way."
    assert 'b">' not in outs[0] and "y'>" not in outs[1]
    # <a> is inline — both sentences share a line; the point is the
    # quoted angle junk ('-->', '2 > 1') must not leak into it
    assert outs[2] == ("Two quoted attributes with angle junk work "
                       "too. Tail sentence stays intact after the "
                       "link.")
    assert "-->" not in outs[2] and "2 > 1" not in outs[2]
    assert outs[3] == "Unquoted attributes still strip fine."
    # and the DuckDB restatement agrees byte-for-byte
    import duckdb as _dd
    con = _dd.connect()
    con.execute("CREATE TABLE fx (i INT, html VARCHAR)")
    con.executemany("INSERT INTO fx VALUES (?, ?)",
                    list(enumerate(fixtures)))
    ref = [r[0] for r in con.execute(
        f"SELECT {Hx.oracle_sql_expr('html')} FROM fx ORDER BY i")
        .fetchall()]
    assert outs == ref


def test_r16_real_page_shape_end_to_end(spark):
    """Verdict r15 #8b: a realistically-shaped page — nav bar,
    cookie banner, sidebar fragments, article prose, footer — must
    reduce to the article prose alone, end-to-end through
    strip_tags + the C4 line rules."""
    page = (
        '<html><head><title>Widget Review — Example Site</title>'
        '<meta charset="utf-8"><link rel="stylesheet" href="/m.css">'
        '<style>.nav { display: flex; } a:hover { color: red; }</style>'
        '<script src="/analytics.js"></script>'
        '<script>window.dataLayer = window.dataLayer || [];</script>'
        '</head><body>'
        '<nav class="nav"><a href="/">Home</a><a href="/blog">Blog</a>'
        '<a href="/about">About</a></nav>'
        '<div id="cookie-banner">We use cookies to improve your '
        'experience click accept to continue</div>'
        '<aside><h3>Related</h3><ul><li><a href="/a">Top 10 widgets'
        '</a></li><li><a href="/b">Widget FAQ</a></li></ul></aside>'
        '<article><h1>The widget review</h1>'
        '<p>The widget arrived quickly and the build quality is '
        'excellent for the price.</p>'
        '<p>After a week of daily use, the battery still lasts two '
        'full days.</p>'
        '<p title="score > 4">Overall the widget earns a strong '
        'recommendation from us.</p></article>'
        '<footer><p>© 2026 Example Site</p><p>Terms | Privacy</p>'
        '<p>Enable javascript for the comment form.</p></footer>'
        '</body></html>')
    [out] = _extract(spark, [page])
    assert out.split("\n") == [
        "The widget arrived quickly and the build quality is "
        "excellent for the price.",
        "After a week of daily use, the battery still lasts two "
        "full days.",
        "Overall the widget earns a strong recommendation from us.",
    ]
