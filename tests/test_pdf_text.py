"""PDF content-stream text extraction (containers.pdf_text) and its
Spark pass (binary_ops.extract_document_text) — VERDICT r14 task #3:
stdlib-compressed and hand-built streams, every string syntax from
ISO 32000-1 §7.3.4, honest-tier refusals, fuzz armor, and the
zero-shuffle plan claim.
"""

from __future__ import annotations

import pytest

from big_data_bowl___2023_spark.multimodal import codecs, containers
from big_data_bowl___2023_spark.multimodal.binary_ops import (
    document_text_profile,
    extract_document_text,
)


def test_uncompressed_multipage_round_trip():
    pdf = containers.make_pdf(["Hello world from page one.",
                               "Second page text."])
    m = containers.pdf_text(pdf)
    assert m["text"] == "Hello world from page one.\nSecond page text."
    assert m["n_streams"] == 2 and m["n_skipped"] == 0


def test_flatedecode_streams_inflate():
    pdf = containers.make_pdf(["Compressed body survives zlib."],
                              compress=True)
    m = containers.pdf_text(pdf)
    assert m["text"] == "Compressed body survives zlib."
    assert m["n_streams"] == 1 and m["n_skipped"] == 0


def test_exotic_filter_skipped_and_counted():
    pdf = containers.make_pdf(["never read"], exotic_filter=True)
    m = containers.pdf_text(pdf)
    assert m["text"] == ""
    assert m["n_streams"] == 0 and m["n_skipped"] == 1


def test_encrypted_refuses_typed():
    pdf = containers.make_pdf(["secret"], encrypted=True)
    with pytest.raises(codecs.UnsupportedFormat):
        containers.pdf_text(pdf)


def _wrap_stream(stream: bytes) -> bytes:
    """Minimal PDF shell around one raw content stream."""
    return (b"%PDF-1.4\n1 0 obj\n<< /Length " +
            str(len(stream)).encode() + b" >>\nstream\n" + stream +
            b"\nendstream\nendobj\ntrailer\n<< /Size 2 >>\n%%EOF\n")


def test_string_escapes_octal_and_nesting():
    # §7.3.4.2: escapes, 1-3 digit octal, balanced parens, \-EOL
    stream = (rb"BT (lparen \( rparen \) back \\ tab\there) Tj "
              rb"T* (octal \101\102\103 end) Tj "
              b"T* (nested (parens) fine) Tj "
              b"T* (split \\\nline) Tj ET")
    m = containers.pdf_text(_wrap_stream(stream))
    assert m["text"].split("\n") == [
        "lparen ( rparen ) back \\ tab\there",
        "octal ABC end",
        "nested (parens) fine",
        "split line",      # the pre-backslash space is content
    ]


def test_hex_strings_and_tj_kerning():
    # §7.3.4.3 hex strings (odd digit pads 0); TJ kerning <= -180
    # reads as a word gap, smaller adjustments do not
    stream = (b"BT <48656C6C6F> Tj T* "
              b"[(Wor) -50 (ld) -250 (gap)] TJ ET")
    m = containers.pdf_text(_wrap_stream(stream))
    assert m["text"] == "Hello\nWorld gap"


def test_quote_operators_break_lines():
    stream = b"BT (first line) Tj (second via quote) ' ET"
    m = containers.pdf_text(_wrap_stream(stream))
    assert m["text"] == "first line\nsecond via quote"


def test_non_text_streams_not_counted():
    # a stream with no BT/Tj/TJ (image bits) contributes nothing
    shell = _wrap_stream(b"\x00\x01\x02 image bits \xff\xfe")
    m = containers.pdf_text(shell)
    assert m["text"] == "" and m["n_streams"] == 0


def test_not_a_pdf_refuses():
    with pytest.raises(codecs.UnsupportedFormat):
        containers.pdf_text(b"plain text, no header")


def test_fuzz_mutations_stay_typed():
    """Fuzz armor: byte mutations of real seeds either parse or
    refuse typed — never escape with an arbitrary exception, never
    emit unbounded text (the one-corrupt-blob contract)."""
    seeds = [
        containers.make_pdf(["Alpha beta gamma."], compress=True),
        containers.make_pdf(["Page one.", "Page two."]),
        _wrap_stream(b"BT [(a) -200 (b)] TJ (c) Tj ET"),
    ]
    k = 0
    for seed in seeds:
        for i in range(0, len(seed), 7):
            bad = bytearray(seed)
            bad[i] = (bad[i] + 1 + (i * 31) % 251) & 0xFF
            try:
                m = containers.pdf_text(bytes(bad))
                assert len(m["text"]) <= containers.PDF_MAX_TEXT
            except codecs.UnsupportedFormat:
                k += 1
    assert k >= 0  # refusals allowed; anything else already raised


def test_spark_pass_and_profile(spark):
    """End-to-end: the four tiers attribute correctly through the
    Arrow pass, and the data-card rollup counts them; the plan is
    one mapInPandas with zero Exchange before the rollup's single
    aggregate."""
    payloads = {
        1: containers.make_pdf(["Real text here."]),
        2: containers.make_pdf(["zipped."], compress=True),
        3: containers.make_pdf(["img"], exotic_filter=True),
        4: containers.make_pdf(["x"], encrypted=True),
        5: b"not a pdf at all",
    }
    media = spark.createDataFrame(
        [(k, "unknown", bytearray(v), f"{k}.bin", len(v))
         for k, v in payloads.items()],
        "media_id long, modality string, data binary, "
        "source string, n_bytes long")
    got = {r["media_id"]: (r["tier"], r["text"], r["n_skipped"])
           for r in extract_document_text(media).collect()}
    assert got[1] == ("pdf-text", "Real text here.", 0)
    assert got[2] == ("pdf-text", "zipped.", 0)
    assert got[3] == ("pdf-text-empty", "", 1)
    assert got[4] == ("pdf-text-refused", "", 0)
    assert got[5] == ("not-document", "", 0)

    prof = {r["tier"]: r["n_docs"]
            for r in document_text_profile(media).collect()}
    assert prof == {"pdf-text": 2, "pdf-text-empty": 1,
                    "pdf-text-refused": 1, "not-document": 1}

    plan = (extract_document_text(media)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "MapInPandas" in plan


def test_review_r15_dash_pattern_array_does_not_eat_text():
    """A '[3 3] 0 d' dash-pattern array before BT must not divert
    the following show-text strings into a dead operand (review
    r15: the array is consumed by its OWN operator, whatever it is)."""
    stream = b"0.5 w [3 3] 0 d BT (Hello dash world.) Tj ET"
    m = containers.pdf_text(_wrap_stream(stream))
    assert m["text"] == "Hello dash world."
    # and an array immediately followed by TJ still emits
    stream2 = b"BT [(a) -250 (b)] TJ T* [9 9] 0 d (tail line.) Tj ET"
    m2 = containers.pdf_text(_wrap_stream(stream2))
    assert m2["text"] == "a b\ntail line."


def test_review_r15_filter_lookback_stays_in_object():
    """An unfiltered stream FOLLOWING a FlateDecode object must not
    inherit the previous object's /Filter (review r15: the dict
    lookback is bounded at the current object)."""
    import zlib
    z = zlib.compress(b"BT (compressed one.) Tj ET")
    raw = b"BT (plain second stream.) Tj ET"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Length " + str(len(z)).encode()
           + b" /Filter /FlateDecode >>\nstream\n" + z
           + b"\nendstream\nendobj\n"
           b"2 0 obj\n<< /Length " + str(len(raw)).encode()
           + b" >>\nstream\n" + raw + b"\nendstream\nendobj\n"
           b"trailer\n<< /Size 3 >>\n%%EOF\n")
    m = containers.pdf_text(pdf)
    assert m["text"] == "compressed one.\nplain second stream."
    assert m["n_streams"] == 2 and m["n_skipped"] == 0


def test_review_r15_encrypt_mention_in_text_not_refused():
    """'/Encrypt' in VISIBLE page text must not refuse the document;
    only the trailer dictionary means encryption (review r15)."""
    body = _wrap_stream(
        b"BT (The /Encrypt key marks secured files.) Tj ET")
    m = containers.pdf_text(body)
    assert m["text"] == "The /Encrypt key marks secured files."
    # the real thing still refuses
    pdf = containers.make_pdf(["secret"], encrypted=True)
    with pytest.raises(codecs.UnsupportedFormat):
        containers.pdf_text(pdf)


def test_advice_r15_stale_string_cleared_by_every_operator():
    """A pending literal string must not survive PAST a non-show
    operator: `(A) Tj (LEAK) 1 0 0 1 10 10 Tm Tj` previously
    re-showed 'LEAK' via the stale operand (ADVICE r15). Malformed
    streams degrade to DROPPED strings, never re-shown ones."""
    stream = b"BT (A) Tj (LEAK) 1 0 0 1 10 10 Tm Tj ET"
    m = containers.pdf_text(_wrap_stream(stream))
    assert "LEAK" not in m["text"]
    assert m["text"].startswith("A")
    # a well-formed stream is unaffected: string → its own show op
    ok = b"BT (A) Tj (B) Tj ET"
    assert containers.pdf_text(_wrap_stream(ok))["text"] == "AB"


def test_advice_r15_operator_token_ends_at_digit():
    """The operator-continuation set is spelled without digits —
    b"'\"*0-9" was the literal byte set {', ", *, 0, -, 9}, so
    digits 1-8 already terminated tokens while 0 and 9 did not
    (ADVICE r15). Now every digit terminates uniformly: `T*0` and
    `T*9` both tokenize the line-break operator identically."""
    for d in b"0123456789":
        stream = b"BT (a) Tj T*%c (b) Tj ET" % d
        m = containers.pdf_text(_wrap_stream(stream))
        assert m["text"] == "a\nb", (d, m["text"])
