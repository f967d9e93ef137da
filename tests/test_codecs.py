"""Pure-python BMP/PPM/PGM codecs (multimodal/codecs.py — verdict
r10 #8) and their dispatch in the multimodal passes.

Contracts under test:
* BMP (24-bit BI_RGB, bottom-up and top-down) and binary netpbm
  (P6/P5, with header comments) decode to exact pixels;
* encode→decode round-trips;
* nearest-neighbor resize fits the max_side box, preserves aspect,
  never upscales, and picks true source pixels;
* the Spark passes (`decode_media` / `resize_media` /
  `extract_features`) use the REAL tier for these formats — the
  stub is reached only for genuinely unsupported payloads;
* unsupported variants (16-bit netpbm, compressed BMP, foreign
  magic) raise `UnsupportedFormat`, never mis-decode.
"""

from __future__ import annotations

import numpy as np
import pytest

from big_data_bowl___2023_spark.multimodal import codecs
from big_data_bowl___2023_spark.multimodal.binary_ops import (
    decode_media,
    extract_features,
    resize_media,
)


def _grad(h, w):
    """Deterministic (h, w, 3) test image with distinct channels."""
    r = np.tile(np.arange(w, dtype=np.uint8) % 256, (h, 1))
    g = np.tile((np.arange(h, dtype=np.uint8) % 256)[:, None], (1, w))
    b = np.full((h, w), 7, dtype=np.uint8)
    return np.stack([r, g, b], axis=2)


def test_bmp_round_trip_exact():
    img = _grad(13, 10)                   # stride padding exercised
    data = codecs.make_bmp(img)
    assert codecs.sniff(data) == "bmp"
    out = codecs.decode(data)
    np.testing.assert_array_equal(out, img)


def test_bmp_top_down_rows():
    img = _grad(4, 6)
    data = bytearray(codecs.make_bmp(img))
    # flip the height sign to declare top-down, and pre-flip the
    # stored rows so the logical image is unchanged
    h = int.from_bytes(data[22:26], "little", signed=True)
    data[22:26] = (-h).to_bytes(4, "little", signed=True)
    stride = ((6 * 3 + 3) // 4) * 4
    pix = np.frombuffer(bytes(data[54:]), dtype=np.uint8) \
        .reshape(4, stride)
    data[54:] = pix[::-1].tobytes()
    np.testing.assert_array_equal(codecs.decode(bytes(data)), img)


def test_ppm_pgm_round_trip_with_comments():
    img = _grad(5, 7)
    data = codecs.encode(img)
    assert data.startswith(b"P6\n7 5\n255\n")
    np.testing.assert_array_equal(codecs.decode(data), img)
    # comments and arbitrary whitespace in the header
    commented = b"P6 # magic\n# a comment line\n 7\n5 # dims\n255\n" \
        + data.split(b"255\n", 1)[1]
    np.testing.assert_array_equal(codecs.decode(commented), img)
    gray = img[:, :, :1]
    pgm = codecs.encode(gray)
    assert pgm.startswith(b"P5\n")
    np.testing.assert_array_equal(codecs.decode(pgm), gray)


def test_resize_nearest_semantics():
    img = _grad(64, 32)
    small = codecs.resize_nearest(img, 16)
    assert small.shape == (16, 8, 3)      # aspect preserved
    # every output pixel is a true source pixel
    assert set(np.unique(small[:, :, 2])) == {7}
    # never upscales
    assert codecs.resize_nearest(img, 512).shape == img.shape
    tiny = codecs.resize_nearest(_grad(3, 300), 16)
    assert tiny.shape[0] >= 1 and tiny.shape[1] == 16


def test_unsupported_variants_refuse():
    img = _grad(4, 4)
    bmp = bytearray(codecs.make_bmp(img))
    bmp[30:34] = (1).to_bytes(4, "little")        # BI_RLE8
    with pytest.raises(codecs.UnsupportedFormat, match="compressed"):
        codecs.decode(bytes(bmp))
    deep = b"P6\n2 2\n65535\n" + b"\x00" * 24
    with pytest.raises(codecs.UnsupportedFormat, match="16-bit"):
        codecs.decode(deep)
    with pytest.raises(codecs.UnsupportedFormat):
        codecs.decode(b"\x89PNG\r\n\x1a\nnotreal")
    assert codecs.sniff(b"\x89PNG") is None


def test_spark_passes_use_real_tier(spark):
    img_a = _grad(40, 24)
    img_b = _grad(9, 9)
    rows = [
        (1, "image", bytearray(codecs.make_bmp(img_a)), "t", 0),
        (2, "image", bytearray(codecs.encode(img_b)), "t", 0),
        (3, "image", bytearray(b"not an image payload at all"),
         "t", 0),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, data binary, "
              "source string, n_bytes long")

    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (dec[1]["width"], dec[1]["height"],
            dec[1]["n_channels"], dec[1]["decoder"]) == (24, 40, 3,
                                                         "bmp")
    assert (dec[2]["width"], dec[2]["height"],
            dec[2]["decoder"]) == (9, 9, "ppm")
    assert dec[3]["decoder"] == "stub"    # only unsupported payloads

    rez = {r["media_id"]: r
           for r in resize_media(media, max_side=16).collect()}
    assert (rez[1]["width"], rez[1]["height"]) == (9, 16)
    got = codecs.decode(bytes(rez[1]["data"]))
    np.testing.assert_array_equal(
        got, codecs.resize_nearest(img_a, 16))
    assert (rez[2]["width"], rez[2]["height"]) == (9, 9)

    feats = {r["media_id"]: r["features"]
             for r in extract_features(media).collect()}
    # real tier: [w, h, c, mean, std, chan-means...] normalized
    assert feats[1][0] == pytest.approx(24 / 4096)
    assert feats[1][1] == pytest.approx(40 / 4096)
    assert feats[1][2] == pytest.approx(3 / 4)
    assert feats[1][3] == pytest.approx(float(img_a.mean()) / 255.0,
                                        rel=1e-6)
    assert all(0.0 <= v <= 1.0 for v in feats[3])   # stub stays [0,1]


def test_malformed_magic_payloads_fall_to_stub(spark):
    """Review r11: a payload with a codec's magic but garbage inside
    (e.g. a negative pixel offset) must raise UnsupportedFormat —
    never a bare ValueError that would kill the whole mapInPandas
    job instead of falling to the stub tier."""
    img = _grad(4, 4)
    evil = bytearray(codecs.make_bmp(img))
    evil[10:14] = (-100).to_bytes(4, "little", signed=True)
    with pytest.raises(codecs.UnsupportedFormat):
        codecs.decode(bytes(evil))
    # truncated netpbm with a plausible header
    with pytest.raises(codecs.UnsupportedFormat):
        codecs.decode(b"P6\n100 100\n255\nxx")
    # and through Spark: the whole batch survives, evil rows stub
    rows = [(1, "image", bytearray(codecs.make_bmp(img)), "t", 0),
            (2, "image", bytes(evil), "t", 0)]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, data binary, "
              "source string, n_bytes long")
    dec = {r["media_id"]: r["decoder"]
           for r in decode_media(media).collect()}
    assert dec == {1: "bmp", 2: "stub"}
    assert resize_media(media, max_side=8).count() == 2
    assert extract_features(media).count() == 2
