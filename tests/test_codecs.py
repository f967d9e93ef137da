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


# ---------------------------------------------------------------- PNG

def _rgba(h, w):
    img = _grad(h, w)
    a = ((np.arange(h * w, dtype=np.uint64) * 37) % 256) \
        .astype(np.uint8).reshape(h, w, 1)
    return np.concatenate([img, a], axis=2)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_round_trip_all_filters(filter_type):
    """Verdict r11 #3: each of the five scanline filters unfilters to
    exact pixels, for gray / gray+alpha / RGB / RGBA."""
    for img in (_grad(11, 9), _grad(11, 9)[:, :, :1],
                _rgba(7, 13), _rgba(7, 13)[:, :, :2]):
        data = codecs.make_png(img, filter_type=filter_type)
        assert codecs.sniff(data) == "png"
        np.testing.assert_array_equal(codecs.decode(data), img)


def test_png_adam7_round_trip():
    """Adam7-interlaced PNGs decode exactly: seven independently
    filtered sub-images scattered by the pass grid — every filter
    type, channel count, and degenerate shapes where some passes
    are empty."""
    rng = np.random.default_rng(5)
    for shape in [(17, 24, 3), (8, 8, 1), (21, 13, 4), (1, 1, 3),
                  (7, 3, 2), (2, 40, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in range(5):
            data = codecs.make_png(img, filter_type=ft,
                                   interlace=True)
            assert data[28] == 1             # IHDR interlace byte
            assert np.array_equal(codecs.decode(data), img), \
                (shape, ft)


def test_png_mixed_filters_and_multi_idat():
    """Real encoders pick a filter per row and may split IDAT; the
    decoder must handle both."""
    img = _grad(5, 6)
    import zlib
    rows = []
    for y, f in enumerate([0, 1, 2, 3, 4]):
        one = codecs.make_png(img[y:y + 1], filter_type=f)
        # pull the filtered scanline back out of the 1-row image
        start = one.index(b"IDAT") + 4
        length = int.from_bytes(one[start - 8:start - 4], "big")
        rows.append(zlib.decompress(one[start:start + length]))
    # rows 1..4's left/up predictors referenced zeros in the 1-row
    # images; rebuild filters against the true neighbors instead
    full = codecs.make_png(img, filter_type=0)
    raw = bytearray(zlib.decompress(
        full[full.index(b"IDAT") + 4:][:int.from_bytes(
            full[full.index(b"IDAT") - 4:full.index(b"IDAT")],
            "big")]))
    stride = 6 * 3 + 1
    # hand-filter: row0 Sub, row1 Up, row2 Average, row3 Paeth, row4 None
    recon = np.frombuffer(bytes(raw), dtype=np.uint8) \
        .reshape(5, stride)[:, 1:].astype(np.int64)
    filt = np.zeros_like(recon)
    bpp = 3
    for y, f in enumerate([1, 2, 3, 4, 0]):
        for x in range(recon.shape[1]):
            a = recon[y, x - bpp] if x >= bpp else 0
            b = recon[y - 1, x] if y else 0
            c = recon[y - 1, x - bpp] if (y and x >= bpp) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
            filt[y, x] = (recon[y, x] - pred) % 256
        raw[y * stride] = f
        raw[y * stride + 1:(y + 1) * stride] = \
            filt[y].astype(np.uint8).tobytes()
    comp = zlib.compress(bytes(raw))
    half = len(comp) // 2

    def chunk(ctype, payload):
        return (len(payload).to_bytes(4, "big") + ctype + payload
                + (zlib.crc32(ctype + payload)
                   & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = ((6).to_bytes(4, "big") + (5).to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", comp[:half])
            + chunk(b"IDAT", comp[half:])        # split IDAT stream
            + chunk(b"IEND", b""))
    np.testing.assert_array_equal(codecs.decode(data), img)


def _png_stream(ihdr_fields, scan_bytes):
    """Assemble a minimal PNG from raw IHDR fields + scanline
    bytes."""
    import zlib as _z

    def chunk(ctype, payload):
        return (len(payload).to_bytes(4, "big") + ctype + payload
                + (_z.crc32(ctype + payload)
                   & 0xFFFFFFFF).to_bytes(4, "big"))

    w, h, depth, color = ihdr_fields
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([depth, color, 0, 0, 0]))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(scan_bytes))
            + chunk(b"IEND", b""))


def test_png_sub_byte_and_16_bit_depths():
    """1/2/4-bit gray and palette PNGs decode (MSB-first bit
    unpacking, spec 11.2.2 sample scaling for gray); 16-bit
    truncates to the high byte — the downstream passes are 8-bit."""
    # 1-bit gray, 10 px wide (stride 2 bytes): pattern 1010...
    scan = b"".join(b"\x00" + bytes([0b10101010, 0b10000000])
                    for _ in range(3))
    out = codecs.decode(_png_stream((10, 3, 1, 0), scan))
    assert out.shape == (3, 10, 1)
    assert out[0, :, 0].tolist() == [255, 0] * 5
    # 2-bit gray: values 0..3 scale to 0/85/170/255
    scan = b"\x00" + bytes([0b00011011])     # 0,1,2,3
    out = codecs.decode(_png_stream((4, 1, 2, 0), scan))
    assert out[0, :, 0].tolist() == [0, 85, 170, 255]
    # 4-bit palette through PLTE
    import zlib as _z

    def chunk(ctype, payload):
        return (len(payload).to_bytes(4, "big") + ctype + payload
                + (_z.crc32(ctype + payload)
                   & 0xFFFFFFFF).to_bytes(4, "big"))

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    ihdr = ((3).to_bytes(4, "big") + (1).to_bytes(4, "big")
            + bytes([4, 3, 0, 0, 0]))
    scan = b"\x00" + bytes([0x01, 0x20])     # indices 0,1,2
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", plte)
            + chunk(b"IDAT", _z.compress(scan))
            + chunk(b"IEND", b""))
    out = codecs.decode(data)
    assert out[0].tolist() == [[255, 0, 0], [0, 255, 0],
                               [0, 0, 255]]
    # 16-bit RGB: high bytes survive
    px = bytes([0x12, 0xFF, 0x34, 0x00, 0x56, 0xAB]) * 2
    scan = b"\x00" + px
    out = codecs.decode(_png_stream((2, 1, 16, 2), scan))
    assert out[0, 0].tolist() == [0x12, 0x34, 0x56]
    # 16-bit gray+alpha too
    scan = b"\x00" + bytes([0x99, 0x00, 0x77, 0xFF])
    out = codecs.decode(_png_stream((1, 1, 16, 4), scan))
    assert out[0, 0].tolist() == [0x99, 0x77]


def test_png_unsupported_variants_refuse():
    img = _grad(4, 4)
    good = bytearray(codecs.make_png(img))

    def patched(off, val):
        out = bytearray(good)
        ihdr_at = out.index(b"IHDR") + 4
        out[ihdr_at + off] = val
        # recompute IHDR CRC so the variant check (not CRC) fires
        import zlib
        payload = bytes(out[ihdr_at - 4:ihdr_at + 13])
        out[ihdr_at + 13:ihdr_at + 17] = (
            zlib.crc32(payload) & 0xFFFFFFFF).to_bytes(4, "big")
        return bytes(out)

    with pytest.raises(codecs.UnsupportedFormat, match="7-bit"):
        codecs.decode(patched(8, 7))    # depth 7 is legal for none
    with pytest.raises(codecs.UnsupportedFormat, match="4-bit"):
        codecs.decode(patched(8, 4))    # ...and 4 not for RGB
    with pytest.raises(codecs.UnsupportedFormat, match="color type 5"):
        codecs.decode(patched(9, 5))
    with pytest.raises(codecs.UnsupportedFormat,
                       match="interlace method"):
        codecs.decode(patched(12, 2))   # Adam7 (=1) decodes now
    # flipped payload byte -> CRC mismatch, loud but typed
    evil = bytearray(good)
    evil[evil.index(b"IDAT") + 6] ^= 0xFF
    with pytest.raises(codecs.UnsupportedFormat, match="CRC"):
        codecs.decode(bytes(evil))
    # corrupt DEFLATE with a fixed-up CRC
    evil = bytearray(good)
    at = evil.index(b"IDAT")
    length = int.from_bytes(evil[at - 4:at], "big")
    evil[at + 4:at + 4 + length] = b"\x00" * length
    import zlib
    evil[at + 4 + length:at + 8 + length] = (
        zlib.crc32(bytes(evil[at:at + 4 + length]))
        & 0xFFFFFFFF).to_bytes(4, "big")
    with pytest.raises(codecs.UnsupportedFormat, match="DEFLATE"):
        codecs.decode(bytes(evil))
    with pytest.raises(codecs.UnsupportedFormat, match="IEND"):
        codecs.decode(good[:-12])             # IEND sheared off


def test_png_through_spark_passes(spark):
    """PNG rides the same real-tier dispatch as BMP/netpbm — including
    an RGBA resize, whose output re-encodes as PNG (netpbm can't
    carry alpha)."""
    rgb = _grad(40, 24)
    rgba = _rgba(32, 20)
    rows = [(1, "image", bytearray(codecs.make_png(rgb)), "t", 0),
            (2, "image", bytearray(codecs.make_png(rgba)), "t", 0)]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, data binary, "
              "source string, n_bytes long")
    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (dec[1]["width"], dec[1]["height"], dec[1]["n_channels"],
            dec[1]["decoder"]) == (24, 40, 3, "png")
    assert (dec[2]["n_channels"], dec[2]["decoder"]) == (4, "png")
    rez = {r["media_id"]: r
           for r in resize_media(media, max_side=16).collect()}
    np.testing.assert_array_equal(
        codecs.decode(bytes(rez[1]["data"])),
        codecs.resize_nearest(rgb, 16))
    got = codecs.decode(bytes(rez[2]["data"]))
    assert got.shape[2] == 4                  # alpha survived
    np.testing.assert_array_equal(got, codecs.resize_nearest(rgba, 16))
    feats = {r["media_id"]: r["features"]
             for r in extract_features(media).collect()}
    assert feats[1][3] == pytest.approx(float(rgb.mean()) / 255.0,
                                        rel=1e-6)
    assert feats[2][2] == pytest.approx(4 / 4)


def test_png_palette_decode():
    """Color type 3: index bytes expand through PLTE to RGB; missing
    or overflowed palettes refuse as UnsupportedFormat."""
    import zlib

    def chunk(ctype, payload):
        return (len(payload).to_bytes(4, "big") + ctype + payload
                + (zlib.crc32(ctype + payload)
                   & 0xFFFFFFFF).to_bytes(4, "big"))

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [7, 7, 7]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    scan = np.concatenate(
        [np.zeros((2, 1), dtype=np.uint8), idx], axis=1)  # filter 0
    ihdr = ((3).to_bytes(4, "big") + (2).to_bytes(4, "big")
            + bytes([8, 3, 0, 0, 0]))

    def build(plte):
        body = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte is not None:
            body += chunk(b"PLTE", plte)
        return (body
                + chunk(b"IDAT", zlib.compress(scan.tobytes()))
                + chunk(b"IEND", b""))

    got = codecs.decode(build(pal.tobytes()))
    np.testing.assert_array_equal(got, pal[idx])
    assert got.shape == (2, 3, 3)
    with pytest.raises(codecs.UnsupportedFormat, match="PLTE"):
        codecs.decode(build(None))                    # no palette
    with pytest.raises(codecs.UnsupportedFormat, match="PLTE"):
        codecs.decode(build(pal.tobytes()[:-1]))      # len % 3 != 0
    with pytest.raises(codecs.UnsupportedFormat, match="out of"):
        codecs.decode(build(pal.tobytes()[:9]))       # index 3 > max


# ---------------------------------------------------------------- WAV

def _tone(n=800, rate=8000, ch=2):
    t = np.arange(n) / rate
    left = np.sin(2 * np.pi * 440 * t)
    right = 0.25 * np.sin(2 * np.pi * 220 * t)
    return np.stack([left, right], axis=1)[:, :ch], rate


def test_wav_round_trip_16_and_8_bit():
    s, rate = _tone()
    for bits, tol in ((16, 1 / 32767), (8, 1 / 127)):
        data = codecs.make_wav(s, rate, bits=bits)
        assert codecs.sniff(data) == "wav"
        got, got_rate = codecs.decode_wav(data)
        assert got_rate == rate and got.shape == s.shape
        assert float(np.abs(got - s).max()) <= 2 * tol
    mono = codecs.make_wav(s[:, :1], rate)
    got, _ = codecs.decode_wav(mono)
    assert got.shape == (800, 1)


def test_wav_unsupported_variants_refuse():
    s, rate = _tone(64)
    good = bytearray(codecs.make_wav(s, rate))
    fmt_at = bytes(good).index(b"fmt ") + 8
    nonpcm = bytearray(good)
    nonpcm[fmt_at:fmt_at + 2] = (2).to_bytes(2, "little")  # ADPCM
    with pytest.raises(codecs.UnsupportedFormat, match="non-PCM"):
        codecs.decode_wav(bytes(nonpcm))
    deep = bytearray(good)
    deep[fmt_at + 14:fmt_at + 16] = (20).to_bytes(2, "little")
    with pytest.raises(codecs.UnsupportedFormat, match="20-bit"):
        codecs.decode_wav(bytes(deep))
    with pytest.raises(codecs.UnsupportedFormat, match="truncated"):
        codecs.decode_wav(bytes(good[:60]))   # cut mid-data-chunk
    with pytest.raises(codecs.UnsupportedFormat, match="missing"):
        codecs.decode_wav(bytes(good[:40]))   # data header sheared
    with pytest.raises(codecs.UnsupportedFormat, match="not a RIFF"):
        codecs.decode_wav(b"RIFFxxxxJUNK")
    # image decode() refuses WAV with a pointer at decode_wav
    with pytest.raises(codecs.UnsupportedFormat, match="decode_wav"):
        codecs.decode(bytes(good))


def test_wav_through_spark_passes(spark):
    """Audio modality rides the real tier: decode reports
    (frames, rate, channels) and features carry true waveform
    statistics; a non-PCM payload falls to the stub."""
    s, rate = _tone()
    good = codecs.make_wav(s, rate)
    nonpcm = bytearray(good)
    at = good.index(b"fmt ") + 8
    nonpcm[at:at + 2] = (3).to_bytes(2, "little")
    rows = [(1, "audio", bytearray(good), "t", 0),
            (2, "audio", bytes(nonpcm), "t", 0)]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, data binary, "
              "source string, n_bytes long")
    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (dec[1]["width"], dec[1]["height"], dec[1]["n_channels"],
            dec[1]["decoder"]) == (800, rate, 2, "wav")
    assert dec[2]["decoder"] == "stub"
    feats = {r["media_id"]: r["features"]
             for r in extract_features(media).collect()}
    assert feats[1][0] == pytest.approx((800 / rate) / 3600.0)
    assert feats[1][1] == pytest.approx(rate / 192_000)
    rms = float(np.sqrt((s ** 2).mean()))
    assert feats[1][3] == pytest.approx(rms, rel=1e-3)
    assert all(0.0 <= v <= 1.0 for v in feats[1])
    assert all(0.0 <= v <= 1.0 for v in feats[2])   # stub tier


# ---------------------------------------------------------------- Y4M

def _clip(n=10, h=6, w=8):
    return (np.arange(n * h * w, dtype=np.uint64) * 31 % 251) \
        .astype(np.uint8).reshape(n, h, w)


def test_y4m_round_trip_and_subset():
    clip = _clip()
    for chroma in ("420", "444", "mono"):
        data = codecs.make_y4m(clip, chroma=chroma)
        assert codecs.sniff(data) == "y4m"
        frames, meta = codecs.decode_y4m(data)
        assert (meta["width"], meta["height"],
                meta["n_frames"], meta["chroma"]) == (8, 6, 10, chroma)
        assert len(frames) == 10
        np.testing.assert_array_equal(
            np.stack(frames)[:, :, :, 0], clip)
    # subset selection materializes only the picks
    frames, meta = codecs.decode_y4m(codecs.make_y4m(clip), [0, 9])
    assert len(frames) == 2 and meta["n_frames"] == 10
    np.testing.assert_array_equal(frames[1][:, :, 0], clip[9])
    assert codecs.y4m_frame_count(codecs.make_y4m(clip)) == 10


def test_y4m_frame_count_ignores_marker_bytes_in_luma():
    """Luma bytes spelling b'FRAME' must not inflate the count — the
    count walks the parse, it doesn't grep."""
    clip = _clip(3)
    flat = clip.copy()
    flat.reshape(3, -1)[:, :5] = np.frombuffer(b"FRAME", np.uint8)
    data = codecs.make_y4m(flat)
    assert codecs.y4m_frame_count(data) == 3
    frames, _ = codecs.decode_y4m(data)
    np.testing.assert_array_equal(np.stack(frames)[:, :, :, 0], flat)


def test_y4m_unsupported_variants_refuse():
    clip = _clip(2)
    good = codecs.make_y4m(clip)
    with pytest.raises(codecs.UnsupportedFormat, match="chroma"):
        codecs.decode_y4m(good.replace(b"C420", b"C410", 1))
    # a KNOWN tag over wrong-sized frames refuses on size, not magic
    with pytest.raises(codecs.UnsupportedFormat):
        codecs.decode_y4m(good.replace(b"C420", b"C444", 1))
    with pytest.raises(codecs.UnsupportedFormat, match="interlaced"):
        codecs.decode_y4m(good.replace(b"Ip", b"It", 1))
    with pytest.raises(codecs.UnsupportedFormat, match="truncated"):
        codecs.decode_y4m(good[:-10])
    with pytest.raises(codecs.UnsupportedFormat, match="W/H"):
        codecs.decode_y4m(b"YUV4MPEG2 H6\nFRAME\n")
    with pytest.raises(codecs.UnsupportedFormat, match="decode_y4m"):
        codecs.decode(good)   # image decode() points at the video API


def test_y4m_through_spark_passes(spark):
    """Video modality is REAL for Y4M: decode reports (w, h,
    n_frames), frame_sample emits true strided luma frames as PGM
    (round-tripping through the image codec), features carry real
    luma statistics; non-Y4M video payloads keep the byte-window
    stub."""
    from big_data_bowl___2023_spark.multimodal.binary_ops import (
        frame_sample,
    )

    clip = _clip(9)
    rows = [(1, "video", bytearray(codecs.make_y4m(clip)), "t", 0),
            (2, "video", bytearray(b"mpegish opaque payload bytes"),
             "t", 0)]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, data binary, "
              "source string, n_bytes long")
    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (dec[1]["width"], dec[1]["height"], dec[1]["n_channels"],
            dec[1]["decoder"]) == (8, 6, 9, "y4m")
    assert dec[2]["decoder"] == "stub"

    got = {}
    for r in frame_sample(media, max_frames=4).collect():
        got.setdefault(r["media_id"], []).append(
            (r["frame_index"], bytes(r["frame_bytes"])))
    idxs = sorted(i for i, _ in got[1])
    assert idxs[0] == 0 and idxs[-1] == 8 and len(idxs) == 4
    for i, raw in got[1]:
        np.testing.assert_array_equal(
            codecs.decode(raw)[:, :, 0], clip[i])   # PGM round-trip
    assert len(got[2]) >= 1                          # stub windows

    feats = {r["media_id"]: r["features"]
             for r in extract_features(media).collect()}
    picks = np.stack([clip[i] for i in idxs]).astype(np.float64)
    assert feats[1][3] == pytest.approx(picks.mean() / 255.0,
                                        rel=1e-6)
    assert all(0.0 <= v <= 1.0 for v in feats[1])

    rez = {r["media_id"]: r
           for r in resize_media(media, max_side=4).collect()}
    poster = codecs.decode(bytes(rez[1]["data"]))   # PGM round-trip
    np.testing.assert_array_equal(
        poster, codecs.resize_nearest(clip[0][:, :, None], 4))


def test_media_from_binary_files_bridge(spark, tmp_path):
    """The bucket -> binaryFile -> media bridge: modality inferred
    from magic bytes JVM-side (no Python UDF in the plan), falling
    back to extension, then "unknown" (a PDF must not profile as an
    image); the resulting table feeds decode_media's real tiers
    directly."""
    from big_data_bowl___2023_spark.multimodal.binary_ops import (
        media_from_binary_files,
    )
    from big_data_bowl___2023_spark.sources.io import (
        read_binary_files,
    )

    img = _grad(6, 8)
    s, rate = _tone(64)
    clip = _clip(3)
    assets = tmp_path / "assets"
    assets.mkdir()
    (assets / "a.bmp").write_bytes(codecs.make_bmp(img))
    (assets / "b.dat").write_bytes(codecs.make_wav(s, rate))  # magic
    (assets / "c.y4m").write_bytes(codecs.make_y4m(clip))
    (assets / "d.mp3").write_bytes(b"\x00opaque-not-a-real-mp3")
    (assets / "e.bin").write_bytes(b"no magic and no known ext")

    media = media_from_binary_files(
        read_binary_files(spark, str(assets)))
    plan = media._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan
    rows = {r["source"].rsplit("/", 1)[-1]: r for r in media.collect()}
    assert rows["a.bmp"]["modality"] == "image"
    assert rows["b.dat"]["modality"] == "audio"    # magic beats ext
    assert rows["c.y4m"]["modality"] == "video"
    assert rows["d.mp3"]["modality"] == "audio"    # ext fallback
    assert rows["e.bin"]["modality"] == "unknown"  # final fallback
    assert len({r["media_id"] for r in rows.values()}) == 5
    assert all(r["n_bytes"] > 0 for r in rows.values())

    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    by_name = {n: dec[rows[n]["media_id"]]["decoder"] for n in rows}
    assert by_name["a.bmp"] == "bmp"
    assert by_name["b.dat"] == "wav"
    assert by_name["c.y4m"] == "y4m"
    assert by_name["d.mp3"] == "stub"
    assert by_name["e.bin"] == "unknown-stub"


# ------------------------------------------------- JPEG/GIF dims

def _jpeg(w, h, ch=3, progressive=False):
    """Minimal well-formed JPEG prefix: SOI, APP0, (DHT,) SOF, EOI —
    enough structure for the marker walk; no entropy data."""
    def seg(marker, payload):
        return bytes([0xFF, marker]) \
            + (len(payload) + 2).to_bytes(2, "big") + payload

    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ch]) + bytes([1, 0x11, 0]) * ch
    return (b"\xff\xd8"
            + seg(0xE0, b"JFIF\x00" + b"\x00" * 8)
            + seg(0xC4, b"\x00" * 16)           # DHT: not a SOF
            + seg(0xC2 if progressive else 0xC0, sof)
            + b"\xff\xd9")


def test_jpeg_gif_header_dims():
    assert codecs.sniff(_jpeg(640, 480)) == "jpeg"
    assert codecs.image_dims(_jpeg(640, 480)) == (640, 480, 3)
    assert codecs.image_dims(_jpeg(31, 17, ch=1,
                                   progressive=True)) == (31, 17, 1)
    gif = b"GIF89a" + (320).to_bytes(2, "little") \
        + (200).to_bytes(2, "little") + b"\x00\x00\x00"
    assert codecs.sniff(gif) == "gif"
    assert codecs.image_dims(gif) == (320, 200, 3)
    # refusals stay typed
    with pytest.raises(codecs.UnsupportedFormat, match="SOF"):
        codecs.image_dims(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    with pytest.raises(codecs.UnsupportedFormat, match="truncated"):
        codecs.image_dims(_jpeg(640, 480)[:10])
    with pytest.raises(codecs.UnsupportedFormat, match="DHT"):
        # header-only fixture: its 16-byte stub DHT (no BITS table)
        # is the first thing the full decoder rejects
        codecs.decode(_jpeg(2, 2))
    with pytest.raises(codecs.UnsupportedFormat):
        codecs.image_dims(codecs.make_bmp(_grad(2, 2)))


def test_jpeg_fill_bytes_before_marker():
    """ITU T.81 B.1.1.2: any number of 0xFF fill bytes may pad before
    a marker byte — the walk must skip them, not lose sync."""
    j = _jpeg(640, 480)
    # splice fill bytes before the SOF marker (FF C0 -> FF FF FF C0)
    sof_at = j.index(b"\xff\xc0")
    padded = j[:sof_at] + b"\xff\xff" + j[sof_at:]
    assert codecs.image_dims(padded) == (640, 480, 3)
    # and before an earlier segment too
    app0_at = j.index(b"\xff\xe0")
    padded2 = j[:app0_at] + b"\xff" * 5 + j[app0_at:]
    assert codecs.image_dims(padded2) == (640, 480, 3)


def test_png_decompression_bomb_rejected():
    """A PNG whose IHDR claims huge dims over a small compressed
    stream must be rejected BEFORE inflating (memory-exhaustion DoS
    guard for untrusted corpora), and an IDAT that inflates past the
    IHDR-implied size must be refused too."""
    good = codecs.make_png(_grad(4, 4))
    # patch IHDR dims to 20000x20000 (RGBA would be ~1.6 GB) and
    # re-CRC the chunk: must refuse before any inflate
    w = (20000).to_bytes(4, "big")
    ihdr = w + w + good[24:29]
    import zlib as _z
    crc = (_z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF).to_bytes(4, "big")
    bomb = good[:16] + ihdr + crc + good[33:]
    with pytest.raises(codecs.UnsupportedFormat, match="cap"):
        codecs.decode(bomb)
    # oversized stream under honest dims: inflate stops at the bound
    arr = _grad(2, 2)
    png = codecs.make_png(arr, filter_type=0)
    # rebuild with an IDAT holding 10 rows' worth of scanlines
    scan = (b"\x00" + bytes(2 * 3)) * 10
    idat = _z.compress(scan)

    def chunk(ctype, payload):
        return (len(payload).to_bytes(4, "big") + ctype + payload
                + (_z.crc32(ctype + payload)
                   & 0xFFFFFFFF).to_bytes(4, "big"))

    fat = png[:33] + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    with pytest.raises(codecs.UnsupportedFormat, match="larger"):
        codecs.decode(fat)


def test_jpeg_gif_through_decode_media(spark):
    """decode_media reports TRUE dims for JPEG/GIF (metadata-grade,
    decoder '<kind>-dims'); features/resize stay stub-tier for them
    — honest partial support, never a crash."""
    rows = [(1, "image", bytearray(_jpeg(640, 480)), "t", 0),
            (2, "image", bytearray(
                b"GIF87a" + (320).to_bytes(2, "little")
                + (200).to_bytes(2, "little") + b"\x00\x00\x00"),
             "t", 0)]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, data binary, "
              "source string, n_bytes long")
    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (dec[1]["width"], dec[1]["height"], dec[1]["n_channels"],
            dec[1]["decoder"]) == (640, 480, 3, "jpeg-dims")
    assert (dec[2]["width"], dec[2]["height"],
            dec[2]["decoder"]) == (320, 200, "gif-dims")
    assert extract_features(media).count() == 2     # stub, no crash
    assert resize_media(media, max_side=8).count() == 2


def test_webp_header_dims():
    """All three WebP container variants yield exact dims."""
    def riff(fourcc, body):
        chunk = fourcc + len(body).to_bytes(4, "little") + body
        return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") \
            + b"WEBP" + chunk

    # lossy VP8 : 3-byte frame tag, start code, 14-bit LE dims
    vp8 = riff(b"VP8 ", b"\x00\x00\x00" + b"\x9d\x01\x2a"
               + (640).to_bytes(2, "little")
               + (360).to_bytes(2, "little") + b"\x00" * 8)
    assert codecs.sniff(vp8) == "webp"
    assert codecs.image_dims(vp8) == (640, 360, 3)
    # lossless VP8L: 0x2F then packed 14-bit w-1 / h-1 (+alpha bit)
    bits = (99 | (49 << 14) | (1 << 28))
    vp8l = riff(b"VP8L", b"\x2f" + bits.to_bytes(4, "little")
                + b"\x00" * 8)
    assert codecs.image_dims(vp8l) == (100, 50, 4)
    # extended VP8X: feature byte + 24-bit LE canvas minus one
    vp8x = riff(b"VP8X", bytes([0x10, 0, 0, 0])
                + (319).to_bytes(3, "little")
                + (199).to_bytes(3, "little"))
    assert codecs.image_dims(vp8x) == (320, 200, 4)
    vp8x_noalpha = riff(b"VP8X", bytes([0x00, 0, 0, 0])
                        + (319).to_bytes(3, "little")
                        + (199).to_bytes(3, "little"))
    assert codecs.image_dims(vp8x_noalpha) == (320, 200, 3)
    # refusals stay typed
    with pytest.raises(codecs.UnsupportedFormat, match="start? code|key-frame"):
        codecs.image_dims(riff(b"VP8 ", b"\x00" * 16))
    with pytest.raises(codecs.UnsupportedFormat, match="chunk"):
        codecs.image_dims(riff(b"ANIM", b"\x00" * 16))
    with pytest.raises(codecs.UnsupportedFormat, match="image_dims"):
        codecs.decode(vp8)


def test_media_near_dup_pairs(spark):
    """Image near-dup over media payloads: one features pass feeding
    the embedding-dedup GEMM pipeline — exact duplicates land at
    cosine 1.0, a near-variant above the threshold, an unrelated
    image below it; the LSH variant agrees on the planted pair."""
    from big_data_bowl___2023_spark.multimodal.binary_ops import (
        media_near_dup_pairs,
    )

    base = _grad(24, 18)
    near = base.copy()
    near[0, 0] = [255, 255, 255]            # one-pixel variant
    other = 255 - base                      # different statistics
    rows = [(1, "image", bytearray(codecs.make_bmp(base)), "t", 0),
            (2, "image", bytearray(codecs.make_png(base)), "t", 0),
            (3, "image", bytearray(codecs.make_bmp(near)), "t", 0),
            (4, "image", bytearray(codecs.make_bmp(other)), "t", 0)]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, data binary, "
              "source string, n_bytes long")
    pairs = {(r["media_id_a"], r["media_id_b"]): r["cosine"]
             for r in media_near_dup_pairs(media, 0.999).collect()}
    # identical pixels through two containers: exact feature match
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and (2, 3) in pairs   # near-variant
    assert not any(4 in p for p in pairs)        # unrelated below
    lsh = {(r["media_id_a"], r["media_id_b"])
           for r in media_near_dup_pairs(media, 0.999,
                                         use_lsh=True).collect()}
    assert (1, 2) in lsh                    # LSH recalls the twin


def test_streaming_media_ingest(spark, tmp_path):
    """The continuous media-ingestion shape: a streaming binaryFile
    source over a landing dir -> the magic-byte bridge -> the real
    decode pass inside foreachBatch, appended durably. New files
    arriving between triggers land in later batches with correct
    tier attribution."""
    from big_data_bowl___2023_spark.multimodal.binary_ops import (
        media_from_binary_files,
    )
    from big_data_bowl___2023_spark.sources.io import (
        read_binary_files_stream,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "decoded")
    (landing / "a.bin").write_bytes(codecs.make_bmp(_grad(6, 8)))
    (landing / "b.bin").write_bytes(b"junk with no magic at all")

    stream = read_binary_files_stream(spark, str(landing),
                                      glob_filter="*.bin")
    assert stream.isStreaming

    def sink(batch_df, batch_id):
        decode_media(media_from_binary_files(batch_df)) \
            .write.mode("append").parquet(out)

    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="1 second")
         .start())
    try:
        q.processAllAvailable()
        (landing / "c.bin").write_bytes(
            codecs.make_png(_grad(4, 4)))   # late arrival
        q.processAllAvailable()
    finally:
        q.stop()
    spark.catalog.refreshByPath(out)
    rows = spark.read.parquet(out).collect()
    tiers = sorted(r["decoder"] for r in rows)
    assert tiers == ["bmp", "png", "unknown-stub"]
    assert {r["modality"] for r in rows} == {"image", "unknown"}


def test_wav_24_32_and_float_formats():
    """24/32-bit PCM and 32/64-bit IEEE-float WAVs decode to the
    same float64 [-1, 1] contract; compressed formats still
    refuse."""
    t = np.arange(64) / 64.0
    tone = np.stack([np.sin(2 * np.pi * 4 * t),
                     np.cos(2 * np.pi * 4 * t)], axis=1)

    def wav(fmt, bits, payload):
        body = (b"fmt " + (16).to_bytes(4, "little")
                + fmt.to_bytes(2, "little")
                + (2).to_bytes(2, "little")
                + (8000).to_bytes(4, "little")
                + (8000 * 2 * bits // 8).to_bytes(4, "little")
                + (2 * bits // 8).to_bytes(2, "little")
                + bits.to_bytes(2, "little"))
        data = b"data" + len(payload).to_bytes(4, "little") + payload
        riff = b"WAVE" + body + data
        return b"RIFF" + len(riff).to_bytes(4, "little") + riff

    v = np.round(tone * 8388607).astype(np.int64).reshape(-1)
    b = np.zeros((v.size, 3), np.uint8)
    u = (v & 0xFFFFFF).astype(np.int64)
    b[:, 0], b[:, 1], b[:, 2] = (u & 0xFF, (u >> 8) & 0xFF,
                                 (u >> 16) & 0xFF)
    s24, rate = codecs.decode_wav(wav(1, 24, b.tobytes()))
    assert rate == 8000 and s24.shape == (64, 2)
    assert np.abs(s24 - tone).max() < 1e-6
    # sign-extension edge cases at full scale: 0x800000 = -8388608,
    # 0x7FFFFF = +8388607, 0xFFFFFF = -1 (well-defined uint32
    # assembly + int32 view, not signed-shift wraparound)
    edges = bytes([0x00, 0x00, 0x80, 0xFF, 0xFF, 0x7F,
                   0xFF, 0xFF, 0xFF, 0x01, 0x00, 0x00])
    se, _ = codecs.decode_wav(wav(1, 24, edges))
    assert se.reshape(-1).tolist() == pytest.approx(
        [-1.0, 8388607 / 8388608.0, -1 / 8388608.0, 1 / 8388608.0])
    i32 = np.round(tone * 2147483647).astype("<i4")
    s32, _ = codecs.decode_wav(wav(1, 32, i32.reshape(-1).tobytes()))
    assert np.abs(s32 - tone).max() < 1e-6
    f32 = tone.astype("<f4").reshape(-1).tobytes()
    sf, _ = codecs.decode_wav(wav(3, 32, f32))
    assert np.abs(sf - tone).max() < 1e-6
    f64 = tone.astype("<f8").reshape(-1).tobytes()
    sd, _ = codecs.decode_wav(wav(3, 64, f64))
    assert np.abs(sd - tone).max() < 1e-12
    # out-of-range float input clamps to the contract
    hot = (tone * 3).astype("<f4").reshape(-1).tobytes()
    sh, _ = codecs.decode_wav(wav(3, 32, hot))
    assert sh.max() <= 1.0 and sh.min() >= -1.0
    with pytest.raises(codecs.UnsupportedFormat, match="format 2"):
        codecs.decode_wav(wav(2, 16, b"\x00" * 64))
    with pytest.raises(codecs.UnsupportedFormat, match="float"):
        codecs.decode_wav(wav(3, 16, b"\x00" * 64))


def test_y4m_422_and_411_frame_strides():
    """C422/C411 streams decode — the luma extraction is
    chroma-agnostic once the frame stride is right; odd-width 4:2:2
    refuses."""
    clip = (np.arange(2 * 8 * 12, dtype=np.uint64) % 251) \
        .astype(np.uint8).reshape(2, 8, 12)
    h, w = 8, 12
    for tag, cw in (("422", w // 2), ("411", w // 4)):
        out = bytearray(f"YUV4MPEG2 W{w} H{h} C{tag} Ip\n".encode())
        for f in range(2):
            out += b"FRAME\n" + clip[f].tobytes() + bytes(cw * h) * 2
        lumas, meta = codecs.decode_y4m(bytes(out), [0, 1])
        assert meta["chroma"] == tag and meta["n_frames"] == 2
        assert np.array_equal(lumas[1][:, :, 0], clip[1])
    with pytest.raises(codecs.UnsupportedFormat, match="odd width"):
        codecs.decode_y4m(b"YUV4MPEG2 W11 H8 C422\nFRAME\n"
                          + bytes(11 * 8 * 2), [0])
