"""Baseline JPEG codec (multimodal/jpeg.py — verdict r12 #2).

Contracts under test:
* encoder→decoder round trips pin BOTH transform directions (they
  share no code: FDCT vs IDCT, bit writer vs bit reader, separate
  zigzag mappings) — with all-ones quant tables the pipeline is
  near-lossless, so parity bounds are tight (±1 for grayscale —
  FDCT coefficient rounding; ±3 for color where YCbCr round-trips);
* every structural feature decodes: non-multiple-of-8 dims, 4:2:0
  subsampling, restart intervals, Annex K lossy tables, byte
  stuffing (0xFF00), fill bytes;
* progressive (SOF2) streams decode too — DC first + refinement,
  AC first + refinement with EOB runs, bit-identical to the
  baseline decode of the same quantized coefficients;
* everything outside the huffman envelope refuses with
  `UnsupportedFormat` (arithmetic, 12-bit, CMYK, Adobe-RGB,
  truncated streams) — falling to the metadata tier, never
  mis-decoding;
* the Spark passes attribute the tier honestly: baseline AND
  progressive JPEG → decoder "jpeg" with REAL features/resize;
  arithmetic → the "jpeg-dims" metadata tier.
"""

from __future__ import annotations

import numpy as np
import pytest

from big_data_bowl___2023_spark.multimodal import codecs, jpeg
from big_data_bowl___2023_spark.multimodal.binary_ops import (
    decode_media,
    extract_features,
    resize_media,
)


def _smooth(h, w):
    """Smooth (h, w, 3) gradient — JPEG-friendly content."""
    y = np.add.outer(np.arange(h), np.arange(w)) * 2 % 256
    return np.stack([y, 255 - y, np.full((h, w), 96)],
                    axis=2).astype(np.uint8)


def test_flat_block_exact():
    flat = np.full((8, 8, 1), 128, dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.make_jpeg(flat))
    assert np.array_equal(out, flat)
    # non-mid flat value too (exercises DC magnitude categories)
    flat2 = np.full((8, 8, 1), 3, dtype=np.uint8)
    assert np.array_equal(jpeg.decode_jpeg(jpeg.make_jpeg(flat2)),
                          flat2)


def test_gray_round_trip_exact_nonmultiple_dims():
    g = (np.add.outer(np.arange(17) * 3, np.arange(24) * 2)
         % 256).astype(np.uint8)[..., None]
    out = jpeg.decode_jpeg(jpeg.make_jpeg(g))
    assert out.shape == (17, 24, 1)
    # all-ones quant: only FDCT coefficient rounding survives (±1)
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 1


def test_rgb_444_round_trip_tight():
    rng = np.random.default_rng(7)
    c = rng.integers(0, 256, (20, 13, 3), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.make_jpeg(c))
    assert out.shape == c.shape
    # YCbCr→RGB round-trip rounding only (worst case ±3 even for
    # noise input)
    assert np.abs(out.astype(int) - c.astype(int)).max() <= 3


def test_rgb_420_subsampled_round_trip():
    # chroma-flat content: 2x2 box downsample is lossless there, so
    # the bound stays tight even at 4:2:0
    flat = np.zeros((19, 22, 3), dtype=np.uint8)
    flat[..., 0] = (np.add.outer(np.arange(19) * 5,
                                 np.arange(22) * 3) % 256)
    flat[..., 1] = 80
    flat[..., 2] = 160
    data = jpeg.make_jpeg(flat, subsample=True)
    out = jpeg.decode_jpeg(data)
    assert out.shape == flat.shape
    assert np.abs(out.astype(int) - flat.astype(int)).max() <= 4
    # the stream really is 4:2:0: SOF lists Y at 2x2
    sof_at = data.index(b"\xff\xc0")
    assert data[sof_at + 11] == 0x22        # comp 1 h<<4|v


def test_restart_intervals_decode():
    g = (np.add.outer(np.arange(33) * 7, np.arange(26) * 5)
         % 256).astype(np.uint8)[..., None]
    data = jpeg.make_jpeg(g, restart_interval=2)
    assert b"\xff\xd0" in data              # RST0 present
    out = jpeg.decode_jpeg(data)
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 1
    # color + subsample + restart together
    c = _smooth(21, 18)
    data = jpeg.make_jpeg(c, subsample=True, restart_interval=1)
    out = jpeg.decode_jpeg(data)
    assert np.abs(out.astype(int) - c.astype(int)).max() <= 4


def test_annex_k_lossy_round_trip():
    c = _smooth(32, 32)
    out = jpeg.decode_jpeg(jpeg.make_jpeg(c, quant="annex-k"))
    assert out.shape == c.shape
    # lossy but recognizable on smooth content
    assert np.abs(out.astype(int) - c.astype(int)).mean() < 12
    # scalar flat quant too
    out = jpeg.decode_jpeg(jpeg.make_jpeg(c, quant=4))
    assert np.abs(out.astype(int) - c.astype(int)).mean() < 6


def test_byte_stuffing_round_trip():
    # content chosen to force 0xFF bytes into the entropy stream
    # across many seeds — the writer must stuff, the reader unstuff
    rng = np.random.default_rng(1234)
    for _ in range(4):
        g = rng.integers(0, 256, (24, 24, 1), dtype=np.uint8)
        data = jpeg.make_jpeg(g)
        out = jpeg.decode_jpeg(data)
        assert np.abs(out.astype(int) - g.astype(int)).max() <= 1


def test_unsupported_variants_refuse():
    c = _smooth(16, 16)
    data = jpeg.make_jpeg(c)
    sof_at = data.index(b"\xff\xc0")
    # arithmetic-coded: outside the huffman envelope
    arith = data[:sof_at + 1] + b"\xc9" + data[sof_at + 2:]
    with pytest.raises(codecs.UnsupportedFormat, match="arithmetic"):
        jpeg.decode_jpeg(arith)
    # ...but the metadata tier still reads its dims
    assert codecs.image_dims(arith) == (16, 16, 3)
    # a fake-progressive stream (SOF2 over a BASELINE scan header,
    # Ss=0/Se=63) refuses typed instead of mis-decoding
    fake_prog = data[:sof_at + 1] + b"\xc2" + data[sof_at + 2:]
    with pytest.raises(codecs.UnsupportedFormat,
                       match="mixes DC and AC"):
        jpeg.decode_jpeg(fake_prog)
    # 12-bit: patch the SOF precision byte
    deep = data[:sof_at + 4] + b"\x0c" + data[sof_at + 5:]
    with pytest.raises(codecs.UnsupportedFormat, match="12-bit"):
        jpeg.decode_jpeg(deep)
    # truncated entropy stream
    with pytest.raises(codecs.UnsupportedFormat):
        jpeg.decode_jpeg(data[:len(data) - len(data) // 3])
    # not a JPEG at all
    with pytest.raises(codecs.UnsupportedFormat):
        jpeg.decode_jpeg(b"\x00\x01\x02\x03")


def test_jpeg_decompression_bomb_rejected():
    """A crafted SOF claiming huge dims must be rejected BEFORE any
    coefficient-array allocation or entropy work (the JPEG analogue
    of the PNG inflate cap — review r13): a 65500x65500 3-component
    claim would otherwise allocate tens of GiB and spin the per-MCU
    loop for hours on one untrusted blob."""
    data = jpeg.make_jpeg(_smooth(8, 8))
    sof_at = data.index(b"\xff\xc0")
    # SOF payload: len(2) precision(1) h(2) w(2) — patch h and w
    big = (65500).to_bytes(2, "big")
    bomb = data[:sof_at + 5] + big + big + data[sof_at + 9:]
    with pytest.raises(codecs.UnsupportedFormat, match="cap"):
        jpeg.decode_jpeg(bomb)
    # ...and the header classifier refuses it too, so decode_media
    # attributes the metadata tier, not a decode that would die
    assert jpeg.is_baseline(bomb) is False
    assert jpeg.is_baseline(data) is True


def test_is_baseline_header_classifier():
    """is_baseline mirrors decode_jpeg's envelope from the header
    alone — no entropy read (it backs the decode_media tier label
    at header-walk cost)."""
    base = jpeg.make_jpeg(_smooth(16, 16))
    assert jpeg.is_baseline(base) is True
    gray = jpeg.make_jpeg(_smooth(16, 16)[:, :, :1])
    assert jpeg.is_baseline(gray) is True
    sub = jpeg.make_jpeg(_smooth(16, 16), subsample=True,
                         restart_interval=1)
    assert jpeg.is_baseline(sub) is True
    sof_at = base.index(b"\xff\xc0")
    prog = base[:sof_at + 1] + b"\xc2" + base[sof_at + 2:]
    assert jpeg.is_baseline(prog) is False
    assert jpeg.is_decodable(prog) is True   # SOF2 decodes now
    arith = base[:sof_at + 1] + b"\xc9" + base[sof_at + 2:]
    assert jpeg.is_decodable(arith) is False
    deep = base[:sof_at + 4] + b"\x0c" + base[sof_at + 5:]
    assert jpeg.is_baseline(deep) is False
    app14 = (b"\xff\xee" + (14).to_bytes(2, "big")
             + b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0]))
    assert jpeg.is_baseline(base[:2] + app14 + base[2:]) is False
    # header-only fixture without a scan refuses; junk refuses
    assert jpeg.is_baseline(base[:sof_at]) is False
    assert jpeg.is_baseline(b"\xff\xd8\xff\xd9") is False
    assert jpeg.is_baseline(b"not a jpeg") is False


def test_adobe_rgb_transform_refuses():
    c = _smooth(8, 8)
    data = jpeg.make_jpeg(c)
    # splice an APP14 Adobe segment with transform=0 (RGB) after SOI
    app14 = (b"\xff\xee" + (14).to_bytes(2, "big")
             + b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0]))
    patched = data[:2] + app14 + data[2:]
    with pytest.raises(codecs.UnsupportedFormat, match="Adobe"):
        jpeg.decode_jpeg(patched)


def test_decode_dispatch_and_fill_bytes():
    c = _smooth(12, 10)
    data = jpeg.make_jpeg(c)
    # codecs.decode routes jpeg to the full decoder now
    out = codecs.decode(data)
    assert out.shape == (12, 10, 3)
    # fill bytes before SOF survive the full decoder's walk too
    sof_at = data.index(b"\xff\xc0")
    padded = data[:sof_at] + b"\xff\xff" + data[sof_at:]
    assert np.array_equal(codecs.decode(padded), out)


def test_baseline_jpeg_through_spark_passes(spark):
    """decode_media attributes tier "jpeg" with TRUE dims for
    baseline AND progressive streams; features/resize run the REAL
    tier (image statistics, not hash stubs); arithmetic-coded
    streams stay "jpeg-dims"."""
    base = _smooth(24, 15)
    data = jpeg.make_jpeg(base)
    sof_at = data.index(b"\xff\xc0")
    prog = data[:sof_at + 1] + b"\xc9" + data[sof_at + 2:]
    rows = [(1, "image", bytearray(data), "t", len(data)),
            (2, "image", bytearray(prog), "t", len(prog))]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, data binary, "
              "source string, n_bytes long")
    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (dec[1]["width"], dec[1]["height"], dec[1]["n_channels"],
            dec[1]["decoder"]) == (15, 24, 3, "jpeg")
    assert (dec[2]["width"], dec[2]["height"],
            dec[2]["decoder"]) == (15, 24, "jpeg-dims")
    # features: the real tier's leading entries are normalized dims
    feats = {r["media_id"]: r["features"]
             for r in extract_features(media).collect()}
    assert feats[1][0] == pytest.approx(15 / 4096)
    assert feats[1][1] == pytest.approx(24 / 4096)
    # resize: real decode -> nearest resize -> netpbm bytes
    rs = {r["media_id"]: r
          for r in resize_media(media, max_side=8).collect()}
    assert (rs[1]["width"], rs[1]["height"]) == (5, 8)
    assert bytes(rs[1]["data"])[:2] == b"P6"


def test_progressive_round_trips():
    """Progressive (SOF2) decode: DC first + refinement, AC first +
    refinement with EOB runs — same near-lossless bounds as the
    baseline path, and bit-identical output to the baseline decode
    of the same quantized coefficients."""
    g = (np.add.outer(np.arange(17) * 3, np.arange(24) * 2)
         % 256).astype(np.uint8)[..., None]
    pd_ = jpeg.make_jpeg(g, progressive=True)
    assert b"\xff\xc2" in pd_
    assert np.abs(jpeg.decode_jpeg(pd_).astype(int)
                  - g.astype(int)).max() <= 1
    rng = np.random.default_rng(7)
    c = rng.integers(0, 256, (20, 13, 3), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.make_jpeg(c, progressive=True))
    assert np.abs(out.astype(int) - c.astype(int)).max() <= 3
    # progressive == baseline for identical coefficients
    assert np.array_equal(
        out, jpeg.decode_jpeg(jpeg.make_jpeg(c)))
    # 4:2:0 + restart intervals through the progressive path
    flat = np.zeros((19, 22, 3), dtype=np.uint8)
    flat[..., 0] = (np.add.outer(np.arange(19) * 5,
                                 np.arange(22) * 3) % 256)
    flat[..., 1] = 80
    flat[..., 2] = 160
    out = jpeg.decode_jpeg(
        jpeg.make_jpeg(flat, subsample=True, progressive=True))
    assert np.abs(out.astype(int) - flat.astype(int)).max() <= 4
    out = jpeg.decode_jpeg(
        jpeg.make_jpeg(g, progressive=True, restart_interval=2))
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 1
    # lossy progressive (annex-k) stays sane on smooth content
    sm = _smooth(32, 32)
    out = jpeg.decode_jpeg(
        jpeg.make_jpeg(sm, quant="annex-k", progressive=True))
    assert np.abs(out.astype(int) - sm.astype(int)).mean() < 12


def test_progressive_through_spark_passes(spark):
    """A REAL progressive stream attributes tier "jpeg" with true
    dims and real features (the is_decodable envelope covers
    SOF2)."""
    from big_data_bowl___2023_spark.multimodal.binary_ops import (
        decode_media as _dm,
        extract_features as _ef,
    )
    base = _smooth(24, 15)
    data = jpeg.make_jpeg(base, progressive=True)
    media = spark.createDataFrame(
        [(1, "image", bytearray(data), "t", len(data))],
        "media_id long, modality string, data binary, "
        "source string, n_bytes long")
    row = _dm(media).collect()[0]
    assert (row["width"], row["height"], row["n_channels"],
            row["decoder"]) == (15, 24, 3, "jpeg")
    feats = _ef(media).collect()[0]["features"]
    assert feats[0] == pytest.approx(15 / 4096)


def test_crafted_scan_headers_refuse_typed():
    """Corrupt scan structures raise UnsupportedFormat, never an
    untyped IndexError/OverflowError (review r13b): a 0-component
    progressive scan, and a DHT whose symbol claims a 120-bit DC
    magnitude (T.81 caps DC size categories at 11)."""
    c = _smooth(8, 8)
    pdata = jpeg.make_jpeg(c, progressive=True)
    sos_at = pdata.index(b"\xff\xda")
    seg_len = int.from_bytes(pdata[sos_at + 2:sos_at + 4], "big")
    ns0 = pdata[:sos_at + 2] + (6).to_bytes(2, "big") \
        + bytes([0, 0, 0, 0]) + pdata[sos_at + 2 + seg_len:]
    with pytest.raises(codecs.UnsupportedFormat, match="0-component"):
        jpeg.decode_jpeg(ns0)
    # baseline stream whose DC DHT maps a 1-bit code to symbol 120:
    # decode must refuse the size category, not overflow int32
    bits = [1] + [0] * 15
    dht = (b"\xff\xc4" + (2 + 17 + 1).to_bytes(2, "big")
           + bytes([0x00]) + bytes(bits) + bytes([120]))
    base = jpeg.make_jpeg(c)
    # replace the luma DC DHT (first 0xFFC4 segment)
    at = base.index(b"\xff\xc4")
    seg_len = int.from_bytes(base[at + 2:at + 4], "big")
    bad = base[:at] + dht + base[at + 2 + seg_len:]
    # force all-zero entropy so the first DC decode deterministically
    # hits the 1-bit code mapped to symbol 120
    sos_at = bad.index(b"\xff\xda")
    seg_len = int.from_bytes(bad[sos_at + 2:sos_at + 4], "big")
    bad = bad[:sos_at + 2 + seg_len] + b"\x00" * 24 + b"\xff\xd9"
    with pytest.raises(codecs.UnsupportedFormat,
                       match="size category"):
        jpeg.decode_jpeg(bad)


def test_progressive_scan_count_bomb_rejected():
    """A crafted progressive stream with hundreds of appended scans
    is a CPU amplification bomb (each scan is a full pass over every
    block, regardless of scan size): the decoder must refuse typed
    at the scan-count cap BEFORE decoding the excess scan, so the
    blob falls to the metadata/stub tier instead of stalling a
    mapInPandas pass."""
    import time

    g = _smooth(16, 16)[:, :, :1]           # gray: 1 comp, cap = 64
    data = jpeg.make_jpeg(g, progressive=True)
    assert data.endswith(b"\xff\xd9")
    first_sos = data.index(b"\xff\xda")
    second_sos = data.index(b"\xff\xda", first_sos + 2)
    # the DC-first scan is history-free: replaying it is structurally
    # valid entropy data every time, so the cap — not a truncation
    # error — is what must fire
    scan1 = data[first_sos:second_sos]
    bomb = (data[:second_sos] + scan1 * 200 + data[second_sos:])
    t0 = time.monotonic()
    with pytest.raises(codecs.UnsupportedFormat,
                       match="more than 64 scans"):
        jpeg.decode_jpeg(bomb)
    assert time.monotonic() - t0 < 5.0
    # a legitimate scan count still decodes, and a short replay
    # chain under the cap does not trip the guard
    ok = data[:second_sos] + scan1 * 3 + data[second_sos:]
    assert jpeg.decode_jpeg(ok).shape == (16, 16, 1)


def test_multi_scan_sequential_envelope_matches_decoder():
    """Sequential SOF0 with one scan per component (emitted by some
    encoders): decode_jpeg refuses it, so is_decodable must return
    False too — otherwise the dims pass attributes tier 'jpeg'
    (promising pixel decode) while features/resize fall to the stub
    tier. Header-level check: the envelope never reads entropy."""
    base = jpeg.make_jpeg(_smooth(16, 16))   # 3-comp interleaved
    sos_at = base.index(b"\xff\xda")
    seg_len = int.from_bytes(base[sos_at + 2:sos_at + 4], "big")
    body = base[sos_at + 4:sos_at + 2 + seg_len]
    ns = body[0]
    assert ns == 3
    # patch the SOS header to claim a single-component first scan
    new_body = bytes([1]) + body[1:3] + body[1 + 2 * ns:]
    patched = (base[:sos_at + 2]
               + (2 + len(new_body)).to_bytes(2, "big") + new_body
               + base[sos_at + 2 + seg_len:])
    assert jpeg.is_decodable(patched) is False
    with pytest.raises(codecs.UnsupportedFormat, match="multi-scan"):
        jpeg.decode_jpeg(patched)
    # the untouched interleaved stream keeps its label
    assert jpeg.is_decodable(base) is True
    assert jpeg.is_baseline(base) is True
