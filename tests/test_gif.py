"""GIF codec (multimodal/gif.py): LZW first-frame pixel decode.

Contracts under test:
* encoder→decoder round trips are EXACT (GIF is lossless) across
  palette sizes 2..256, interlace, dictionary growth to the 4096
  cap (width 12), sub-block fragmentation, both versions;
* composition semantics: frame offset onto the background-filled
  logical-screen canvas, GCE transparency mapping to background;
* everything outside the envelope refuses typed (`UnsupportedFormat`)
  — truncation, LZW overrun, out-of-range codes, canvas bomb;
* the Spark passes attribute the tier honestly: a complete frame →
  decoder "gif" with REAL features/resize; a header-only stream →
  "gif-dims" metadata tier.
"""

from __future__ import annotations

import numpy as np
import pytest

from big_data_bowl___2023_spark.multimodal import codecs, gif
from big_data_bowl___2023_spark.multimodal.binary_ops import (
    decode_media,
    extract_features,
    resize_media,
)


def _paletted(h, w, n_colors, seed=0):
    rng = np.random.default_rng(seed)
    pal = np.unique(rng.integers(0, 256, (n_colors + 8, 3),
                                 dtype=np.uint8), axis=0)[:n_colors]
    return pal[rng.integers(0, pal.shape[0], (h, w))]


def test_round_trip_exact_palette_sizes():
    for n in (2, 7, 64, 250):
        img = _paletted(23, 31, n, seed=n)
        out = gif.decode_gif(gif.make_gif(img))
        assert np.array_equal(out, img), f"{n} colors"


def test_round_trip_dictionary_cap_width_12():
    # large repetitive frame: the LZW table fills to 4096 and both
    # sides must stop adding + hold width 12 in lockstep
    pal = _paletted(1, 256, 256).reshape(256, 3)
    img = pal[(np.add.outer(np.arange(300), np.arange(400)) % 256)]
    out = gif.decode_gif(gif.make_gif(img))
    assert np.array_equal(out, img)


def test_interlace_and_versions():
    img = _paletted(21, 17, 5, seed=9)
    assert np.array_equal(
        gif.decode_gif(gif.make_gif(img, interlace=True)), img)
    assert np.array_equal(
        gif.decode_gif(gif.make_gif(img, version=b"GIF87a")), img)


def test_frame_offset_and_transparency_compose():
    """Hand-built stream: a 2x2 frame at offset (1, 1) on a 3x4
    canvas (w=3, h=4), GCT = [blue, red], background index 0 —
    with a GCE marking index 1 transparent, transparent pixels show
    the background; without it they paint red."""
    gct = bytes([0, 0, 255, 255, 0, 0])      # idx0 blue, idx1 red
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    payload = gif._lzw_encode(idx.reshape(-1), 2)
    gce_on = b"\x21\xf9\x04\x01\x00\x00\x01\x00"
    stream = (b"GIF89a" + (3).to_bytes(2, "little")
              + (4).to_bytes(2, "little")
              + bytes([0x80, 0, 0]) + gct
              + gce_on
              + b"\x2c" + (1).to_bytes(2, "little")
              + (1).to_bytes(2, "little")
              + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
              + b"\x00" + bytes([2])
              + bytes([len(payload)]) + payload + b"\x00\x3b")
    blue, red = [0, 0, 255], [255, 0, 0]
    out = gif.decode_gif(stream)
    assert out.shape == (4, 3, 3)
    assert out[0].tolist() == [blue, blue, blue]   # bg-filled canvas
    assert out[1, 1].tolist() == blue        # painted index 0
    assert out[1, 2].tolist() == blue        # transparent -> bg
    assert out[2, 1].tolist() == blue        # transparent -> bg
    # same stream with the transparency flag OFF: index 1 paints red
    stream3 = stream.replace(gce_on,
                             b"\x21\xf9\x04\x00\x00\x00\x01\x00")
    out3 = gif.decode_gif(stream3)
    assert out3[1, 2].tolist() == red
    assert out3[2, 1].tolist() == red
    assert out3[0].tolist() == [blue, blue, blue]


def test_sub_block_fragmentation():
    # force payload > 255 bytes so the encoder emits multiple
    # sub-blocks and the decoder must reassemble them
    img = _paletted(64, 64, 256, seed=4)
    data = gif.make_gif(img)
    assert np.array_equal(gif.decode_gif(data), img)


def test_unsupported_variants_refuse():
    img = _paletted(8, 8, 4)
    data = gif.make_gif(img)
    with pytest.raises(codecs.UnsupportedFormat):
        gif.decode_gif(data[:20])            # truncated
    with pytest.raises(codecs.UnsupportedFormat, match="frame"):
        gif.decode_gif(b"GIF89a" + (8).to_bytes(2, "little")
                       + (8).to_bytes(2, "little")
                       + b"\x00\x00\x00\x3b")  # trailer, no frame
    # canvas bomb: huge logical screen rejected before any work
    bomb = (b"GIF89a" + (60000).to_bytes(2, "little")
            + (60000).to_bytes(2, "little") + b"\x00\x00\x00")
    with pytest.raises(codecs.UnsupportedFormat, match="cap"):
        gif.decode_gif(bomb)
    assert gif.has_frame(bomb) is False
    # corrupt LZW: flip a payload byte -> typed refusal (or exact
    # length mismatch), never a crash
    tail = bytearray(data)
    tail[-10] ^= 0xFF
    try:
        gif.decode_gif(bytes(tail))
    except codecs.UnsupportedFormat:
        pass
    with pytest.raises(ValueError, match="256"):
        gif.make_gif(_paletted(32, 32, 300, seed=1)
                     + np.arange(32, dtype=np.uint8)[:, None, None])


def test_has_frame_classifier():
    img = _paletted(8, 8, 4)
    assert gif.has_frame(gif.make_gif(img)) is True
    header_only = (b"GIF89a" + (320).to_bytes(2, "little")
                   + (200).to_bytes(2, "little") + b"\x00\x00\x00")
    assert gif.has_frame(header_only) is False
    assert gif.has_frame(b"not a gif") is False


def test_gif_through_spark_passes(spark):
    """decode_media attributes tier "gif" with canvas dims for a
    complete frame (features/resize run the REAL decode); a
    header-only stream stays "gif-dims"."""
    img = _paletted(24, 15, 9, seed=2)
    data = gif.make_gif(img)
    header_only = (b"GIF89a" + (320).to_bytes(2, "little")
                   + (200).to_bytes(2, "little") + b"\x00\x00\x00")
    rows = [(1, "image", bytearray(data), "t", len(data)),
            (2, "image", bytearray(header_only), "t", 13)]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, data binary, "
              "source string, n_bytes long")
    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (dec[1]["width"], dec[1]["height"], dec[1]["n_channels"],
            dec[1]["decoder"]) == (15, 24, 3, "gif")
    assert (dec[2]["width"], dec[2]["height"],
            dec[2]["decoder"]) == (320, 200, "gif-dims")
    feats = {r["media_id"]: r["features"]
             for r in extract_features(media).collect()}
    assert feats[1][0] == pytest.approx(15 / 4096)  # real tier
    rs = {r["media_id"]: r
          for r in resize_media(media, max_side=8).collect()}
    assert (rs[1]["width"], rs[1]["height"]) == (5, 8)
    assert bytes(rs[1]["data"])[:2] == b"P6"


def test_gce_resets_between_extensions():
    """A GCE governs only the next rendering block (GIF89a 23c): a
    later GCE with the transparency flag CLEAR must reset a stale
    index (review r13b)."""
    gct = bytes([0, 0, 255, 255, 0, 0])
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    payload = gif._lzw_encode(idx.reshape(-1), 2)
    stream = (b"GIF89a" + (2).to_bytes(2, "little")
              + (2).to_bytes(2, "little")
              + bytes([0x80, 0, 0]) + gct
              + b"\x21\xf9\x04\x01\x00\x00\x01\x00"  # flag=1
              + b"\x21\xf9\x04\x00\x00\x00\x01\x00"  # flag=0
              + b"\x2c" + bytes(4)
              + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
              + b"\x00" + bytes([2])
              + bytes([len(payload)]) + payload + b"\x00\x3b")
    out = gif.decode_gif(stream)
    assert out[0, 1].tolist() == [255, 0, 0]    # painted, not bg


def test_has_frame_rejects_bad_min_code():
    """has_frame's envelope must match decode_gif's: an intact frame
    whose LZW min-code byte is invalid (decode refuses it) must not
    be attributed the real tier (review r13b)."""
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    data = gif.make_gif(img)
    mc_at = data.index(b"\x2c") + 10
    bad = bytearray(data)
    bad[mc_at] = 0
    assert gif.has_frame(bytes(bad)) is False
    with pytest.raises(codecs.UnsupportedFormat):
        gif.decode_gif(bytes(bad))
