"""Known-answer vectors for the codec family (verdict r13 #8).

The no-binary-fixtures stance means the in-repo encoder and decoder
could share a systematic misreading of T.81/GIF89a and still
round-trip. These tests close that hole: every stream below is
constructed BYTE BY BYTE from the public spec in this file (never by
calling make_jpeg/make_gif), with the full derivation in comments,
and the expected pixels are computed by hand from the spec's
arithmetic — a three-way cross-check between spec-derived bytes, the
decoder, and independently derived pixel values.

Covers the three shapes the verdict called out: baseline SOF0 4:2:0,
progressive SOF2 AC refinement, and GIF interlace + transparency."""

from __future__ import annotations

import numpy as np

from big_data_bowl___2023_spark.multimodal import codecs, gif, jpeg


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (2 + len(body)).to_bytes(2, "big") \
        + body


def _dht(cls: int, tid: int, counts: list[int],
         symbols: list[int]) -> bytes:
    full = counts + [0] * (16 - len(counts))
    return _seg(0xC4, bytes([cls << 4 | tid]) + bytes(full)
                + bytes(symbols))


_DQT_ONES = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))


def test_kat_baseline_sof0_420():
    """16×16 SOF0 4:2:0, all-ones quant, DC-only coefficients.

    Huffman (canonical, T.81 C.2): DC luma counts [0,2] symbols
    [5,0] → '00'→cat5, '01'→cat0; DC chroma symbols [7,0]; both AC
    tables a single length-1 code '0'→EOB. One interleaved MCU
    (Y×4, Cb, Cr); DC diffs: Y 16,0,0,0; Cb −64; Cr +64 (one's
    complement −64 → 7 bits '0111111'; +64 → '1000000').

    Entropy bit trace (37 bits + '111' pad):
      Y1 00 10000 0 | Y2 010 | Y3 010 | Y4 010
      Cb 00 0111111 0 | Cr 00 1000000 0
    → bytes 20 49 0F C4 07.

    Expected pixels, by hand: DC-only IDCT gives flat planes at
    round(DC/8)+128 → Y=130, Cb=120, Cr=136; JFIF convert:
      R = 130 + 1.402·8        = 141.216 → 141
      G = 130 + 0.344136·8 − 0.714136·8 = 127.040 → 127
      B = 130 − 1.772·8        = 115.824 → 116
    All 256 pixels (141, 127, 116)."""
    sof0 = _seg(0xC0, bytes([8]) + (16).to_bytes(2, "big")
                + (16).to_bytes(2, "big") + bytes([3])
                + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0])
                + bytes([3, 0x11, 0]))
    sos = _seg(0xDA, bytes([3]) + bytes([1, 0x00]) + bytes([2, 0x11])
               + bytes([3, 0x11]) + bytes([0, 63, 0]))
    stream = (b"\xff\xd8" + _DQT_ONES + sof0
              + _dht(0, 0, [0, 2], [5, 0])
              + _dht(0, 1, [0, 2], [7, 0])
              + _dht(1, 0, [1], [0x00])
              + _dht(1, 1, [1], [0x00])
              + sos + bytes([0x20, 0x49, 0x0F, 0xC4, 0x07])
              + b"\xff\xd9")
    out = jpeg.decode_jpeg(stream)
    assert out.shape == (16, 16, 3)
    assert (out == np.array([141, 127, 116], np.uint8)).all()
    # the classifier agrees this is inside the baseline envelope
    assert jpeg.is_baseline(stream) is True


def test_kat_progressive_sof2_ac_refinement():
    """8×8 grayscale SOF2, three scans: DC first (Al=0, diff 16),
    AC first (Ss=1 Se=63 Al=1: symbol run0/size2 '00' + bits '10'
    → coef[1] = 2<<1 = 4, then EOB '01'), AC refinement (Ah=1 Al=0:
    EOB '01' starts an EOB run, then the trailing pass reads ONE
    correction bit '1' for nonzero-history coef[1] → 4+1 = 5).

    Entropy bytes: DC scan '0'+'10000'+pad → 0x43; AC first
    '00 10 01'+pad → 0x27; AC refine '01 1'+pad → 0x7F.

    Expected pixels, by hand: zigzag index 1 = natural (u=0, v=1),
    so column y of the orthonormal IDCT gets
    5·cos((2y+1)π/16)/(4√2) on top of DC 16/8 = 2:
      y: 2.8669 2.7349 2.4911 2.1724 1.8276 1.5089 1.2651 1.1331
    round + 128 → every row = [131 131 130 130 130 130 129 129]."""
    sof2 = _seg(0xC2, bytes([8]) + (8).to_bytes(2, "big")
                + (8).to_bytes(2, "big") + bytes([1])
                + bytes([1, 0x11, 0]))

    def sos(ss, se, ahal, entropy):
        return _seg(0xDA, bytes([1, 1, 0x00, ss, se, ahal])) + entropy

    stream = (b"\xff\xd8" + _DQT_ONES + sof2
              + _dht(0, 0, [1], [5])
              + _dht(1, 0, [0, 2], [0x02, 0x00])
              + sos(0, 0, 0x00, bytes([0x43]))
              + sos(1, 63, 0x01, bytes([0x27]))
              + sos(1, 63, 0x10, bytes([0x7F]))
              + b"\xff\xd9")
    out = jpeg.decode_jpeg(stream)
    assert out.shape == (8, 8, 1)
    expect = np.array([131, 131, 130, 130, 130, 130, 129, 129],
                      np.uint8)
    assert (out[:, :, 0] == expect[None, :]).all()
    assert jpeg.is_decodable(stream) is True
    assert jpeg.is_baseline(stream) is False


def test_kat_gif_interlace_transparency():
    """8×8 GIF89a, 4-entry global palette, interlaced, GCE marking
    index 3 transparent over background index 0 (red).

    Pixel stream in INTERLACE row order [0,4,2,6,1,3,5,7]:
    8×idx0, 8×idx1, 16×idx2, 32×idx3 — so pass structure is visible
    in the output and a non-interlaced read would scramble rows.

    LZW derivation (min code size 2; clear=4, eoi=5; width grows
    when the just-added code reaches 2^width), emitted
    (code, width): (4,3) (0,3) (6,3) (7,3) — adding "0000"=8 grows
    width — (6,4) (1,4) (10,4) (11,4) (10,4) (2,4) (14,4) (15,4) —
    adding 16 grows width — (16,5) (17,5) (2,5) (3,5) (20,5) (21,5)
    (22,5) (23,5) (24,5) (25,5) (22,5) (5,5); packed LSB-first →
    84 6f a1 ab e2 0f a3 18 b4 da 8b b3 2d (13 bytes).

    Expected canvas: row0 red, row4 green, rows 2/6 blue, odd rows
    (index 3, transparent) = background red."""
    lzw = bytes.fromhex("846fa1abe20fa318b4da8bb32d")
    stream = (
        b"GIF89a"
        + (8).to_bytes(2, "little") + (8).to_bytes(2, "little")
        + bytes([0x91, 0x00, 0x00])            # GCT, 4 entries; bg=0
        + bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
        + bytes([0x21, 0xF9, 0x04, 0x01, 0, 0, 0x03, 0x00])  # GCE
        + bytes([0x2C]) + bytes(4)             # descriptor at (0,0)
        + (8).to_bytes(2, "little") + (8).to_bytes(2, "little")
        + bytes([0x40])                        # interlaced, no LCT
        + bytes([0x02, len(lzw)]) + lzw + bytes([0x00])
        + bytes([0x3B]))
    out = gif.decode_gif(stream)
    assert out.shape == (8, 8, 3)
    red = np.array([255, 0, 0], np.uint8)
    green = np.array([0, 255, 0], np.uint8)
    blue = np.array([0, 0, 255], np.uint8)
    for row, color in [(0, red), (4, green), (2, blue), (6, blue),
                       (1, red), (3, red), (5, red), (7, red)]:
        assert (out[row] == color).all(), f"row {row}"
    assert gif.has_frame(stream) is True
