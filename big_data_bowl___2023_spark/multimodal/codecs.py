"""Pure-python BMP / PPM / PGM codecs (verdict r10 #8).

The multimodal passes (`binary_ops`) dispatch real-library-first
(PIL), but this container ships no PIL — which left the whole family
exercising only the deterministic stub. These three formats are
simple enough to decode with the standard library + numpy, so
decode → features → resize is now REAL end-to-end in any
environment for:

* **BMP** — uncompressed ``BI_RGB`` Windows bitmaps, 24- or 32-bit
  (the format's dominant uncompressed variants); bottom-up and
  top-down row orders, 4-byte row padding, BGR(A) channel order
  (public format: Windows BITMAPFILEHEADER/BITMAPINFOHEADER layout);
* **PPM (P6)** / **PGM (P5)** — binary netpbm with ``maxval ≤ 255``,
  ``#`` comments in the header (public format: netpbm spec).

Anything else (PNG, JPEG, 16-bit netpbm, RLE BMP, …) raises
`UnsupportedFormat`, and `binary_ops` falls back to its documented
deterministic stub — the stub is now reachable ONLY for genuinely
unsupported payloads.

Decoded pixels are ``numpy uint8 (height, width, channels)``;
`encode` writes P6 (3-channel) or P5 (1-channel) — the canonical
interchange output for the resize pass (the PIL path emits PNG).
`resize_nearest` is aspect-preserving nearest-neighbor via numpy
index gather — no per-pixel Python loop, so the Arrow-batch cost
stays vectorized like the rest of the mapInPandas family.
"""

from __future__ import annotations

import numpy as np


class UnsupportedFormat(ValueError):
    """Payload is not a format this module decodes — callers fall
    back to their stub/real-library path."""


def sniff(data: bytes) -> str | None:
    """"bmp" / "ppm" / "pgm" when the magic matches, else None."""
    if len(data) >= 2 and data[:2] == b"BM":
        return "bmp"
    if len(data) >= 2 and data[:2] == b"P6":
        return "ppm"
    if len(data) >= 2 and data[:2] == b"P5":
        return "pgm"
    return None


def _decode_bmp(data: bytes) -> np.ndarray:
    if len(data) < 54 or data[:2] != b"BM":
        raise UnsupportedFormat("not a BMP payload")

    def _i32(off):
        return int.from_bytes(data[off:off + 4], "little", signed=True)

    def _u16(off):
        return int.from_bytes(data[off:off + 2], "little")

    pix_off = _i32(10)
    if pix_off < 54 or pix_off > len(data):
        # a negative/absurd offset would otherwise make the
        # truncation guard below pass vacuously and np.frombuffer
        # raise a plain ValueError that escapes the dispatch's
        # UnsupportedFormat fallback (review r11)
        raise UnsupportedFormat(f"implausible BMP pixel offset "
                                f"{pix_off}")
    header_size = _i32(14)
    if header_size < 40:
        raise UnsupportedFormat("pre-BITMAPINFOHEADER BMP")
    width = _i32(18)
    height = _i32(22)
    bits = _u16(28)
    compression = _i32(30)
    if compression != 0:
        raise UnsupportedFormat(f"compressed BMP (method {compression})")
    if bits not in (24, 32):
        raise UnsupportedFormat(f"{bits}-bit BMP")
    if width <= 0 or height == 0:
        raise UnsupportedFormat("degenerate BMP dimensions")
    top_down = height < 0
    height = abs(height)
    bpp = bits // 8
    stride = ((width * bpp + 3) // 4) * 4
    need = pix_off + stride * height
    if len(data) < need:
        raise UnsupportedFormat("truncated BMP pixel array")
    raw = np.frombuffer(data, dtype=np.uint8,
                        count=stride * height, offset=pix_off)
    rows = raw.reshape(height, stride)[:, :width * bpp] \
        .reshape(height, width, bpp)
    if not top_down:
        rows = rows[::-1]
    # BGR(A) -> RGB; the alpha plane of 32-bit BMPs is padding in
    # practice and is dropped
    return np.ascontiguousarray(rows[:, :, 2::-1])


def _decode_netpbm(data: bytes, magic: bytes,
                   channels: int) -> np.ndarray:
    if data[:2] != magic:
        raise UnsupportedFormat(f"not a {magic.decode()} payload")
    # header: magic, width, height, maxval as whitespace-separated
    # ASCII tokens; '#' starts a to-end-of-line comment
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(data):
            raise UnsupportedFormat("truncated netpbm header")
        c = data[pos:pos + 1]
        if c == b"#":
            nl = data.find(b"\n", pos)
            if nl < 0:
                raise UnsupportedFormat("unterminated netpbm comment")
            pos = nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(data) and not data[end:end + 1].isspace():
                end += 1
            fields.append(data[pos:end])
            pos = end
    try:
        width, height, maxval = (int(f) for f in fields)
    except ValueError as exc:
        raise UnsupportedFormat("non-numeric netpbm header") from exc
    if maxval > 255:
        raise UnsupportedFormat("16-bit netpbm")
    if width <= 0 or height <= 0:
        raise UnsupportedFormat("degenerate netpbm dimensions")
    pos += 1                       # exactly one whitespace after maxval
    n = width * height * channels
    if len(data) < pos + n:
        raise UnsupportedFormat("truncated netpbm pixel data")
    return (np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
            .reshape(height, width, channels))


def decode(data: bytes) -> np.ndarray:
    """(height, width, channels) uint8 pixels, RGB order for color.
    Raises `UnsupportedFormat` for ANYTHING this module can't parse —
    guaranteed by the blanket re-wrap below, not just the explicit
    checks: one corrupt blob in a 100 TB media scan must fall to the
    caller's stub tier, never escape as a bare ValueError that kills
    the whole mapInPandas job (review r11)."""
    kind = sniff(data)
    try:
        if kind == "bmp":
            return _decode_bmp(data)
        if kind == "ppm":
            return _decode_netpbm(data, b"P6", 3)
        if kind == "pgm":
            return _decode_netpbm(data, b"P5", 1)
    except UnsupportedFormat:
        raise
    except Exception as exc:
        raise UnsupportedFormat(
            f"malformed {kind} payload: {exc}") from exc
    raise UnsupportedFormat("unrecognized payload magic")


def encode(arr: np.ndarray) -> bytes:
    """P6 for 3-channel, P5 for 1-channel uint8 arrays."""
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError(f"expected (h, w, 1|3), got {arr.shape}")
    magic = b"P6" if arr.shape[2] == 3 else b"P5"
    header = b"%s\n%d %d\n255\n" % (magic, arr.shape[1], arr.shape[0])
    return header + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def resize_nearest(arr: np.ndarray, max_side: int) -> np.ndarray:
    """Aspect-preserving nearest-neighbor fit into a max_side box
    (never upscales — thumbnailing semantics, like PIL.thumbnail).
    Pure numpy index gather; deterministic."""
    h, w = arr.shape[:2]
    scale = min(1.0, max_side / max(w, h))
    tw, th = max(1, int(w * scale)), max(1, int(h * scale))
    if (tw, th) == (w, h):
        return arr
    rows = (np.arange(th) * (h / th)).astype(np.int64).clip(0, h - 1)
    cols = (np.arange(tw) * (w / tw)).astype(np.int64).clip(0, w - 1)
    return arr[rows][:, cols]


def make_bmp(arr: np.ndarray) -> bytes:
    """Encode a (h, w, 3) uint8 array as a 24-bit bottom-up BI_RGB
    BMP — the test-side generator that keeps the decoder honest
    without shipping binary fixtures."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # BGR, bottom-up
    pix = rows.tobytes()
    off = 14 + 40
    size = off + len(pix)
    header = (b"BM" + size.to_bytes(4, "little") + b"\x00" * 4
              + off.to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + h.to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little")
              + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little")
              + len(pix).to_bytes(4, "little")
              + b"\x00" * 16)
    return header + pix
