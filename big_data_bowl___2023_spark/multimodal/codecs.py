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
  ``#`` comments in the header (public format: netpbm spec);
* **PNG** — non-interlaced 8-bit gray / gray+alpha / RGB / RGBA /
  palette (color types 0/4/2/6/3; palette expands through PLTE to
  RGB, tRNS dropped like BMP's padding alpha), all five scanline
  filters, multi-IDAT, CRC-verified chunks (public format: RFC
  2083 / W3C PNG spec; DEFLATE via stdlib ``zlib``), sequential OR
  Adam7-interlaced (seven independently-filtered sub-images
  scattered by the pass grid). 16-bit and <8-bit PNGs raise
  `UnsupportedFormat`;
* **WAV** via `decode_wav` — 8/16/24/32-bit PCM and 32/64-bit
  IEEE-float RIFF/WAVE to float64 [-1, 1] ``(n_frames, channels)``
  + sample rate (the audio analogue of the image decoders;
  compressed formats refuse);
* **Y4M (YUV4MPEG2)** via `decode_y4m` — per-frame luma planes as
  uint8 ``(h, w, 1)`` with subset selection that never materializes
  unpicked frames (C420*/C422/C411/C444/Cmono, non-interlaced);
  the video
  tier behind the real `frame_sample`;
* **JPEG** — FULL pixel decode for baseline, extended-sequential
  AND progressive huffman streams (`multimodal.jpeg`: entropy
  decode incl. Annex G spectral selection / successive
  approximation, dequant, vectorized IDCT, chroma upsample,
  YCbCr→RGB — public format: ITU-T T.81 / JFIF), any sampling
  factors, restart intervals; arithmetic/12-bit/CMYK streams fall
  to the metadata tier below;
* **GIF** — FULL first-frame pixel decode (`multimodal.gif`: LZW,
  color tables, interlace, canvas composition with GCE
  transparency); frame-less streams fall to the metadata tier;
* **arithmetic JPEG / WebP** via `image_dims` — METADATA-GRADE:
  true (width, height, channels) from the header (SOF marker walk /
  logical-screen descriptor / VP8·VP8L·VP8X headers) without pixel
  decode, so `decode_media` reports real dimensions while
  features/resize honestly fall to the stub tier.

Anything else (16-bit netpbm, RLE BMP, animated WebP, …) raises
`UnsupportedFormat`, and `binary_ops` falls back to its documented
deterministic stub — the stub is now reachable ONLY for genuinely
unsupported payloads.

Decoded pixels are ``numpy uint8 (height, width, channels)``;
`encode` writes P6 (3-channel), P5 (1-channel), or PNG (2/4-channel
alpha shapes netpbm can't carry) — the interchange outputs for the
resize pass (the PIL path emits PNG).
`resize_nearest` is aspect-preserving nearest-neighbor via numpy
index gather — no per-pixel Python loop, so the Arrow-batch cost
stays vectorized like the rest of the mapInPandas family.
"""

from __future__ import annotations

import zlib

import numpy as np


class UnsupportedFormat(ValueError):
    """Payload is not a format this module decodes — callers fall
    back to their stub/real-library path."""


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff(data: bytes) -> str | None:
    """The recognized format tag ("bmp"/"ppm"/"pgm"/"png"/"wav"/
    "y4m"/"jpeg"/"gif"/"webp"/"tiff"/"mp4"/"mp3"/"flac"/"ogg"/
    "avi"/"mkv"/"pdf"/"zip"/"gzip"/"tar") when the magic matches,
    else None. mp4/mp3/flac/ogg/avi/mkv are A/V metadata-tier
    containers and pdf/zip/gzip/tar document/archive attribution
    tiers (`multimodal.containers`); tiff is a dims tier
    (`image_dims`). Two magics are deliberately stricter than a
    prefix compare: mp3 matches an ID3v2 shell or a raw frame sync
    whose header fields validate (a bare 0xFFEx prefix is too weak
    for an 11-bit sync), and tar validates the first header's
    CHECKSUM (text with 'ustar' at offset 257 must not classify)."""
    if len(data) >= 2 and data[:2] == b"BM":
        return "bmp"
    if len(data) >= 2 and data[:2] == b"P6":
        return "ppm"
    if len(data) >= 2 and data[:2] == b"P5":
        return "pgm"
    if len(data) >= 8 and data[:8] == _PNG_SIG:
        return "png"
    if (len(data) >= 12 and data[:4] == b"RIFF"
            and data[8:12] == b"WAVE"):
        return "wav"
    if len(data) >= 10 and data[:9] == b"YUV4MPEG2":
        return "y4m"
    if len(data) >= 3 and data[:2] == b"\xff\xd8" \
            and data[2:3] == b"\xff":
        return "jpeg"
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if (len(data) >= 16 and data[:4] == b"RIFF"
            and data[8:12] == b"WEBP"):
        return "webp"
    if len(data) >= 8 and data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if (len(data) >= 12 and data[:4] == b"RIFF"
            and data[8:12] == b"AVI "):
        return "avi"
    if len(data) >= 28 and data[:4] == b"OggS":
        return "ogg"
    if len(data) >= 8 and data[:4] == b"\x1aE\xdf\xa3":
        return "mkv"
    if len(data) >= 8 and data[:5] == b"%PDF-":
        return "pdf"
    if len(data) >= 22 and data[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
        return "zip"
    if len(data) >= 18 and data[:2] == b"\x1f\x8b":
        return "gzip"
    if len(data) >= 512 and data[257:262] == b"ustar":
        from .containers import tar_header_ok    # lazy: avoids cycle
        if tar_header_ok(data):
            return "tar"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4"
    if len(data) >= 8 and data[:4] == b"fLaC":
        return "flac"
    if len(data) >= 10 and data[:3] == b"ID3":
        # ID3v2 is a tag shell, not a codec: a tagged FLAC must
        # dispatch to the FLAC walker, not lock onto a spurious
        # MPEG sync inside FLAC frames (ADVICE r14)
        from .containers import _id3v2_end    # lazy: avoids a cycle
        end = _id3v2_end(data)
        if data[end:end + 4] == b"fLaC":
            return "flac"
        return "mp3"
    if (len(data) >= 4 and data[0] == 0xFF
            and (data[1] & 0xE0) == 0xE0):
        from .containers import _mp3_frame    # lazy: avoids a cycle
        if _mp3_frame(data, 0) is not None:
            return "mp3"
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


# PNG color type -> samples per pixel (8-bit depth only); palette
# type 3 stores one index byte per pixel and expands through PLTE
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass origins/strides: (x0, xs, y0, ys) per pass (PNG spec
# §8.2) — shared by the decoder's scatter and make_png's gather
_ADAM7 = ((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
          (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2))


def _adam7_passes(width: int, height: int):
    """Yield (x0, xs, y0, ys, pw, ph) for each NON-EMPTY pass."""
    for x0, xs, y0, ys in _ADAM7:
        pw = max(0, -(-(width - x0) // xs))
        ph = max(0, -(-(height - y0) // ys))
        if pw and ph:
            yield x0, xs, y0, ys, pw, ph


# hard ceiling on a single PNG's unfiltered pixel-buffer bytes —
# payloads are untrusted; anything claiming more is rejected before
# the inflate rather than materialized in executor memory
PNG_MAX_DECODED_BYTES = 1 << 28          # 256 MiB ≈ 8k×8k RGBA


def _png_chunks(data: bytes):
    """Yield (type, payload) for each chunk, CRC-verified.  A bad
    length/CRC raises UnsupportedFormat — one corrupt chunk must not
    surface as an IndexError from the slicing below."""
    pos = 8
    while pos < len(data):
        if pos + 8 > len(data):
            raise UnsupportedFormat("truncated PNG chunk header")
        length = int.from_bytes(data[pos:pos + 4], "big")
        ctype = data[pos + 4:pos + 8]
        end = pos + 8 + length
        if length > len(data) or end + 4 > len(data):
            raise UnsupportedFormat("truncated PNG chunk body")
        payload = data[pos + 8:end]
        crc = int.from_bytes(data[end:end + 4], "big")
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise UnsupportedFormat(
                f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, payload
        if ctype == b"IEND":
            return
        pos = end + 4
    raise UnsupportedFormat("PNG stream ended without IEND")


def _png_unfilter(raw: bytes, stride: int, height: int,
                  bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters (None/Sub/Up/Average/
    Paeth) over ``stride``-byte scanlines with a ``bpp``-byte filter
    distance (= bytes per pixel, floored to 1 for sub-byte depths —
    PNG filters operate on PACKED bytes). Sub and Up are
    numpy-vectorized (cumsum over pixel lanes / uint8 wraparound
    add); Average and Paeth carry a true sequential dependency on
    the left neighbor, so those rows run a per-byte loop —
    correctness-first, and this pure-python tier is the no-PIL
    fallback, not the production decode path. Returns (height,
    stride) unfiltered bytes."""
    if len(raw) != (stride + 1) * height:
        raise UnsupportedFormat("PNG pixel data length mismatch")
    flat = np.frombuffer(raw, dtype=np.uint8) \
        .reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = int(flat[y, 0])
        row = flat[y, 1:]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = row
        elif f == 1:
            # recon[x] = raw[x] + recon[x-bpp]: per-lane prefix sum
            # mod 256 (uint8 addition is already mod-256); pad the
            # row up to a lane multiple (sub-byte depths can leave
            # a partial trailing lane)
            n_lanes = -(-stride // bpp)
            padded = np.zeros(n_lanes * bpp, dtype=np.uint8)
            padded[:stride] = row
            lanes = padded.reshape(n_lanes, bpp).astype(np.uint64)
            out[y] = (np.cumsum(lanes, axis=0) % 256) \
                .astype(np.uint8).reshape(-1)[:stride]
        elif f == 2:
            out[y] = row + prev          # uint8 wraparound == mod 256
        elif f == 3:
            # plain-list scalar loop, not numpy indexing: per-byte
            # numpy scalar reads are ~10x slower than list ops, and
            # this loop dominated the measured PNG decode floor
            # (BASELINE.md r14 --codec-floor: 0.35 Mpix/s)
            rr, pv, acc = row.tolist(), prev.tolist(), []
            ap = acc.append
            for x in range(stride):
                a = acc[x - bpp] if x >= bpp else 0
                ap((rr[x] + ((a + pv[x]) >> 1)) & 0xFF)
            out[y] = acc
        elif f == 4:
            # c = recon[y-1, x-bpp] == pv[x-bpp]; pv is all zeros on
            # the first row, so the y==0 case needs no special branch
            rr, pv, acc = row.tolist(), prev.tolist(), []
            ap = acc.append
            for x in range(stride):
                a = acc[x - bpp] if x >= bpp else 0
                b = pv[x]
                c = pv[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                ap((rr[x] + pred) & 0xFF)
            out[y] = acc
        else:
            raise UnsupportedFormat(f"PNG filter type {f}")
    return out


def _decode_png(data: bytes) -> np.ndarray:
    """Non-interlaced 8-bit gray/gray+alpha/RGB/RGBA PNG (RFC 2083).
    Output keeps the source channel count — the feature/resize passes
    already handle 1-4 channels."""
    chunks = _png_chunks(data)
    ctype, ihdr = next(chunks)
    if ctype != b"IHDR" or len(ihdr) != 13:
        raise UnsupportedFormat("PNG missing leading IHDR")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    depth, color, comp, filt, interlace = ihdr[8:13]
    if color not in _PNG_CHANNELS:
        raise UnsupportedFormat(f"PNG color type {color}")
    legal = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)} \
        .get(color, (8, 16))
    if depth not in legal:
        raise UnsupportedFormat(
            f"{depth}-bit PNG with color type {color}")
    if comp != 0 or filt != 0:
        raise UnsupportedFormat("nonstandard PNG compression/filter")
    if interlace not in (0, 1):
        raise UnsupportedFormat(f"PNG interlace method {interlace}")
    if width <= 0 or height <= 0:
        raise UnsupportedFormat("degenerate PNG dimensions")
    idat_parts, plte = [], None
    for t, payload in chunks:
        if t == b"IDAT":
            idat_parts.append(payload)
        elif t == b"PLTE":
            plte = payload
    if not idat_parts:
        raise UnsupportedFormat("PNG without IDAT")
    # Bound the inflate by the size the IHDR promises BEFORE
    # decompressing: a crafted PNG claiming huge dims over a tiny
    # compressed-zeros stream must not balloon executor memory
    # inside a 100 TB untrusted-corpus decode pass (ADVICE r12).
    # expected = (stride + filter byte) * height, capped.
    ch = _PNG_CHANNELS[color]
    bpp = max(1, ch * depth // 8)      # the filters' byte distance

    def _stride(w: int) -> int:
        return -(-w * ch * depth // 8)  # packed scanline bytes

    if interlace:
        # Adam7: seven independently-filtered sub-images
        expected = sum((_stride(pw) + 1) * ph
                       for *_, pw, ph in _adam7_passes(width, height))
    else:
        expected = (_stride(width) + 1) * height
    if expected > PNG_MAX_DECODED_BYTES:
        raise UnsupportedFormat(
            f"PNG decoded size {expected} exceeds cap "
            f"{PNG_MAX_DECODED_BYTES}")
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(b"".join(idat_parts), expected + 1)
    except zlib.error as exc:
        raise UnsupportedFormat(f"corrupt PNG DEFLATE stream: "
                                f"{exc}") from exc
    if len(raw) > expected or dec.unconsumed_tail:
        raise UnsupportedFormat(
            "PNG DEFLATE stream larger than IHDR dimensions allow")
    def _rows_to_samples(rows: np.ndarray, w: int) -> np.ndarray:
        """(h, stride) packed bytes -> (h, w, ch) samples (uint8;
        16-bit truncates to the high byte — the 8-bit passes
        downstream can't carry more)."""
        hh = rows.shape[0]
        if depth == 8:
            return rows[:, :w * ch].reshape(hh, w, ch)
        if depth == 16:
            return rows[:, :w * ch * 2].reshape(
                hh, w, ch, 2)[..., 0]      # big-endian high byte
        # sub-byte: unpack MSB-first, regroup depth-sized fields
        bits = np.unpackbits(rows, axis=1)
        vals = bits[:, :w * depth].reshape(hh, w, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)) \
            .astype(np.uint8)
        return (vals * weights).sum(axis=2, dtype=np.uint16) \
            .astype(np.uint8)[..., None]

    if interlace:
        out = np.zeros((height, width, ch), dtype=np.uint8)
        off = 0
        for x0, xs, y0, ys, pw, ph in _adam7_passes(width, height):
            n = (_stride(pw) + 1) * ph
            rows = _png_unfilter(raw[off:off + n], _stride(pw),
                                 ph, bpp)
            out[y0::ys, x0::xs] = _rows_to_samples(rows, pw)
            off += n
        if off != len(raw):
            raise UnsupportedFormat("PNG pixel data length mismatch")
    else:
        rows = _png_unfilter(raw, _stride(width), height, bpp)
        out = _rows_to_samples(rows, width)
    if color == 0 and depth < 8:
        # gray sub-byte samples scale to full range (0..2^d-1 ->
        # 0..255, PNG spec 11.2.2 sample depth scaling)
        out = (out.astype(np.uint16) * 255
               // ((1 << depth) - 1)).astype(np.uint8)
    if color != 3:
        return out
    # palette expansion: index bytes -> PLTE RGB triples (tRNS alpha
    # is dropped, like the BMP decoder's padding alpha plane)
    if plte is None or len(plte) % 3 or not 3 <= len(plte) <= 768:
        raise UnsupportedFormat("palette PNG with missing/malformed "
                                "PLTE")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idxs = out.reshape(height, width)
    if int(idxs.max(initial=0)) >= pal.shape[0]:
        raise UnsupportedFormat("palette index out of PLTE range")
    return pal[idxs]


def make_png(arr: np.ndarray, filter_type: int = 4,
             interlace: bool = False) -> bytes:
    """Encode a (h, w, 1|2|3|4) uint8 array as an 8-bit PNG —
    sequential, or Adam7-interlaced with ``interlace=True`` —
    filtering every scanline with `filter_type` (0-4): the test-side
    generator that exercises each unfilter branch and the interlace
    scatter without shipping binary fixtures."""
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"expected (h, w, 1|2|3|4), got {arr.shape}")
    if filter_type not in range(5):
        raise ValueError(f"PNG filter type {filter_type}")
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if interlace:
        scan = b"".join(
            _png_filter_pass(arr[y0::ys, x0::xs], filter_type)
            for x0, xs, y0, ys, _, _ in _adam7_passes(w, h))
    else:
        scan = _png_filter_pass(arr, filter_type)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (len(payload).to_bytes(4, "big") + ctype + payload
                + (zlib.crc32(ctype + payload)
                   & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, color, 0, 0, 1 if interlace else 0]))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan))
            + chunk(b"IEND", b""))


def _png_filter_pass(arr: np.ndarray, filter_type: int) -> bytes:
    """Filter one (sub-)image's scanlines with `filter_type` —
    shared by the sequential and Adam7 encoder paths (each Adam7
    pass filters independently, PNG spec §8.2)."""
    h, w, ch = arr.shape
    arr = np.ascontiguousarray(arr)
    up = np.concatenate(
        [np.zeros((1, w, ch), dtype=np.uint8), arr[:-1]],
        axis=0).astype(np.int64)
    cur = arr.astype(np.int64)
    left = np.concatenate(
        [np.zeros((h, 1, ch), dtype=np.uint8), arr[:, :-1]],
        axis=1).astype(np.int64)
    ul = np.zeros_like(cur)
    ul[1:, 1:] = arr[:-1, :-1]
    if filter_type == 0:
        filtered = cur
    elif filter_type == 1:
        filtered = cur - left
    elif filter_type == 2:
        filtered = cur - up
    elif filter_type == 3:
        filtered = cur - ((left + up) >> 1)
    else:
        p = left + up - ul
        pa, pb, pc = (np.abs(p - left), np.abs(p - up),
                      np.abs(p - ul))
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, up, ul))
        filtered = cur - pred
    body = (filtered % 256).astype(np.uint8).reshape(h, w * ch)
    scan = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8), body], axis=1)
    return scan.tobytes()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(samples, sample_rate) for RIFF/WAVE audio: 8-bit unsigned,
    16/24/32-bit signed little-endian PCM, or 32/64-bit IEEE float
    (format 3, clamped to spec range), any channel count. Samples
    come back as float64 in [-1, 1], shape (n_frames, channels) —
    the audio analogue of the image decoders' uint8 HWC contract.
    Compressed formats raise `UnsupportedFormat` (public format:
    RIFF WAVE / WAVEFORMAT layout)."""
    if sniff(data) != "wav":
        raise UnsupportedFormat("not a RIFF/WAVE payload")
    pos, fmt, frames = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise UnsupportedFormat("truncated WAV chunk")
        if cid == b"fmt ":
            if size < 16:
                raise UnsupportedFormat("short WAV fmt chunk")
            fmt = (int.from_bytes(body[0:2], "little"),   # format
                   int.from_bytes(body[2:4], "little"),   # channels
                   int.from_bytes(body[4:8], "little"),   # rate
                   int.from_bytes(body[14:16], "little"))  # bits
        elif cid == b"data":
            frames = body
        pos += 8 + size + (size & 1)        # chunks pad to even
    if fmt is None or frames is None:
        raise UnsupportedFormat("WAV missing fmt/data chunk")
    audio_format, channels, rate, bits = fmt
    if audio_format == 1:
        if bits not in (8, 16, 24, 32):
            raise UnsupportedFormat(f"{bits}-bit PCM WAV")
    elif audio_format == 3:                 # IEEE float
        if bits not in (32, 64):
            raise UnsupportedFormat(f"{bits}-bit float WAV")
    else:
        raise UnsupportedFormat(f"non-PCM WAV (format {audio_format})")
    if channels < 1 or rate < 1:
        raise UnsupportedFormat("degenerate WAV fmt")
    width = bits // 8
    n = len(frames) // (width * channels)
    if n == 0:
        raise UnsupportedFormat("empty WAV data chunk")
    count = n * channels
    if audio_format == 3:
        raw = np.frombuffer(frames, dtype="<f4" if bits == 32
                            else "<f8", count=count)
        # spec range is [-1, 1]; clamp rather than trust
        samples = np.clip(raw.astype(np.float64), -1.0, 1.0)
    elif bits == 32:
        raw = np.frombuffer(frames, dtype="<i4", count=count)
        samples = raw.astype(np.float64) / 2147483648.0
    elif bits == 24:
        # no 3-byte dtype: recombine little-endian signed 24-bit.
        # assemble in uint32 (left-shifting into the sign bit of a
        # signed int is platform/numpy-version dependent), then
        # .view(int32) >> 8 for well-defined sign extension
        b = np.frombuffer(frames, dtype=np.uint8,
                          count=count * 3).reshape(count, 3)             .astype(np.uint32)
        v = (b[:, 0] << 8) | (b[:, 1] << 16) | (b[:, 2] << 24)
        samples = (v.view(np.int32) >> 8).astype(np.float64)             / 8388608.0
    elif bits == 16:
        raw = np.frombuffer(frames, dtype="<i2", count=count)
        samples = raw.astype(np.float64) / 32768.0
    else:
        raw = np.frombuffer(frames, dtype=np.uint8, count=count)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    return samples.reshape(n, channels), rate


def make_wav(samples: np.ndarray, rate: int,
             bits: int = 16) -> bytes:
    """Encode (n_frames, channels) float in [-1, 1] as PCM WAV — the
    test-side generator for `decode_wav`."""
    if samples.ndim != 2 or bits not in (8, 16):
        raise ValueError(f"expected (n, ch) and 8|16 bits, got "
                         f"{samples.shape}, {bits}")
    n, ch = samples.shape
    clipped = np.clip(samples, -1.0, 1.0)
    if bits == 16:
        frames = (clipped * 32767.0).round().astype("<i2").tobytes()
    else:
        frames = ((clipped * 127.0).round() + 128) \
            .astype(np.uint8).tobytes()
    width = bits // 8
    fmt = ((1).to_bytes(2, "little") + ch.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + (rate * ch * width).to_bytes(4, "little")
           + (ch * width).to_bytes(2, "little")
           + bits.to_bytes(2, "little"))
    body = (b"WAVEfmt " + (16).to_bytes(4, "little") + fmt
            + b"data" + len(frames).to_bytes(4, "little") + frames)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


# Y4M chroma tag -> bytes per frame as a multiple of (w*h) numerator/
# denominator: 4:2:0 = 1.5x, 4:2:2 = 2x, 4:1:1 = 1.5x, 4:4:4 = 3x,
# mono = 1x (Y plane only — the luma extraction is chroma-agnostic,
# it just needs the right frame stride)
_Y4M_FRAME_SIZE = {"420": (3, 2), "422": (2, 1), "411": (3, 2),
                   "444": (3, 1), "mono": (1, 1)}


def y4m_frame_count(data: bytes) -> int:
    """Frame count via the real parse walk with nothing materialized
    — counting b"FRAME" substrings would miscount, since luma bytes
    can contain the marker."""
    offsets, _meta = _y4m_layout(data)
    return len(offsets)


def sample_y4m(data: bytes, max_frames: int
               ) -> tuple[list[int], list[np.ndarray], dict]:
    """(indices, frames, meta): up to ``max_frames`` evenly-strided
    luma frames in ONE parse walk (first and last always included
    when max_frames ≥ 2) — the keyframe stand-in `frame_sample`
    rides; a count-then-decode pair would walk the stream twice
    (review r12)."""
    offsets, meta = _y4m_layout(data)
    n = len(offsets)
    if n <= max_frames:
        picks = list(range(n))
    elif max_frames == 1:
        picks = [0]
    else:
        step = (n - 1) / (max_frames - 1)
        picks = sorted({round(i * step) for i in range(max_frames)})
    ysize = meta["width"] * meta["height"]
    frames = [np.frombuffer(data, dtype=np.uint8, count=ysize,
                            offset=offsets[i])
              .reshape(meta["height"], meta["width"], 1).copy()
              for i in picks]
    return picks, frames, meta


def decode_y4m(data: bytes,
               frame_indices=None) -> tuple[list[np.ndarray], dict]:
    """(frames, meta) for a YUV4MPEG2 stream: each frame is its Y
    (luma) plane as uint8 ``(h, w, 1)`` — the grayscale view, which
    is what the feature/thumbnail passes consume; chroma planes are
    parsed past, not returned. ``frame_indices`` (ints) selects a
    subset without materializing the rest; None = all. ``meta`` =
    {"width", "height", "n_frames", "chroma"}. Supports
    C420*/C422/C411/C444/Cmono, non-interlaced (public format: the yuv4mpeg
    stream layout). Anything else raises `UnsupportedFormat`."""
    offsets, meta = _y4m_layout(data)
    picks = (range(len(offsets)) if frame_indices is None
             else frame_indices)
    ysize = meta["width"] * meta["height"]
    frames = [np.frombuffer(data, dtype=np.uint8, count=ysize,
                            offset=offsets[i])
              .reshape(meta["height"], meta["width"], 1).copy()
              for i in picks if 0 <= i < len(offsets)]
    return frames, meta


def _y4m_layout(data: bytes) -> tuple[list[int], dict]:
    """One parse walk: (luma-plane byte offsets per frame, meta) —
    nothing materialized. The shared front half of count / sample /
    decode."""
    if sniff(data) != "y4m":
        raise UnsupportedFormat("not a YUV4MPEG2 payload")
    nl = data.find(b"\n")
    if nl < 0:
        raise UnsupportedFormat("unterminated Y4M stream header")
    width = height = None
    chroma = "420"
    for tok in data[9:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        try:
            if tag == b"W":
                width = int(val)
            elif tag == b"H":
                height = int(val)
            elif tag == b"C":
                v = val.decode("ascii", "replace")
                if v.startswith("420"):
                    chroma = "420"
                elif v == "422":
                    chroma = "422"
                elif v == "411":
                    chroma = "411"
                elif v == "444":
                    chroma = "444"
                elif v == "mono":
                    chroma = "mono"
                else:
                    raise UnsupportedFormat(f"Y4M chroma {v}")
            elif tag == b"I" and val not in (b"p", b"?"):
                raise UnsupportedFormat("interlaced Y4M")
        except UnsupportedFormat:
            raise              # a subclass of ValueError — keep typed
        except ValueError as exc:
            raise UnsupportedFormat(
                f"malformed Y4M header token {tok!r}") from exc
    if not width or not height or width < 0 or height < 0:
        raise UnsupportedFormat("Y4M header missing W/H")
    if chroma == "420" and (width % 2 or height % 2):
        raise UnsupportedFormat("odd dimensions with 4:2:0 chroma")
    if chroma == "422" and width % 2:
        raise UnsupportedFormat("odd width with 4:2:2 chroma")
    if chroma == "411" and width % 4:
        raise UnsupportedFormat("width not a multiple of 4 with "
                                "4:1:1 chroma")
    num, den = _Y4M_FRAME_SIZE[chroma]
    fsize = width * height * num // den
    offsets: list[int] = []
    pos = nl + 1
    while pos < len(data):
        if data[pos:pos + 5] != b"FRAME":
            raise UnsupportedFormat(
                f"Y4M frame {len(offsets)}: bad marker")
        fnl = data.find(b"\n", pos)
        if fnl < 0:
            raise UnsupportedFormat("unterminated Y4M frame header")
        body = fnl + 1
        if len(data) < body + fsize:
            raise UnsupportedFormat(
                f"truncated Y4M frame {len(offsets)}")
        offsets.append(body)
        pos = body + fsize
    if not offsets:
        raise UnsupportedFormat("Y4M stream with no frames")
    return offsets, {"width": width, "height": height,
                     "n_frames": len(offsets), "chroma": chroma}


def make_y4m(frames: np.ndarray, chroma: str = "420") -> bytes:
    """Encode (n, h, w) or (n, h, w, 1) uint8 luma frames as a Y4M
    stream (neutral 128 chroma planes for 420/444) — the test-side
    generator for `decode_y4m`."""
    if frames.ndim == 4:
        frames = frames[:, :, :, 0]
    if frames.ndim != 3 or chroma not in _Y4M_FRAME_SIZE:
        raise ValueError(f"expected (n, h, w[, 1]) and chroma in "
                         f"{sorted(_Y4M_FRAME_SIZE)}")
    n, h, w = frames.shape
    num, den = _Y4M_FRAME_SIZE[chroma]
    pad = w * h * num // den - w * h
    header = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C%s\n" \
        % (w, h, chroma.encode())
    out = [header]
    for f in np.ascontiguousarray(frames, dtype=np.uint8):
        out.append(b"FRAME\n" + f.tobytes() + b"\x80" * pad)
    return b"".join(out)


# JPEG markers that carry frame dimensions (SOF0-15 minus the
# non-frame DHT/JPG/DAC at C4/C8/CC) — public format: ITU T.81 B.2.2
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _webp_dims(data: bytes) -> tuple[int, int, int]:
    """WebP dims from the first chunk (public format: the WebP
    container + VP8/VP8L bitstream headers): ``VP8 `` (lossy) keys
    on the 3-byte start code then 14-bit LE dims; ``VP8L``
    (lossless) packs width-1/height-1 as 14-bit fields after the
    0x2F signature; ``VP8X`` (extended) carries the canvas as
    24-bit LE minus-one fields."""
    fourcc = data[12:16]
    if fourcc == b"VP8X":
        if len(data) < 30:
            raise UnsupportedFormat("truncated VP8X header")
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        # alpha flag (bit 4 of the feature byte) decides channels
        return w, h, 4 if data[20] & 0x10 else 3
    if fourcc == b"VP8L":
        if len(data) < 25 or data[20] != 0x2F:
            raise UnsupportedFormat("malformed VP8L signature")
        bits = int.from_bytes(data[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return w, h, 4 if (bits >> 28) & 1 else 3
    if fourcc == b"VP8 ":
        if len(data) < 30 or data[23:26] != b"\x9d\x01\x2a":
            raise UnsupportedFormat("malformed VP8 key-frame header")
        w = int.from_bytes(data[26:28], "little") & 0x3FFF
        h = int.from_bytes(data[28:30], "little") & 0x3FFF
        if w < 1 or h < 1:
            raise UnsupportedFormat("degenerate VP8 dims")
        return w, h, 3
    raise UnsupportedFormat(f"WebP chunk {fourcc!r}")


TIFF_MAX_IFD_ENTRIES = 512     # first-IFD entry cap (bomb guard)


def _tiff_dims(data: bytes) -> tuple[int, int, int]:
    """TIFF 6.0 first-IFD dims: ImageWidth (tag 256), ImageLength
    (257), SamplesPerPixel (277); both byte orders; inline SHORT/
    LONG values only (offset-stored scalars are exotic for these
    tags — such files fall through typed). Per the spec, a SHORT
    value sits LEFT-JUSTIFIED in the 4-byte value field in either
    byte order."""
    bo = "little" if data[:2] == b"II" else "big"

    def u(off: int, n: int) -> int:
        b = data[off:off + n]
        if len(b) < n:
            raise UnsupportedFormat("truncated TIFF header")
        return int.from_bytes(b, bo)

    ifd = u(4, 4)
    n = u(ifd, 2)
    if n > TIFF_MAX_IFD_ENTRIES:
        raise UnsupportedFormat(
            f"TIFF first IFD with more than {TIFF_MAX_IFD_ENTRIES} "
            "entries")
    w = h = 0
    spp = 1
    for i in range(n):
        e = ifd + 2 + 12 * i
        tag, typ, cnt = u(e, 2), u(e + 2, 2), u(e + 4, 4)
        if tag in (256, 257, 277) and cnt == 1 and typ in (3, 4):
            val = u(e + 8, 2 if typ == 3 else 4)
            if tag == 256:
                w = val
            elif tag == 257:
                h = val
            else:
                spp = val
    if w < 1 or h < 1:
        raise UnsupportedFormat("TIFF first IFD without image dims")
    return w, h, max(spp, 1)


def image_dims(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) WITHOUT pixel decode, for formats
    whose headers carry dimensions but whose pixel codecs this
    module doesn't implement — JPEG (marker walk to any SOF), GIF
    (logical-screen descriptor), WebP, and TIFF (first-IFD walk).
    Metadata-grade support: the decode pass can report true
    dimensions for the most common real-world payloads while
    features/resize honestly fall to their stub tier. Raises
    `UnsupportedFormat` for anything else (including formats
    `decode` handles fully — use `decode` there)."""
    kind = sniff(data)
    if kind == "gif":
        return (int.from_bytes(data[6:8], "little"),
                int.from_bytes(data[8:10], "little"), 3)
    if kind == "webp":
        return _webp_dims(data)
    if kind == "tiff":
        return _tiff_dims(data)
    if kind != "jpeg":
        raise UnsupportedFormat(f"no header-dims parser for {kind}")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise UnsupportedFormat("JPEG marker sync lost")
        # ITU T.81 B.1.1.2 allows any number of 0xFF fill bytes
        # before the marker byte — skip them or a legal JPEG falls
        # to the stub tier (ADVICE r12)
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2                     # standalone markers
            continue
        if marker == 0xD9:
            break                        # EOI before any SOF
        seg = int.from_bytes(data[pos + 2:pos + 4], "big")
        if seg < 2 or pos + 2 + seg > len(data):
            raise UnsupportedFormat("truncated JPEG segment")
        if marker in _JPEG_SOF:
            if seg < 8:
                raise UnsupportedFormat("short JPEG SOF segment")
            height = int.from_bytes(data[pos + 5:pos + 7], "big")
            width = int.from_bytes(data[pos + 7:pos + 9], "big")
            channels = data[pos + 9]
            if width < 1 or height < 1 or channels < 1:
                raise UnsupportedFormat("degenerate JPEG SOF dims")
            return width, height, channels
        if marker == 0xDA:
            # start-of-scan: entropy-coded data follows; a SOF must
            # have appeared before it in a well-formed stream
            break
        pos += 2 + seg
    raise UnsupportedFormat("JPEG without a SOF frame header")


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
        if kind == "png":
            return _decode_png(data)
        if kind == "wav":
            raise UnsupportedFormat(
                "WAV is an audio payload — use decode_wav")
        if kind == "y4m":
            raise UnsupportedFormat(
                "Y4M is a video payload — use decode_y4m")
        if kind == "jpeg":
            # baseline/extended-sequential huffman JPEG: full pixel
            # decode (multimodal.jpeg); progressive and friends
            # raise UnsupportedFormat and the caller's metadata tier
            # (image_dims) takes over. Lazy import: jpeg.py imports
            # UnsupportedFormat from this module.
            from . import jpeg as _jpeg
            return _jpeg.decode_jpeg(data)
        if kind == "gif":
            # first-frame pixel decode (multimodal.gif: LZW, color
            # tables, interlace, transparency-to-background); broken
            # streams raise UnsupportedFormat and the metadata tier
            # takes over
            from . import gif as _gif
            return _gif.decode_gif(data)
        if kind == "webp":
            raise UnsupportedFormat(
                "webp pixel decode unsupported — header dims via "
                "image_dims")
        if kind in ("mp4", "mp3", "flac", "ogg", "avi", "mkv"):
            raise UnsupportedFormat(
                f"{kind} is a compressed A/V container — metadata "
                "via multimodal.containers")
        if kind == "tiff":
            raise UnsupportedFormat(
                "tiff pixel decode unsupported — header dims via "
                "image_dims")
    except UnsupportedFormat:
        raise
    except Exception as exc:
        raise UnsupportedFormat(
            f"malformed {kind} payload: {exc}") from exc
    raise UnsupportedFormat("unrecognized payload magic")


def encode(arr: np.ndarray) -> bytes:
    """P6 for 3-channel, P5 for 1-channel uint8 arrays; PNG for the
    alpha-bearing 2/4-channel shapes netpbm can't carry (a decoded
    RGBA PNG round-tripping through the resize pass must not raise a
    bare ValueError inside mapInPandas)."""
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"expected (h, w, 1|2|3|4), got {arr.shape}")
    if arr.shape[2] in (2, 4):
        # Up-filtered, not Paeth: this module's own unfilter runs
        # Average/Paeth per-byte in Python, so a Paeth-encoded
        # thumbnail would put every downstream re-decode on the
        # slowest branch (review r12); filter 2 is vectorized on
        # both sides and compresses inter-row redundancy well
        return make_png(arr, filter_type=2)
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
