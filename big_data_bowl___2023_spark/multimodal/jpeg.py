"""Pure-python baseline JPEG codec (public format: ITU-T T.81 /
JFIF; huffman tables and quantization examples from T.81 Annex K).

Closes the last real media-tier gap (verdict r12 #2): JPEG is the
dominant real-world image format, and until this module its
features/resize ran stub arithmetic behind metadata-grade dims.

`decode_jpeg` handles **baseline sequential DCT** — SOF0 and the
huffman-coded extended-sequential SOF1 — AND **progressive DCT**
(SOF2, T.81 Annex G: spectral selection + successive approximation,
interleaved/non-interleaved DC first and refinement scans, AC first
and refinement with EOB-run coding, tables redefinable between
scans) — 8-bit precision, grayscale or 3-component YCbCr with any
sampling factors (4:4:4 / 4:2:2 / 4:2:0 / asymmetric), multi-table
DQT/DHT segments, restart intervals, 0xFF byte stuffing and fill
bytes. Lossless/hierarchical/arithmetic SOFs, 12-bit, multi-scan
sequential, CMYK, and Adobe-RGB streams raise `UnsupportedFormat`,
so `binary_ops._decode_one` falls to the metadata tier
(`codecs.image_dims`, decoder attribution ``jpeg-dims``) exactly as
before — the tier contract narrows, it never lies.

The entropy decode is a per-block Python loop (huffman is inherently
sequential — same correctness-first stance as the PNG Paeth rows);
everything after it is numpy-vectorized over ALL blocks at once:
dequantization, de-zigzag, the 8x8 IDCT as two matrix multiplies via
`einsum`, plane assembly, index-gather chroma upsampling, and the
YCbCr→RGB convert. This tier is the no-PIL fallback inside an
Arrow-batched `mapInPandas` pass, not a production image pipeline.

MEASURED throughput floor (round 14, `tools/stress_scale.py
--codec-floor`, single core, Annex-K textured 0.4/0.8 MP images,
after the LUT-huffman + list-coefficient optimization): baseline
≈ 0.26–0.32 MB/s of compressed payload (≈ 0.6–0.74 Mpix/s,
≈ 22–27 GB/day/core); progressive ≈ 0.26–0.33 MB/s (≈ 0.52–0.65
Mpix/s — near baseline parity, ≈ 22–28 GB/day/core). Deployment
rule derived from the floor: when a corpus's JPEG decode budget
exceeds roughly **22 GB/day per allocated core**, REQUIRE
PIL/libjpeg-turbo on the executors (binary_ops tries PIL first;
turbo decodes 2–3 orders of magnitude faster) — below it, the
pure-python tier keeps a PIL-less cluster correct at tolerable
cost. Full table incl. PNG/GIF floors in BASELINE.md round-14
section.

`make_jpeg` is the test-side generator (the `make_png` pattern — no
binary fixtures in the repo): a baseline SOF0 encoder with the Annex
K huffman tables and a choice of quantization (all-ones for
near-lossless round trips that pin decoder correctness tightly;
Annex K tables for realistic lossy streams), optional 4:2:0 chroma
subsampling, restart intervals, and ``progressive=True`` (a
DC-first/DC-refine/AC-first/AC-refine scan script with per-block
EOB flushing). Encoder and decoder share no transform code (FDCT vs
IDCT, bit writer vs bit reader), so a round trip genuinely
cross-checks both directions.
"""

from __future__ import annotations

import numpy as np

from .codecs import UnsupportedFormat

# zigzag scan: sequence index i -> position in the natural-order
# flattened 8x8 block (T.81 Figure A.6)
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: FDCT is C @ f @ C.T, IDCT is
    C.T @ F @ C (T.81 A.3.3)."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    c = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c


_DCT = _dct_matrix()

# hard ceiling on a single JPEG's padded coefficient samples —
# payloads are untrusted; ~8 MP of 4:4:4 color fits, a crafted
# 65k x 65k SOF is rejected before any allocation or entropy work
JPEG_MAX_COEF_SAMPLES = 1 << 25

# hard ceiling on progressive SOS scans per frame. The sample cap
# bounds per-scan memory/work, but each extra scan is a fresh pass
# over every block — a crafted stream appending hundreds of 17-byte
# AC-refinement scans is a CPU amplification bomb (libjpeg-turbo
# caps scans similarly). A legitimate encoder emits well under
# 10 scans per component x SA level; 64 per component is generous.
# Measured residual bound (r14, post cap + entropy optimization): a
# 4 Mpix DC-scan replay bomb refuses in 5 s vs 2.5 s legit decode —
# worst crafted amplification is ~cap x one-scan cost, i.e. bounded
# minutes at the 33M-sample ceiling, not the unbounded >345 s/100
# tiny scans the r13 review measured.
JPEG_MAX_SCANS_PER_COMPONENT = 64

# T.81 Annex K.1/K.2 example quantization tables (natural order)
ANNEX_K_LUMA_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

ANNEX_K_CHROMA_QUANT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# T.81 Annex K.3 example huffman tables: (BITS counts for code
# lengths 1..16, HUFFVAL symbol list)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])


class _HuffTable:
    """Canonical huffman table (T.81 C.2) with a 16-bit prefix LUT:
    ``lut[p]`` for every 16-bit left-aligned prefix ``p`` packs
    ``symbol << 5 | code_length`` (−1 = invalid prefix), so
    `decode_symbol` is one list index instead of a bit-at-a-time
    dict walk — the profiled hot spot of the pure-python tier
    (decode_symbol + read_bit were 80 % of a baseline decode).
    ``map`` keeps the {(length, code): symbol} view for the
    encoder.

    The LUT builds LAZILY on first decode use: a 65k-entry list per
    table is cheap once (~2 ms) but a crafted stream could stuff
    thousands of DHT segments — eager builds would be a fresh CPU
    amplification vector, while lazy builds are bounded by the
    tables a capped scan actually consumes."""

    __slots__ = ("map", "_lut")

    def __init__(self, bits, vals):
        if sum(bits) != len(vals):
            raise UnsupportedFormat(
                "JPEG huffman BITS/HUFFVAL mismatch")
        table, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                table[(length, code)] = vals[k]
                k += 1
                code += 1
            if code > (1 << length):
                raise UnsupportedFormat("overfull JPEG huffman table")
            code <<= 1
        self.map = table
        self._lut = None

    @property
    def lut(self):
        if self._lut is None:
            lut = [-1] * (1 << 16)
            for (length, code), sym in self.map.items():
                start = code << (16 - length)
                span = 1 << (16 - length)
                lut[start:start + span] = [int(sym) << 5 | length] * span
            self._lut = lut
        return self._lut


def _build_decode_table(bits, vals):
    """Canonical huffman decode table (see `_HuffTable`)."""
    return _HuffTable(bits, vals)


def _build_encode_table(bits, vals):
    """{symbol: (code, length)} — the encoder-side view."""
    dec = _build_decode_table(bits, vals)
    return {sym: (code, length)
            for (length, code), sym in dec.map.items()}


class _BitReader:
    """MSB-first reader over the entropy-coded segment: 0xFF00
    unstuffing; any other marker terminates the readable stream
    (restart markers are consumed explicitly via `restart`).

    Buffered: `_fill` pulls whole bytes into an int accumulator
    (``acc`` holds the low ``n`` bits still unconsumed), so
    magnitude bits come out in one mask-and-shift and huffman
    symbols in one LUT index. The buffer NEVER crosses a marker —
    `_fill` stops at any 0xFF + non-zero byte and records why the
    stream ended, so consuming past the end raises the same typed
    errors as the old bit-at-a-time reader."""

    __slots__ = ("data", "pos", "acc", "n", "end")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.end = None

    def _fill(self) -> None:
        d, p, acc, n = self.data, self.pos, self.acc, self.n
        ln = len(d)
        while n <= 48:
            if p >= ln:
                self.end = "truncated JPEG entropy data"
                break
            b = d[p]
            if b == 0xFF:
                nxt = d[p + 1] if p + 1 < ln else None
                if nxt != 0x00:
                    self.end = "JPEG entropy data ran into a marker"
                    break
                p += 2             # stuffed 0xFF00 -> literal FF
            else:
                p += 1
            acc = (acc << 8) | b
            n += 8
        self.pos = p
        self.acc = acc & ((1 << n) - 1)   # keep acc word-sized
        self.n = n

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
            if self.n == 0:
                raise UnsupportedFormat(self.end)
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, n: int) -> int:
        """n raw magnitude bits, MSB first (no sign extension)."""
        if n == 0:
            return 0
        if self.n < n:
            self._fill()
            if self.n < n:
                raise UnsupportedFormat(self.end)
        self.n -= n
        return (self.acc >> self.n) & ((1 << n) - 1)

    def receive_extend(self, n: int) -> int:
        """Read an n-bit magnitude and sign-extend it (T.81 F.2.2.1:
        values with a 0 high bit encode negatives)."""
        v = self.receive(n)
        if n and v < (1 << (n - 1)):
            v -= (1 << n) - 1
        return v

    def decode_symbol(self, table) -> int:
        avail = self.n
        if avail < 16:
            self._fill()
            avail = self.n
        if avail >= 16:
            idx = (self.acc >> (avail - 16)) & 0xFFFF
        elif avail:
            # stream end inside the last code: pad the PEEK only —
            # a code fitting the remaining bits still decodes; one
            # needing more raises the recorded end reason below
            idx = (self.acc << (16 - avail)) & 0xFFFF
        else:
            raise UnsupportedFormat(self.end)
        lut = table._lut
        if lut is None:
            lut = table.lut            # one-time lazy build
        packed = lut[idx]
        if packed < 0:
            raise UnsupportedFormat("invalid JPEG huffman code")
        length = packed & 31
        if length > avail:
            raise UnsupportedFormat(self.end)
        self.n = avail - length
        return packed >> 5

    def restart(self) -> None:
        """Byte-align and consume the expected RSTn marker (T.81
        F.2.1.3.1); fill 0xFFs before it are legal."""
        if self.n >= 8:
            # full unconsumed data bytes before the boundary mean the
            # entropy decode and the restart grid disagree — the old
            # reader's position would sit on a data byte here
            raise UnsupportedFormat("missing JPEG restart marker")
        self.n = 0
        d, p = self.data, self.pos
        if p + 1 >= len(d) or d[p] != 0xFF:
            raise UnsupportedFormat("missing JPEG restart marker")
        while p + 1 < len(d) and d[p + 1] == 0xFF:
            p += 1
        if not 0xD0 <= d[p + 1] <= 0xD7:
            raise UnsupportedFormat("missing JPEG restart marker")
        self.pos = p + 2


def _decode_block(reader, dc_table, ac_table, pred):
    """One 8x8 block of zigzag-order coefficients (T.81 F.2.2) as a
    plain 64-list (scalar writes; see the coef-store comment in
    `_setup_grids`)."""
    coef = [0] * 64
    s = reader.decode_symbol(dc_table)
    if s > 11:
        # T.81 F.1.2.1.2: DC size categories are 0-11 for 8-bit —
        # a crafted DHT symbol would otherwise build a huge int and
        # overflow the int32 coef store untyped (review r13b)
        raise UnsupportedFormat(f"JPEG DC size category {s}")
    pred += reader.receive_extend(s) if s else 0
    coef[0] = pred
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                break                  # EOB
            k += 16                    # ZRL: sixteen zeros
            continue
        k += r
        if k > 63:
            raise UnsupportedFormat("JPEG AC run past block end")
        coef[k] = reader.receive_extend(s)
        k += 1
    return coef, pred


_SOF_UNSUPPORTED = {
    0xC2: "progressive JPEG",
    0xC3: "lossless JPEG",
    0xC5: "differential sequential JPEG",
    0xC6: "differential progressive JPEG",
    0xC7: "differential lossless JPEG",
    0xC9: "arithmetic-coded JPEG",
    0xCA: "arithmetic progressive JPEG",
    0xCB: "arithmetic lossless JPEG",
    0xCD: "differential arithmetic JPEG",
    0xCE: "differential arithmetic progressive JPEG",
    0xCF: "differential arithmetic lossless JPEG",
}


def _parse_dqt(body: bytes, qt: dict) -> None:
    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0x0F
        i += 1
        if pq not in (0, 1):
            raise UnsupportedFormat("bad DQT precision")
        n = 64 * (pq + 1)
        if i + n > len(body):
            raise UnsupportedFormat("truncated DQT table")
        if pq:
            tbl = np.frombuffer(body[i:i + n],
                                dtype=">u2").astype(np.int64)
        else:
            tbl = np.frombuffer(body[i:i + n],
                                dtype=np.uint8).astype(np.int64)
        qt[tq] = tbl                   # zigzag order, as stored
        i += n


def _parse_dht(body: bytes, huff: dict) -> None:
    i = 0
    while i < len(body):
        if i + 17 > len(body):
            raise UnsupportedFormat("truncated DHT header")
        tc, th = body[i] >> 4, body[i] & 0x0F
        bits = list(body[i + 1:i + 17])
        n = sum(bits)
        if i + 17 + n > len(body):
            raise UnsupportedFormat("truncated DHT values")
        vals = list(body[i + 17:i + 17 + n])
        huff[(tc, th)] = _build_decode_table(bits, vals)
        i += 17 + n


def _parse_sof(body: bytes) -> dict:
    if len(body) < 6:
        raise UnsupportedFormat("short JPEG SOF segment")
    if body[0] != 8:
        raise UnsupportedFormat(f"{body[0]}-bit JPEG")
    h = int.from_bytes(body[1:3], "big")
    w = int.from_bytes(body[3:5], "big")
    nc = body[5]
    if h < 1:
        raise UnsupportedFormat("JPEG with DNL-deferred height")
    if w < 1:
        raise UnsupportedFormat("degenerate JPEG width")
    if nc not in (1, 3):
        raise UnsupportedFormat(f"{nc}-component JPEG")
    if len(body) < 6 + 3 * nc:
        raise UnsupportedFormat("short JPEG SOF segment")
    comps = []
    for ci in range(nc):
        cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
        hi, vi = hv >> 4, hv & 0x0F
        if not (1 <= hi <= 4 and 1 <= vi <= 4):
            raise UnsupportedFormat("bad JPEG sampling factor")
        comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
    if nc == 1:
        # single-component frame: MCU is one data unit; sampling
        # factors do not apply (T.81 A.2.2)
        comps[0]["h"] = comps[0]["v"] = 1
    return {"w": w, "h": h, "comps": comps}


def _setup_grids(frame: dict) -> tuple[int, int, int, int]:
    """Attach padded block grids + zeroed coefficient arrays to the
    frame's components, bomb-guarded; returns (hmax, vmax, mcux,
    mcuy)."""
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
    # Bound allocations by what the SOF promises BEFORE any zeros/
    # entropy work — the same untrusted-corpus decompression-bomb
    # guard as the PNG inflate cap: a crafted 65500x65500 SOF would
    # otherwise allocate tens of GiB of coefficient arrays and spin
    # the per-MCU Python loop for hours on one blob (review r13).
    # The cap is on padded coefficient SAMPLES; the peak buffer is
    # the float64 IDCT input at 8 bytes/sample (<=256 MiB here).
    total_samples = sum(c["bh"] * c["bw"] * 64 for c in comps)
    if total_samples > JPEG_MAX_COEF_SAMPLES:
        raise UnsupportedFormat(
            f"JPEG decoded size {total_samples} coefficient samples "
            f"exceeds cap {JPEG_MAX_COEF_SAMPLES}")
    for c in comps:
        # plain Python lists, not numpy rows: the entropy loops do
        # per-position scalar reads/writes (coef[k] != 0, += p1),
        # where numpy scalar access is ~10x a list op and dominated
        # the profiled progressive decode; _reconstruct converts to
        # one ndarray after entropy decode
        c["coef"] = [[0] * 64 for _ in range(c["bh"] * c["bw"])]
    return hmax, vmax, mcux, mcuy


def _reconstruct(frame: dict, qt: dict, hmax: int,
                 vmax: int) -> np.ndarray:
    """Dequant + de-zigzag + vectorized IDCT + upsample + color
    convert — shared by the sequential and progressive paths."""
    w, h = frame["w"], frame["h"]
    planes = []
    for c in frame["comps"]:
        if c["tq"] not in qt:
            raise UnsupportedFormat("JPEG SOF references missing "
                                    "quant table")
        # dequant in zigzag order (DQT stores zigzag), then
        # de-zigzag, then one vectorized IDCT over every block
        deq = np.asarray(c["coef"], dtype=np.int64) \
            * qt[c["tq"]][None, :]
        nat = np.zeros_like(deq)
        nat[:, _ZIGZAG] = deq
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT, blocks, _DCT)
        spatial = np.clip(np.round(spatial) + 128, 0, 255)
        plane = (spatial.reshape(c["bh"], c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["bh"] * 8, c["bw"] * 8))
        # index-gather upsample to full frame dims (handles 4:2:0 /
        # 4:2:2 / asymmetric ratios and the edge crop in one step)
        yy = (np.arange(h) * c["v"]) // vmax
        xx = (np.arange(w) * c["h"]) // hmax
        planes.append(plane[yy][:, xx])
    if len(planes) == 1:
        return planes[0].astype(np.uint8)[..., None]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return (np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255)
            .astype(np.uint8))


def decode_jpeg(data: bytes) -> np.ndarray:
    """(height, width, channels) uint8 — grayscale (1) or RGB (3) —
    for huffman-coded baseline, extended-sequential AND progressive
    (spectral selection + successive approximation) JPEG. Anything
    outside that envelope raises `UnsupportedFormat` (the caller's
    metadata/stub tiers take over)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise UnsupportedFormat("not a JPEG stream")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    entropy_pos = None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise UnsupportedFormat("JPEG marker sync lost")
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1                   # fill bytes (T.81 B.1.1.2)
        marker = data[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            pos += 2                   # standalone markers
            continue
        seg = int.from_bytes(data[pos + 2:pos + 4], "big")
        if seg < 2 or pos + 2 + seg > len(data):
            raise UnsupportedFormat("truncated JPEG segment")
        body = data[pos + 4:pos + 2 + seg]
        if marker == 0xDB:             # DQT, possibly several tables
            _parse_dqt(body, qt)
        elif marker == 0xC4:           # DHT, possibly several tables
            _parse_dht(body, huff)
        elif marker in (0xC0, 0xC1):   # baseline / extended seq.
            frame = _parse_sof(body)
        elif marker == 0xC2:           # progressive: its own path
            return _decode_progressive(data)
        elif marker in _SOF_UNSUPPORTED:
            raise UnsupportedFormat(_SOF_UNSUPPORTED[marker])
        elif marker == 0xDD:           # DRI
            if len(body) < 2:
                raise UnsupportedFormat("short JPEG DRI segment")
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xEE:           # APP14: Adobe transform flag
            if body[:5] == b"Adobe" and len(body) >= 12 \
                    and body[11] == 0:
                raise UnsupportedFormat("Adobe RGB-transform JPEG")
        elif marker == 0xDA:           # SOS — entropy data follows
            if len(body) < 1:
                raise UnsupportedFormat("short JPEG SOS segment")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise UnsupportedFormat("short JPEG SOS segment")
            scan = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                     body[2 + 2 * i] & 0x0F) for i in range(ns)]
            entropy_pos = pos + 2 + seg
            break
        pos += 2 + seg
    if frame is None or scan is None:
        raise UnsupportedFormat("JPEG without SOF+SOS")
    comps = frame["comps"]
    if len(scan) != len(comps):
        raise UnsupportedFormat("multi-scan sequential JPEG")
    by_id = {c["id"]: c for c in comps}
    for cs, td, ta in scan:
        if cs not in by_id:
            raise UnsupportedFormat("JPEG SOS references unknown "
                                    "component")
        by_id[cs]["dc"] = td
        by_id[cs]["ac"] = ta
    hmax, vmax, mcux, mcuy = _setup_grids(frame)
    for c in comps:
        if c["tq"] not in qt:
            raise UnsupportedFormat("JPEG SOF references missing "
                                    "quant table")
        if (0, c["dc"]) not in huff or (1, c["ac"]) not in huff:
            raise UnsupportedFormat("JPEG SOS references missing "
                                    "huffman table")
    reader = _BitReader(data, entropy_pos)
    preds = [0] * len(comps)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and \
                    mcu % restart_interval == 0:
                reader.restart()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t = huff[(0, c["dc"])]
                ac_t = huff[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block, preds[ci] = _decode_block(
                            reader, dc_t, ac_t, preds[ci])
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = block
            mcu += 1
    return _reconstruct(frame, qt, hmax, vmax)


def _ac_first_block(reader, ac_table, coef, ss, se, al, eobrun):
    """One block of an AC first scan (T.81 G.1.2.2): run/size codes
    with EOB-run coding, values scaled by 2^Al."""
    if eobrun > 0:
        return eobrun - 1              # whole band is zero here
    k = ss
    while k <= se:
        rs = reader.decode_symbol(ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.receive(r)
                return eobrun - 1      # this block is one of them
            k += 16                    # ZRL
            continue
        k += r
        if k > se:
            raise UnsupportedFormat("JPEG AC run past band end")
        coef[k] = reader.receive_extend(s) << al
        k += 1
    return 0


def _ac_refine_block(reader, ac_table, coef, ss, se, al, eobrun):
    """One block of an AC refinement scan (T.81 G.1.2.3): correction
    bits for history-nonzero coefficients, newly-visible ±1·2^Al
    placements, EOB runs carrying trailing corrections."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_table)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s:
                if s != 1:
                    raise UnsupportedFormat(
                        "JPEG refinement magnitude > 1")
                newval = p1 if reader.read_bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.receive(r)
                break                  # trailing corrections below
            # advance over r zero-history positions, reading a
            # correction bit at each nonzero-history one passed
            while k <= se:
                if coef[k] != 0:
                    if reader.read_bit() and not (coef[k] & p1):
                        coef[k] += p1 if coef[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        # inside an EOB run: every nonzero-history coefficient from
        # k to the band end still carries a correction bit
        while k <= se:
            if coef[k] != 0:
                if reader.read_bit() and not (coef[k] & p1):
                    coef[k] += p1 if coef[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(data: bytes) -> np.ndarray:
    """Progressive huffman JPEG (SOF2, T.81 Annex G): coefficients
    accumulate across scans — interleaved/non-interleaved DC first +
    refinement, per-component AC first + refinement with EOB-run
    coding — then one shared reconstruction. Tables may be redefined
    between scans; restart intervals reset predictors AND the EOB
    run."""
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    grids = None
    restart_interval = 0
    n_scans = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise UnsupportedFormat("JPEG marker sync lost")
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:             # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        seg = int.from_bytes(data[pos + 2:pos + 4], "big")
        if seg < 2 or pos + 2 + seg > len(data):
            raise UnsupportedFormat("truncated JPEG segment")
        body = data[pos + 4:pos + 2 + seg]
        if marker == 0xDB:
            _parse_dqt(body, qt)
        elif marker == 0xC4:
            _parse_dht(body, huff)
        elif marker == 0xC2:
            if frame is not None:
                raise UnsupportedFormat("multiple JPEG frames")
            frame = _parse_sof(body)
            grids = _setup_grids(frame)
        elif marker in (0xC0, 0xC1) or marker in _SOF_UNSUPPORTED:
            raise UnsupportedFormat("mixed JPEG frame types")
        elif marker == 0xDD:
            if len(body) < 2:
                raise UnsupportedFormat("short JPEG DRI segment")
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xEE:
            if body[:5] == b"Adobe" and len(body) >= 12 \
                    and body[11] == 0:
                raise UnsupportedFormat("Adobe RGB-transform JPEG")
        elif marker == 0xDA:
            if frame is None:
                raise UnsupportedFormat("JPEG scan before SOF")
            max_scans = (len(frame["comps"])
                         * JPEG_MAX_SCANS_PER_COMPONENT)
            if n_scans >= max_scans:
                # CPU-bomb guard: each scan is a full pass over every
                # block, so scan count — not just per-scan size — must
                # be bounded against crafted streams (checked BEFORE
                # decoding the excess scan)
                raise UnsupportedFormat(
                    f"progressive JPEG with more than {max_scans} "
                    "scans")
            pos = _progressive_scan(data, pos + 2 + seg, body,
                                    frame, huff, restart_interval)
            n_scans += 1
            continue
        pos += 2 + seg
    if frame is None or n_scans == 0:
        raise UnsupportedFormat("JPEG without SOF+SOS")
    hmax, vmax, _, _ = grids
    return _reconstruct(frame, qt, hmax, vmax)


def _progressive_scan(data: bytes, entropy_pos: int, body: bytes,
                      frame: dict, huff: dict,
                      restart_interval: int) -> int:
    """Decode one progressive scan's entropy data; returns the
    position of the next marker."""
    if len(body) < 1:
        raise UnsupportedFormat("short JPEG SOS segment")
    ns = body[0]
    if len(body) < 1 + 2 * ns + 3:
        raise UnsupportedFormat("short JPEG SOS segment")
    if not 1 <= ns <= 4:
        raise UnsupportedFormat(f"{ns}-component JPEG scan")
    ss = body[1 + 2 * ns]
    se = body[2 + 2 * ns]
    ahal = body[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    if not (0 <= ss <= se <= 63) or al > 13 or ah > 14:
        raise UnsupportedFormat("bad JPEG progressive scan header")
    if ah and ah != al + 1:
        raise UnsupportedFormat("non-unit successive approximation")
    by_id = {c["id"]: c for c in frame["comps"]}
    scan_comps = []
    for i in range(ns):
        cs, tt = body[1 + 2 * i], body[2 + 2 * i]
        if cs not in by_id:
            raise UnsupportedFormat("JPEG SOS references unknown "
                                    "component")
        c = by_id[cs]
        c["dc"], c["ac"] = tt >> 4, tt & 0x0F
        scan_comps.append(c)
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise UnsupportedFormat("progressive scan mixes DC and AC")
    if not dc_scan and ns != 1:
        raise UnsupportedFormat("interleaved progressive AC scan")
    reader = _BitReader(data, entropy_pos)
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    w, h = frame["w"], frame["h"]

    def tables(c, tc):
        t = huff.get((tc, c["dc"] if tc == 0 else c["ac"]))
        if t is None and not (dc_scan and ah):
            raise UnsupportedFormat("JPEG SOS references missing "
                                    "huffman table")
        return t

    preds = [0] * len(scan_comps)
    eobrun = 0
    if dc_scan and ns > 1:
        # interleaved DC scan: baseline MCU geometry
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu and \
                        mcu % restart_interval == 0:
                    reader.restart()
                    preds = [0] * len(scan_comps)
                for ci, c in enumerate(scan_comps):
                    dc_t = tables(c, 0)
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            row = my * c["v"] + by
                            col = mx * c["h"] + bx
                            blk = c["coef"][row * c["bw"] + col]
                            preds[ci] = _dc_progressive(
                                reader, dc_t, blk, ah, al,
                                preds[ci])
                mcu += 1
    else:
        # non-interleaved scan: the component's TRUE block grid
        # (T.81 A.2.2), row-indexed into its padded coef array
        c = scan_comps[0]
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        nbx = -(-cw // 8)
        nby = -(-ch // 8)
        dc_t = tables(c, 0) if dc_scan else None
        ac_t = tables(c, 1) if not dc_scan else None
        n_block = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and n_block and \
                        n_block % restart_interval == 0:
                    reader.restart()
                    preds = [0] * len(scan_comps)
                    eobrun = 0
                blk = c["coef"][by * c["bw"] + bx]
                if dc_scan:
                    preds[0] = _dc_progressive(
                        reader, dc_t, blk, ah, al, preds[0])
                elif ah == 0:
                    eobrun = _ac_first_block(
                        reader, ac_t, blk, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(
                        reader, ac_t, blk, ss, se, al, eobrun)
                n_block += 1
    # advance to the next marker (skipping stuffed bytes and any
    # stray restart markers after the last MCU)
    pos = reader.pos
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            if 0xD0 <= data[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    raise UnsupportedFormat("JPEG stream ended inside a scan")


def _dc_progressive(reader, dc_table, blk, ah, al, pred):
    """DC coefficient for one block: first scan (Ah=0) diff-codes
    the point-transformed value; refinement appends one bit."""
    if ah == 0:
        s = reader.decode_symbol(dc_table)
        if s > 11:
            raise UnsupportedFormat(f"JPEG DC size category {s}")
        pred += reader.receive_extend(s) if s else 0
        val = pred << al
        if not -(1 << 30) <= val <= (1 << 30):
            # corrupt predictor walk: keep the int32 store typed
            raise UnsupportedFormat("JPEG DC predictor out of range")
        blk[0] = val
    else:
        if reader.read_bit():
            blk[0] |= 1 << al
    return pred


def is_baseline(data: bytes) -> bool:
    """Header-only: True for the huffman baseline/extended-sequential
    (SOF0/SOF1) subset of `is_decodable` — kept for callers that
    care about the single-scan envelope specifically."""
    return _sof_envelope(data, (0xC0, 0xC1))


def is_decodable(data: bytes) -> bool:
    """Header-only classification: True when this stream is inside
    `decode_jpeg`'s envelope (huffman baseline, extended-sequential
    OR progressive — SOF0/SOF1/SOF2 — 8-bit, 1- or 3-component, not
    Adobe-RGB, dims under the decode cap) WITHOUT touching the
    entropy data. The dims pass (`binary_ops._decode_one`) uses this
    to attribute the ``jpeg`` tier at header-walk cost instead of
    paying a full pure-python pixel decode just to report 4 scalars
    (review r13); like the PIL tier, whose `Image.open` also reads
    only the header. A stream whose ENTROPY data later proves
    corrupt still falls to the stub tier in the pixel passes
    (features/resize) — this is a format classification, not a
    decode guarantee."""
    return _sof_envelope(data, (0xC0, 0xC1, 0xC2))


def _sof_envelope(data: bytes, sof_markers: tuple) -> bool:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return False
    pos = 2
    sof_ok = None
    sof_marker = None
    sof_nc = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return False
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            pos += 2
            continue
        seg = int.from_bytes(data[pos + 2:pos + 4], "big")
        if seg < 2 or pos + 2 + seg > len(data):
            return False
        body = data[pos + 4:pos + 2 + seg]
        if marker in sof_markers:
            if len(body) < 6 or body[0] != 8:
                return False
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3) or h < 1 or w < 1:
                return False
            if len(body) < 6 + 3 * nc:
                return False
            hvb = [body[7 + 3 * i] for i in range(nc)]
            hs = [b >> 4 for b in hvb]
            vs = [b & 0x0F for b in hvb]
            if not all(1 <= x <= 4 for x in hs + vs):
                return False
            mcux = -(-w // (8 * max(hs)))
            mcuy = -(-h // (8 * max(vs)))
            samples = sum(mcux * hi * mcuy * vi * 64
                          for hi, vi in zip(hs, vs))
            sof_ok = samples <= JPEG_MAX_COEF_SAMPLES
            sof_marker = marker
            sof_nc = nc
        elif marker == 0xC2 or marker in _SOF_UNSUPPORTED \
                or marker == 0xCC:
            # a SOF type outside this call's envelope (0xC2 reaches
            # here only when sof_markers excludes it)
            return False
        elif marker == 0xEE and body[:5] == b"Adobe" \
                and len(body) >= 12 and body[11] == 0:
            return False                 # Adobe RGB transform
        elif marker == 0xDA:
            if sof_marker in (0xC0, 0xC1) and len(body) >= 1 \
                    and body[0] < sof_nc:
                # multi-scan SEQUENTIAL stream (one scan per
                # component): decode_jpeg refuses it, so the envelope
                # must too — otherwise the dims pass labels the blob
                # 'jpeg' (promising pixel decode) while the pixel
                # passes fall to the stub tier
                return False
            return bool(sof_ok)
        pos += 2 + seg
    return False


class _BitWriter:
    """MSB-first writer with 0xFF byte stuffing (encoder side)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient
    (T.81 F.1.2.1: negatives store their one's complement)."""
    s = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _encode_block(writer, zig, pred, dc_codes, ac_codes) -> int:
    s, bits = _magnitude(int(zig[0]) - pred)
    code, ln = dc_codes[s]
    writer.write(code, ln)
    writer.write(bits, s)
    run = 0
    for k in range(1, 64):
        v = int(zig[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]      # ZRL
            writer.write(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(bits, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]          # EOB
        writer.write(code, ln)
    return int(zig[0])


def _plane_to_zigzag(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(bh, bw, 64) zigzag-order quantized coefficients for one
    edge-replicated plane — FDCT vectorized over all blocks."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane.astype(np.float64) - 128,
                    ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8))
    f = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT)
    q = np.round(f.reshape(-1, 64) / quant[None, :]).astype(np.int32)
    return q[:, _ZIGZAG].reshape(bh, bw, 64)


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward zero
    (T.81 G.1.2.1 — NOT an arithmetic shift, which floors)."""
    return (abs(v) >> al) if v >= 0 else -(abs(v) >> al)


def make_jpeg(arr: np.ndarray, quant: str | int | None = None,
              subsample: bool = False,
              restart_interval: int = 0,
              progressive: bool = False) -> bytes:
    """Encode a (h, w, 1|3) uint8 array as JFIF — baseline SOF0, or
    with ``progressive=True`` a progressive SOF2 stream (DC first at
    Al=1 → DC refinement → per-component AC first at Al=1 → AC
    refinement, exercising spectral selection, successive
    approximation, EOB runs and correction bits).

    ``quant=None`` → all-ones tables (near-lossless: only DCT
    rounding survives — the tight decoder-parity fixture);
    ``quant="annex-k"`` → the T.81 example tables (realistic lossy);
    an int 1-255 → a flat table of that step. ``subsample=True``
    emits 4:2:0 chroma (2x2 box-averaged). ``restart_interval=N``
    inserts RSTn markers every N MCUs (baseline) / N scan units
    (progressive)."""
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError(f"expected (h, w, 1|3), got {arr.shape}")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    gray = arr.shape[2] == 1
    if quant is None:
        ql = qc = np.ones(64, dtype=np.int64)
    elif quant == "annex-k":
        ql, qc = ANNEX_K_LUMA_QUANT, ANNEX_K_CHROMA_QUANT
    elif isinstance(quant, int) and 1 <= quant <= 255:
        ql = qc = np.full(64, quant, dtype=np.int64)
    else:
        raise ValueError(f"quant must be None, 'annex-k' or 1-255, "
                         f"got {quant!r}")
    if gray:
        planes = [arr[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        quants = [ql]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            # pad to even dims, then 2x2 box average
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def _down(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return (p.reshape(ph // 2, 2, pw // 2, 2)
                        .mean(axis=(1, 3)))
            planes = [y, _down(cb), _down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        quants = [ql, qc, qc]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    zigs = []
    for p, (hi, vi), q in zip(planes, samp, quants):
        # pad the plane so its block grid covers the MCU grid
        need_h, need_w = mcuy * vi * 8, mcux * hi * 8
        ph, pw = p.shape
        p = np.pad(p, ((0, need_h - ph), (0, need_w - pw)),
                   mode="edge")
        zigs.append(_plane_to_zigzag(p, q))
    dc_l = _build_encode_table(*_DC_LUMA)
    ac_l = _build_encode_table(*_AC_LUMA)
    dc_c = _build_encode_table(*_DC_CHROMA)
    ac_c = _build_encode_table(*_AC_CHROMA)
    codes = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    def maybe_restart(writer, n, state) -> None:
        if restart_interval and n and n % restart_interval == 0:
            writer.flush()
            writer.buf += bytes([0xFF, 0xD0 + state["rst"] % 8])
            state["rst"] += 1
            state["preds"] = [0] * len(planes)

    if not progressive:
        writer = _BitWriter()
        st = {"rst": 0, "preds": [0] * len(planes)}
        mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(writer, mcu, st)
                for ci, ((hi, vi), (dct, act)) in enumerate(
                        zip(samp, codes)):
                    for by in range(vi):
                        for bx in range(hi):
                            st["preds"][ci] = _encode_block(
                                writer, zigs[ci][my * vi + by,
                                                 mx * hi + bx],
                                st["preds"][ci], dct, act)
                mcu += 1
        writer.flush()
        scans = None
    else:
        scans = _progressive_scans(zigs, samp, codes, w, h,
                                   hmax, vmax, mcux, mcuy,
                                   maybe_restart, len(planes))

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) \
            + (len(payload) + 2).to_bytes(2, "big") + payload

    def dqt(tq: int, q: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tq])
                   + bytes(int(v) for v in q[_ZIGZAG]))

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                   + bytes(vals))

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00"
               + (1).to_bytes(2, "big") * 2 + b"\x00\x00")
    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qc)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([len(planes)])
    for ci, (hi, vi) in enumerate(samp):
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += seg(0xC2 if progressive else 0xC0, sof)
    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if not gray:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    if not progressive:
        sos = bytes([len(planes)])
        for ci in range(len(planes)):
            t = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (t << 4) | t])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)
        out += writer.buf
    else:
        for sos_payload, entropy in scans:
            out += seg(0xDA, sos_payload)
            out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _progressive_scans(zigs, samp, codes, w, h, hmax, vmax,
                       mcux, mcuy, maybe_restart, n_planes):
    """Build the progressive scan list: [(sos_payload, entropy)].
    Script: interleaved DC first (Al=1) → interleaved DC refinement
    → per-component AC first 1-63 (Al=1) → per-component AC
    refinement (Ah=1 → Al=0). EOB runs are flushed per block (legal,
    slightly less compact than cross-block buffering — this is the
    test-side generator, not a production encoder)."""
    def sos_payload(comp_ids, ss, se, ah, al):
        p = bytes([len(comp_ids)])
        for ci in comp_ids:
            t = 0 if ci == 0 else 1
            p += bytes([ci + 1, (t << 4) | t])
        return p + bytes([ss, se, (ah << 4) | al])

    all_ids = list(range(n_planes))
    scans = []

    # --- interleaved DC first scan (Al = 1) ---
    wr = _BitWriter()
    st = {"rst": 0, "preds": [0] * n_planes}
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            maybe_restart(wr, mcu, st)
            for ci, (hi, vi) in enumerate(samp):
                dct = codes[ci][0]
                for by in range(vi):
                    for bx in range(hi):
                        v = int(zigs[ci][my * vi + by,
                                         mx * hi + bx][0])
                        sv = v >> 1            # DC point transform
                        s, bits = _magnitude(sv - st["preds"][ci])
                        code, ln = dct[s]
                        wr.write(code, ln)
                        wr.write(bits, s)
                        st["preds"][ci] = sv
            mcu += 1
    wr.flush()
    scans.append((sos_payload(all_ids, 0, 0, 0, 1), bytes(wr.buf)))

    # --- interleaved DC refinement (Ah=1 -> Al=0): one raw bit ---
    wr = _BitWriter()
    st = {"rst": 0, "preds": [0] * n_planes}
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            maybe_restart(wr, mcu, st)
            for ci, (hi, vi) in enumerate(samp):
                for by in range(vi):
                    for bx in range(hi):
                        v = int(zigs[ci][my * vi + by,
                                         mx * hi + bx][0])
                        wr.write(v & 1, 1)
            mcu += 1
    wr.flush()
    scans.append((sos_payload(all_ids, 0, 0, 1, 0), bytes(wr.buf)))

    # --- per-component AC scans over the TRUE block grid ---
    for ci, (hi, vi) in enumerate(samp):
        act = codes[ci][1]
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        nbx, nby = -(-cw // 8), -(-ch // 8)

        # AC first, band 1-63, Al = 1
        wr = _BitWriter()
        st = {"rst": 0, "preds": [0] * n_planes}
        nb = 0
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart(wr, nb, st)
                z = zigs[ci][by, bx]
                r = 0
                for k in range(1, 64):
                    t = _pt_ac(int(z[k]), 1)
                    if t == 0:
                        r += 1
                        continue
                    while r > 15:
                        code, ln = act[0xF0]
                        wr.write(code, ln)
                        r -= 16
                    s, bits = _magnitude(t)
                    code, ln = act[(r << 4) | s]
                    wr.write(code, ln)
                    wr.write(bits, s)
                    r = 0
                if r:
                    code, ln = act[0x00]   # EOB, run of 1
                    wr.write(code, ln)
                nb += 1
        wr.flush()
        scans.append((sos_payload([ci], 1, 63, 0, 1),
                      bytes(wr.buf)))

        # AC refinement, band 1-63, Ah=1 -> Al=0
        wr = _BitWriter()
        st = {"rst": 0, "preds": [0] * n_planes}
        nb = 0
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart(wr, nb, st)
                z = zigs[ci][by, bx]
                absv = [abs(int(z[k])) for k in range(64)]
                eob = 0
                for k in range(1, 64):
                    if absv[k] == 1:
                        eob = k            # last newly-visible coef
                r = 0
                buffered: list[int] = []
                for k in range(1, 64):
                    t = absv[k]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        code, ln = act[0xF0]
                        wr.write(code, ln)
                        r -= 16
                        for b in buffered:
                            wr.write(b, 1)
                        buffered = []
                    if t > 1:              # history: correction bit
                        buffered.append(t & 1)
                        continue
                    code, ln = act[(r << 4) | 1]
                    wr.write(code, ln)
                    wr.write(1 if int(z[k]) > 0 else 0, 1)
                    for b in buffered:
                        wr.write(b, 1)
                    buffered = []
                    r = 0
                if r > 0 or buffered:
                    code, ln = act[0x00]   # EOB carrying trailing
                    wr.write(code, ln)     # corrections
                    for b in buffered:
                        wr.write(b, 1)
                nb += 1
        wr.flush()
        scans.append((sos_payload([ci], 1, 63, 1, 0),
                      bytes(wr.buf)))
    return scans
