"""Pure-python GIF decoder + test-side encoder (public format:
GIF87a/GIF89a specification, CompuServe 1987/1989; LZW per the spec's
variable-code-size variant).

Promotes GIF from the metadata tier (`image_dims` logical-screen
dims, stub features/resize) to REAL pixel decode in `decode_media` /
`extract_features` / `resize_media`:

* `decode_gif` — first frame of any GIF87a/GIF89a stream: global and
  local color tables, interlaced and sequential row order, LZW with
  growing code sizes (3-12 bits), clear/EOI handling, sub-block
  reassembly. The frame is composed onto the logical-screen canvas
  (background-color filled) at its descriptor offset, like a viewer's
  first paint; Graphic Control transparency maps transparent pixels
  to the background color (alpha is dropped, matching the palette-PNG
  and BMP decoders' no-alpha contract). Later frames of an animation
  are ignored — the decode passes treat a GIF as one image, and the
  y4m tier owns video semantics. Malformed streams raise
  `UnsupportedFormat` — one corrupt blob must fall to the stub tier,
  never kill a 100 TB mapInPandas pass.

* `make_gif` — the test-side generator (the `make_png` / `make_jpeg`
  pattern: no binary fixtures in the repo): palette-builds from the
  array's distinct colors (≤256 — the GIF envelope), LZW-encodes with
  the same growing-code-size rules, optional interlace, so round
  trips are EXACT (GIF is lossless) and cross-check both directions
  with no shared transform code.
"""

from __future__ import annotations

import numpy as np

from .codecs import UnsupportedFormat

# hard ceiling on a single GIF's composed canvas bytes (h*w*3) —
# payloads are untrusted; same bomb-guard stance as the PNG inflate
# cap and the JPEG coefficient cap
GIF_MAX_CANVAS_BYTES = 1 << 28


def _color_table(data: bytes, pos: int, flag_byte: int
                 ) -> tuple[np.ndarray | None, int]:
    """(table, new_pos): read a color table if the descriptor flag
    says one follows."""
    if not flag_byte & 0x80:
        return None, pos
    n = 2 << (flag_byte & 0x07)
    end = pos + 3 * n
    if end > len(data):
        raise UnsupportedFormat("truncated GIF color table")
    return (np.frombuffer(data[pos:end], dtype=np.uint8)
            .reshape(n, 3)), end


def _skip_sub_blocks(data: bytes, pos: int) -> int:
    """Advance past a sub-block chain WITHOUT materializing it —
    the structure-only walk `has_frame` runs per record in the dims
    pass (review r13b: joining a multi-MB first-frame payload just
    to validate chain lengths doubled the pass's memory traffic)."""
    while True:
        if pos >= len(data):
            raise UnsupportedFormat("truncated GIF sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        if pos + n > len(data):
            raise UnsupportedFormat("truncated GIF sub-block")
        pos += n


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Reassemble a sub-block chain into one bytes payload."""
    parts = []
    while True:
        if pos >= len(data):
            raise UnsupportedFormat("truncated GIF sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > len(data):
            raise UnsupportedFormat("truncated GIF sub-block")
        parts.append(data[pos:pos + n])
        pos += n


def _lzw_decode(payload: bytes, min_code_size: int,
                n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable code width starting at
    min_code_size+1, clear code resets the dictionary, EOI ends the
    stream; output capped at n_pixels (the bomb guard — a crafted
    stream cannot out-produce its image descriptor)."""
    if not 2 <= min_code_size <= 11:
        raise UnsupportedFormat(
            f"GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # dictionary as a list of bytes; index = code
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(payload):
                # spec says EOI should appear; tolerate exhaustion
                # only when the frame is already complete
                if n_out == n_pixels:
                    return out
                raise UnsupportedFormat("truncated GIF LZW stream")
            acc |= payload[pos] << nbits     # LSB-first packing
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            if n_out != n_pixels:
                raise UnsupportedFormat(
                    f"GIF LZW ended at {n_out}/{n_pixels} pixels")
            return out
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]          # the KwKwK case
        else:
            raise UnsupportedFormat("GIF LZW code out of range")
        if n_out + len(entry) > n_pixels:
            raise UnsupportedFormat(
                "GIF LZW stream overruns its image descriptor")
        out[n_out:n_out + len(entry)] = np.frombuffer(entry,
                                                      dtype=np.uint8)
        n_out += len(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Reorder rows from GIF 4-pass interlace to sequential."""
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[np.array(order)] = rows
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """(height, width, 3) uint8 RGB: the first frame composed onto
    the logical-screen canvas. Raises `UnsupportedFormat` outside
    the envelope (no frame, corrupt LZW, canvas over the cap)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise UnsupportedFormat("not a GIF stream")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    if sw < 1 or sh < 1:
        raise UnsupportedFormat("degenerate GIF logical screen")
    if sw * sh * 3 > GIF_MAX_CANVAS_BYTES:
        raise UnsupportedFormat(
            f"GIF canvas {sw}x{sh} exceeds cap {GIF_MAX_CANVAS_BYTES}")
    flags = data[10]
    bg_index = data[11]
    gct, pos = _color_table(data, 13, flags)
    transparent: int | None = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:                    # trailer before a frame
            break
        if block == 0x21:                    # extension
            if pos >= len(data):
                raise UnsupportedFormat("truncated GIF extension")
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9:
                # a GCE governs only the next rendering block
                # (GIF89a 23c) — a later GCE with the flag clear
                # must RESET a stale index (review r13b)
                transparent = body[3] \
                    if len(body) >= 4 and body[0] & 1 else None
            continue
        if block != 0x2C:
            raise UnsupportedFormat(
                f"unknown GIF block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise UnsupportedFormat("truncated GIF image descriptor")
        left = int.from_bytes(data[pos:pos + 2], "little")
        top = int.from_bytes(data[pos + 2:pos + 4], "little")
        w = int.from_bytes(data[pos + 4:pos + 6], "little")
        h = int.from_bytes(data[pos + 6:pos + 8], "little")
        iflags = data[pos + 8]
        pos += 9
        lct, pos = _color_table(data, pos, iflags)
        palette = lct if lct is not None else gct
        if palette is None:
            raise UnsupportedFormat("GIF frame without a color table")
        if w < 1 or h < 1 or left + w > sw or top + h > sh:
            raise UnsupportedFormat("GIF frame outside the canvas")
        if pos >= len(data):
            raise UnsupportedFormat("truncated GIF image data")
        min_code = data[pos]
        payload, pos = _sub_blocks(data, pos + 1)
        idx = _lzw_decode(payload, min_code, w * h).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise UnsupportedFormat("GIF index out of palette range")
        # compose the first frame onto the background-filled canvas
        if gct is not None and bg_index < gct.shape[0]:
            bg = gct[bg_index]
        else:
            bg = np.zeros(3, dtype=np.uint8)
        canvas = np.broadcast_to(bg, (sh, sw, 3)).copy()
        frame = palette[idx]
        if transparent is not None:
            mask = idx == transparent        # keep background there
            frame = np.where(mask[..., None],
                             canvas[top:top + h, left:left + w],
                             frame)
        canvas[top:top + h, left:left + w] = frame
        return canvas
    raise UnsupportedFormat("GIF without an image frame")


def has_frame(data: bytes) -> bool:
    """Structure-only classification: True when the stream carries
    at least one complete image frame (header, color tables,
    intact sub-block chain) — WITHOUT running the LZW decode. The
    dims pass (`binary_ops._decode_one`) uses this to attribute the
    ``gif`` tier at walk cost, like `jpeg.is_baseline`; a frame
    whose LZW payload later proves corrupt still falls to the stub
    tier in the pixel passes."""
    try:
        if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
            return False
        sw = int.from_bytes(data[6:8], "little")
        sh = int.from_bytes(data[8:10], "little")
        if sw < 1 or sh < 1 or sw * sh * 3 > GIF_MAX_CANVAS_BYTES:
            return False
        _, pos = _color_table(data, 13, data[10])
        while pos < len(data):
            block = data[pos]
            pos += 1
            if block == 0x3B:
                return False
            if block == 0x21:
                pos += 1                     # label byte
                pos = _skip_sub_blocks(data, pos)
                continue
            if block != 0x2C:
                return False
            if pos + 9 > len(data):
                return False
            left = int.from_bytes(data[pos:pos + 2], "little")
            top = int.from_bytes(data[pos + 2:pos + 4], "little")
            w = int.from_bytes(data[pos + 4:pos + 6], "little")
            h = int.from_bytes(data[pos + 6:pos + 8], "little")
            iflags = data[pos + 8]
            pos += 9
            _, pos = _color_table(data, pos, iflags)
            if w < 1 or h < 1 or left + w > sw or top + h > sh:
                return False
            if not (iflags & 0x80 or data[10] & 0x80):
                return False                 # no palette anywhere
            if pos >= len(data):
                return False
            if not 2 <= data[pos] <= 11:
                return False   # decode_gif refuses this min-code,
                               # so the tier label must too (r13b)
            _skip_sub_blocks(data, pos + 1)
            return True
        return False
    except UnsupportedFormat:
        return False


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW encoder (test-side): emits clear up front,
    grows code width exactly when the DECODER's table fills, ends
    with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for v in indices.tobytes():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            # the decoder adds its entry one code BEHIND us (its
            # size after reading our k-th code is next_code - 1);
            # grow width exactly when ITS table hits 2^width so
            # both sides read/write the next code at the same width
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        prev = bytes([v])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif(arr: np.ndarray, interlace: bool = False,
             version: bytes = b"GIF89a") -> bytes:
    """Encode a (h, w, 3) uint8 array (≤256 distinct colors) as a
    single-frame GIF with a global color table."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3), got {arr.shape}")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise ValueError(f"{colors.shape[0]} distinct colors; GIF "
                         f"carries at most 256")
    # color-table size: power of two >= max(n_colors, 2)
    bits = max(int(np.ceil(np.log2(max(colors.shape[0], 2)))), 1)
    n_slots = 1 << bits
    table = np.zeros((n_slots, 3), dtype=np.uint8)
    table[:colors.shape[0]] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        order = [y for start, step in _INTERLACE_PASSES
                 for y in range(start, h, step)]
        idx = idx[np.array(order)]
    min_code = max(bits, 2)
    payload = _lzw_encode(idx.reshape(-1), min_code)
    out = bytearray(version)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag+size, bg, ratio
    out += table.tobytes()
    out += b"\x2c" + bytes(4)                # descriptor at (0, 0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0])
    out += bytes([min_code])
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
