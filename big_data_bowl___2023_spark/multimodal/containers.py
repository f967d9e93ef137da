"""Metadata walkers for the dominant real-world A/V container
families: ISO-BMFF (MP4/MOV/M4A + the HEIF/AVIF image flavor), MPEG
audio (MP3), FLAC, Ogg (Vorbis/Opus), and RIFF AVI.

These are METADATA tiers in the `image_dims` pattern: duration,
track dimensions, sample rate, and channel counts come from a
bounded header walk — pixel/sample decode of compressed A/V (H.264,
AAC, MP3 audio, FLAC subframes) is deliberately out of pure-python
scope. Before this module a web-crawl bucket's biggest media classes
landed `modality='unknown'` → `unknown-stub`, leaving corpus
profiles and data cards blind to them (round-13 verdict #2); now
they attribute as `mp4-dims`/`mp3-dims`/`flac-dims` with real
header facts.

Every walker treats the payload as UNTRUSTED: box/block/frame walks
are visit-capped and length-validated, and every failure raises the
typed `UnsupportedFormat` so a crafted blob falls to the stub tier
instead of escaping into a 100 TB mapInPandas pass (the same
contract the image codec family carries, fuzz-armored in
tests/test_codec_fuzz.py).

Public specs: ISO/IEC 14496-12 (box structure, mvhd/tkhd/hdlr),
ISO/IEC 11172-3 §2.4.1 + 13818-3 (MPEG audio frame headers; the
Xing/Info VBR tag is the de-facto public layout), and the xiph.org
FLAC format document (METADATA_BLOCK_STREAMINFO).

Reference parity: the R reference (`/root/reference`, six .R files)
has no media path at all — this extends the engine's training-data
surface (SURVEY §2 extension family), not the §2 core."""

from __future__ import annotations

from .codecs import UnsupportedFormat

# bomb guards: a crafted stream must not amplify a small payload
# into unbounded walk work
MP4_MAX_BOXES = 4096          # total boxes visited per stream
MP4_MAX_DEPTH = 8             # container nesting
MP3_SYNC_SCAN = 1 << 16       # bytes searched for the first frame
FLAC_MAX_BLOCKS = 128         # metadata blocks before the refusal
OGG_TAIL_SCAN = 1 << 16       # bytes scanned back for the last page
AVI_MAX_CHUNKS = 4096         # RIFF chunks visited per stream

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl",
                   b"edts", b"udta", b"mvex", b"iprp", b"ipco"}

# ISO-BMFF major brands that are IMAGES (HEIF/AVIF), not video —
# the bridge classifies on these, and the decode tier reads dims
# from the meta/iprp/ipco/ispe box instead of moov
HEIF_BRANDS = (b"heic", b"heix", b"mif1", b"msf1")
AVIF_BRANDS = (b"avif", b"avis")


# ------------------------------------------------------------ ISO-BMFF

def _u32(b: bytes, off: int) -> int:
    return int.from_bytes(b[off:off + 4], "big")


def _u64(b: bytes, off: int) -> int:
    return int.from_bytes(b[off:off + 8], "big")


def _walk_boxes(data: bytes, start: int, end: int, depth: int,
                state: dict, meta: dict,
                track: dict | None) -> None:
    """Depth-first over [start, end): fills meta from mvhd, per-track
    dims/handler from tkhd/hdlr. Visit- and depth-capped."""
    pos = start
    while pos + 8 <= end:
        state["boxes"] += 1
        if state["boxes"] > MP4_MAX_BOXES:
            raise UnsupportedFormat(
                f"ISO-BMFF stream with more than {MP4_MAX_BOXES} "
                "boxes")
        size = _u32(data, pos)
        btype = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise UnsupportedFormat("truncated ISO-BMFF largesize")
            size = _u64(data, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos               # box extends to EOF
        if size < hdr or pos + size > end:
            raise UnsupportedFormat("ISO-BMFF box overruns its parent")
        body, bend = pos + hdr, pos + size
        if btype in _MP4_CONTAINERS:
            if depth >= MP4_MAX_DEPTH:
                raise UnsupportedFormat("ISO-BMFF nesting too deep")
            child = {"handler": None, "width": 0, "height": 0,
                     "n_samples": 0, "codec": None} \
                if btype == b"trak" else track
            _walk_boxes(data, body, bend, depth + 1, state, meta,
                        child)
            if btype == b"trak":
                meta["n_tracks"] += 1
                if child["handler"] == b"vide":
                    meta["n_video_tracks"] += 1
                    if meta["n_video_tracks"] == 1:
                        meta["width"] = child["width"]
                        meta["height"] = child["height"]
                        meta["n_frames"] = child["n_samples"]
                        meta["video_codec"] = child["codec"]
                elif child["handler"] == b"soun":
                    meta["n_audio_tracks"] += 1
                    if meta["n_audio_tracks"] == 1:
                        meta["audio_codec"] = child["codec"]
        elif btype == b"mvhd":
            if bend - body < 24:
                raise UnsupportedFormat("short mvhd box")
            ver = data[body]
            if ver == 1:
                if bend - body < 32:
                    raise UnsupportedFormat("short v1 mvhd box")
                ts, dur = _u32(data, body + 20), _u64(data, body + 24)
            else:
                ts, dur = _u32(data, body + 12), _u32(data, body + 16)
            meta["timescale"] = ts
            meta["duration_s"] = (dur / ts) if ts > 0 else 0.0
        elif btype == b"tkhd" and track is not None:
            ver = data[body] if bend > body else 0
            woff = body + (88 if ver == 1 else 76)
            if woff + 8 <= bend:
                # 16.16 fixed-point presentation dims
                track["width"] = _u32(data, woff) >> 16
                track["height"] = _u32(data, woff + 4) >> 16
        elif btype == b"hdlr" and track is not None:
            # only the media handler counts: QuickTime-style MOVs
            # carry a SECOND data-handler hdlr inside minf ('url '/
            # 'alis' at the same offset) which must not clobber the
            # mdia-level 'vide'/'soun' classification (review r14)
            if bend - body >= 12 and track["handler"] is None:
                track["handler"] = data[body + 8:body + 12]
        elif btype == b"stts" and track is not None:
            # time-to-sample: Σ sample_count over entries = the
            # track's true sample/frame count (entry walk capped by
            # the declared box length, already validated above)
            if bend - body >= 8:
                n_entries = _u32(data, body + 4)
                total, p2 = 0, body + 8
                for _ in range(min(n_entries,
                                   (bend - p2) // 8)):
                    total += _u32(data, p2)
                    p2 += 8
                track["n_samples"] = total
        elif btype == b"meta":
            # ISO 14496-12 meta is a FULLBOX (4 version/flags bytes
            # before children) but CLASSIC QuickTime meta atoms are
            # plain containers — the standard disambiguation (ffmpeg
            # does the same) peeks for a child type right at body:
            # a QT meta's first child is 'hdlr' with no offset
            if depth >= MP4_MAX_DEPTH:
                raise UnsupportedFormat("ISO-BMFF nesting too deep")
            off = 0 if data[body + 4:body + 8] == b"hdlr" else 4
            if bend - body >= off:
                _walk_boxes(data, body + off, bend, depth + 1,
                            state, meta, track)
        elif btype == b"ispe":
            # image spatial extents (HEIF/AVIF): first one wins (the
            # primary item precedes thumbnails in practice)
            if bend - body >= 12 and meta.get("ispe_width", 0) == 0:
                meta["ispe_width"] = _u32(data, body + 4)
                meta["ispe_height"] = _u32(data, body + 8)
        elif btype == b"stsd" and track is not None:
            # sample description: the first entry's fourcc is the
            # track's codec (avc1/hev1/mp4a/...)
            if bend - body >= 16:
                track["codec"] = data[body + 12:body + 16] \
                    .decode("latin-1").strip("\x00 ")
        pos = bend


def mp4_meta(data: bytes) -> dict:
    """Header metadata for an ISO-BMFF (MP4/MOV/M4A) stream:
    ``brand``, ``timescale``, ``duration_s`` (from ``moov/mvhd``),
    first video track's presentation ``width``/``height`` (from
    ``tkhd``, 16.16 fixed → int; 0×0 when no video track),
    ``n_frames`` (the first video track's ``stts`` sample total —
    the TRUE frame count, 0 when the box is absent),
    ``video_codec``/``audio_codec`` (first ``stsd`` entry fourcc,
    e.g. avc1/hev1/mp4a), and ``n_tracks``/``n_video_tracks``/
    ``n_audio_tracks`` (handler types from ``mdia/hdlr``). Raises
    `UnsupportedFormat` on anything malformed, truncated, or over
    the walk caps."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise UnsupportedFormat("not an ISO-BMFF stream")
    meta = {"brand": data[8:12].decode("latin-1").strip(),
            "timescale": 0, "duration_s": 0.0, "width": 0,
            "height": 0, "n_tracks": 0, "n_video_tracks": 0,
            "n_audio_tracks": 0, "n_frames": 0,
            "video_codec": None, "audio_codec": None,
            "ispe_width": 0, "ispe_height": 0}
    try:
        _walk_boxes(data, 0, len(data), 0, {"boxes": 0}, meta, None)
    except UnsupportedFormat:
        raise
    except Exception as exc:               # one contract, no escapes
        raise UnsupportedFormat(
            f"malformed ISO-BMFF stream: {exc}") from exc
    if meta["timescale"] == 0 and meta["ispe_width"] == 0:
        # HEIF/AVIF images legitimately carry no moov — the ispe
        # dims stand in; anything with neither is malformed
        raise UnsupportedFormat(
            "ISO-BMFF stream without moov/mvhd or meta/ispe")
    return meta


# ----------------------------------------------------------- MPEG audio

# bitrate tables (kbps), header index 1..14 (11172-3 §2.4.2.3 /
# 13818-3); key = (version_group, layer): version_group 1 = MPEG-1,
# 2 = MPEG-2/2.5 (which share tables)
_MP3_BITRATES = {
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
}
_MP3_BITRATES[(2, 3)] = _MP3_BITRATES[(2, 2)]

_MP3_RATES = {3: (44100, 48000, 32000),      # version bits 11 = MPEG-1
              2: (22050, 24000, 16000),      # 10 = MPEG-2
              0: (11025, 12000, 8000)}       # 00 = MPEG-2.5


def _mp3_frame(data: bytes, off: int) -> dict | None:
    """Parse the 4-byte MPEG audio frame header at ``off``; None when
    the bytes are not a valid fixed-rate header (free-format and
    reserved fields refuse — they carry no parseable duration)."""
    if off + 4 > len(data):
        return None
    h = int.from_bytes(data[off:off + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver_bits = (h >> 19) & 3
    layer_bits = (h >> 17) & 3
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if ver_bits == 1 or layer_bits == 0 or br_idx in (0, 15) \
            or sr_idx == 3:
        return None
    layer = 4 - layer_bits                 # bits 01→III, 10→II, 11→I
    vgroup = 1 if ver_bits == 3 else 2
    rate = _MP3_RATES[ver_bits][sr_idx]
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx - 1] * 1000
    pad = (h >> 9) & 1
    mono = ((h >> 6) & 3) == 3
    crc = ((h >> 16) & 1) == 0             # protection bit 0 = CRC
    if layer == 1:
        spf = 384
        frame_size = (12 * bitrate // rate + pad) * 4
    else:
        spf = 1152 if (layer == 2 or vgroup == 1) else 576
        frame_size = spf // 8 * bitrate // rate + pad
    return {"rate": rate, "bitrate": bitrate, "channels":
            1 if mono else 2, "spf": spf, "frame_size": frame_size,
            "layer": layer, "vgroup": vgroup, "crc": crc}


def _id3v2_end(data: bytes) -> int:
    """Byte offset just past a leading ID3v2 shell (syncsafe 28-bit
    size, 4 × 7 bits — ID3v2 §3.1), or 0 when the payload carries no
    tag. Shared by `mp3_meta`, `flac_meta` and `codecs.sniff` so an
    ID3-shelled FLAC dispatches to the FLAC walker instead of
    locking onto a spurious MPEG sync inside the FLAC frames.

    The declared syncsafe size excludes the 10-byte header AND, when
    the v2.4 footer flag (byte 5 bit 4, ID3v2.4 §3.1) is set, the
    10-byte footer — a footered tag's audio starts at
    10 + size + 10 (ADVICE r15)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    end = 10 + ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
    if data[5] & 0x10:                       # v2.4 footer present
        end += 10
    return end


def mp3_meta(data: bytes) -> dict:
    """Header metadata for an MPEG audio (MP3) stream: ``rate``,
    ``channels``, ``n_frames``, ``duration_s``, ``vbr``. Skips an
    ID3v2 tag (syncsafe size), scans a bounded window for the first
    valid frame header, then reads the Xing/Info VBR tag (exact
    frame count) or falls back to the CBR estimate
    (payload_bytes · 8 / bitrate). Raises `UnsupportedFormat` when
    no valid frame appears in the scan window.

    A lone 4-byte header validating mid-scan has a ~1.8e-4
    false-positive rate per offset — over a 64 KiB byte-by-byte
    window junk almost surely "syncs" (ADVICE r14). So a candidate
    only counts when the header at ``pos + frame_size`` ALSO parses
    with matching version/layer/rate (2-consecutive-frame
    validation, as real demuxers do); a stream that ends inside the
    first frame is accepted as a single truncated frame, since no
    second header exists to disprove it."""
    try:
        start = _id3v2_end(data)
        if data[start:start + 4] == b"fLaC":
            raise UnsupportedFormat(
                "ID3-shelled FLAC — not MPEG audio")
        limit = min(len(data), start + MP3_SYNC_SCAN)
        frame = None
        pos = start
        while pos + 4 <= limit:
            frame = _mp3_frame(data, pos)
            if frame is not None:
                nxt = pos + frame["frame_size"]
                if nxt + 4 <= len(data):
                    peer = _mp3_frame(data, nxt)
                    if (peer is None
                            or peer["vgroup"] != frame["vgroup"]
                            or peer["layer"] != frame["layer"]
                            or peer["rate"] != frame["rate"]):
                        frame = None       # spurious sync — keep going
            if frame is not None:
                break
            pos += 1
        if frame is None:
            raise UnsupportedFormat(
                "no MPEG audio frame in the scan window")
        # Xing/Info tag sits after the side info of the first frame
        side = (32 if frame["channels"] == 2 else 17) \
            if frame["vgroup"] == 1 \
            else (17 if frame["channels"] == 2 else 9)
        tag_at = pos + 4 + (2 if frame["crc"] else 0) + side
        n_frames, vbr = 0, False
        if data[tag_at:tag_at + 4] in (b"Xing", b"Info") \
                and tag_at + 12 <= len(data):
            flags = _u32(data, tag_at + 4)
            if flags & 1:
                n_frames = _u32(data, tag_at + 8)
                vbr = data[tag_at:tag_at + 4] == b"Xing"
        if n_frames > 0:
            duration = n_frames * frame["spf"] / frame["rate"]
        else:
            audio_bytes = len(data) - pos
            duration = audio_bytes * 8 / frame["bitrate"]
            n_frames = audio_bytes // max(frame["frame_size"], 1)
        return {"rate": frame["rate"], "channels": frame["channels"],
                "n_frames": int(n_frames),
                "duration_s": float(duration), "vbr": vbr}
    except UnsupportedFormat:
        raise
    except Exception as exc:
        raise UnsupportedFormat(
            f"malformed MPEG audio stream: {exc}") from exc


# ---------------------------------------------------------------- FLAC

def flac_meta(data: bytes) -> dict:
    """STREAMINFO metadata for a FLAC stream: ``rate``, ``channels``,
    ``bits_per_sample``, ``total_samples``, ``duration_s``. The spec
    mandates STREAMINFO as the first metadata block; block walk is
    capped. A leading ID3v2 shell (common in tagged rips, tolerated
    by real decoders) is skipped. Raises `UnsupportedFormat` on
    anything malformed."""
    try:
        shell = _id3v2_end(data)
        if shell:
            data = data[shell:]
        if data[:4] != b"fLaC" or len(data) < 8:
            raise UnsupportedFormat("not a FLAC stream")
        pos, blocks = 4, 0
        info = None
        while pos + 4 <= len(data):
            blocks += 1
            if blocks > FLAC_MAX_BLOCKS:
                raise UnsupportedFormat(
                    f"FLAC stream with more than {FLAC_MAX_BLOCKS} "
                    "metadata blocks")
            hdr = data[pos]
            btype, last = hdr & 0x7F, bool(hdr & 0x80)
            length = int.from_bytes(data[pos + 1:pos + 4], "big")
            body = data[pos + 4:pos + 4 + length]
            if len(body) < length:
                raise UnsupportedFormat("truncated FLAC block")
            if blocks == 1:
                if btype != 0 or length < 34:
                    raise UnsupportedFormat(
                        "FLAC without leading STREAMINFO")
                info = body
            pos += 4 + length
            if last:
                break
        if info is None:
            raise UnsupportedFormat("FLAC without metadata blocks")
        rate = (info[10] << 12) | (info[11] << 4) | (info[12] >> 4)
        channels = ((info[12] >> 1) & 0x7) + 1
        bps = (((info[12] & 1) << 4) | (info[13] >> 4)) + 1
        total = ((info[13] & 0x0F) << 32) \
            | int.from_bytes(info[14:18], "big")
        if rate == 0:
            raise UnsupportedFormat("FLAC STREAMINFO with zero rate")
        return {"rate": rate, "channels": channels,
                "bits_per_sample": bps, "total_samples": total,
                "duration_s": total / rate}
    except UnsupportedFormat:
        raise
    except Exception as exc:
        raise UnsupportedFormat(
            f"malformed FLAC stream: {exc}") from exc


# ------------------------------------------------- test-side encoders
# (no binary fixtures in the repo — same stance as make_png/make_jpeg)

def make_mp4(duration_s: float = 10.0, timescale: int = 1000,
             width: int = 0, height: int = 0,
             audio: bool = False, brand: bytes = b"isom",
             n_frames: int = 0, video_codec: bytes | None = None,
             audio_codec: bytes | None = None,
             qt_data_handler: bool = False) -> bytes:
    """Minimal valid ISO-BMFF stream: ftyp + moov(mvhd [+ trak(tkhd,
    mdia(hdlr [+ minf(stbl(stts, stsd))]))] per requested track).
    ``width>0`` adds a video track; ``audio=True`` adds an audio
    track; ``n_frames``/``*_codec`` emit stts/stsd boxes;
    ``qt_data_handler`` adds the QuickTime-style second hdlr
    (dhlr/'url ') inside minf that real .mov muxers write."""
    def box(btype: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + btype + payload

    def full(btype: bytes, payload: bytes) -> bytes:
        return box(btype, b"\x00\x00\x00\x00" + payload)

    dur = int(round(duration_s * timescale))
    mvhd = full(b"mvhd", (0).to_bytes(4, "big") * 2
                + timescale.to_bytes(4, "big")
                + dur.to_bytes(4, "big")
                + (0x00010000).to_bytes(4, "big")      # rate 1.0
                + (0x0100).to_bytes(2, "big")          # volume 1.0
                + b"\x00" * 10 + _unity_matrix()
                + b"\x00" * 24 + (99).to_bytes(4, "big"))

    def trak(handler: bytes, w: int, h: int, frames: int,
             codec: bytes | None) -> bytes:
        tkhd = full(b"tkhd", (0).to_bytes(4, "big") * 2
                    + (1).to_bytes(4, "big") + b"\x00" * 4
                    + dur.to_bytes(4, "big") + b"\x00" * 8
                    + b"\x00" * 8 + _unity_matrix()
                    + (w << 16).to_bytes(4, "big")
                    + (h << 16).to_bytes(4, "big"))
        hdlr = full(b"hdlr", b"\x00" * 4 + handler + b"\x00" * 13)
        stbl = b""
        minf_extra = b""
        if qt_data_handler:
            minf_extra = full(b"hdlr", b"dhlr" + b"url "
                              + b"\x00" * 13)
        if frames > 0:
            stbl += full(b"stts", (1).to_bytes(4, "big")
                         + frames.to_bytes(4, "big")
                         + (1).to_bytes(4, "big"))
        if codec:
            entry = (16).to_bytes(4, "big") + codec + b"\x00" * 8
            stbl += full(b"stsd", (1).to_bytes(4, "big") + entry)
        mdia = hdlr
        if stbl or minf_extra:
            mdia += box(b"minf", minf_extra + box(b"stbl", stbl))
        return box(b"trak", tkhd + box(b"mdia", mdia))

    traks = b""
    if width > 0:
        traks += trak(b"vide", width, height, n_frames, video_codec)
    if audio:
        traks += trak(b"soun", 0, 0, 0, audio_codec)
    ftyp = box(b"ftyp", brand + (0).to_bytes(4, "big") + b"isom")
    return ftyp + box(b"moov", mvhd + traks)


def _unity_matrix() -> bytes:
    m = [0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000]
    return b"".join(x.to_bytes(4, "big") for x in m)


def make_mp3(n_frames: int = 8, xing: bool = True,
             id3_bytes: int = 0, mono: bool = False) -> bytes:
    """Minimal MPEG-1 Layer III stream at 44.1 kHz / 128 kbps:
    optional ID3v2 shell, first frame carrying a Xing tag (exact
    frame count) when ``xing``, then zero-payload frames."""
    hdr = bytes([0xFF, 0xFB,
                 0x90,                       # 128 kbps, 44100, no pad
                 0xC0 if mono else 0x40])
    frame_size = 1152 // 8 * 128000 // 44100    # 417 bytes
    frame = bytearray(hdr + b"\x00" * (frame_size - 4))
    out = bytearray()
    if id3_bytes > 0:
        size = id3_bytes
        out += (b"ID3\x04\x00\x00"
                + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                         (size >> 7) & 0x7F, size & 0x7F])
                + b"\x00" * size)
    if xing:
        first = bytearray(frame)
        side = 17 if mono else 32
        at = 4 + side
        first[at:at + 4] = b"Xing"
        first[at + 4:at + 8] = (1).to_bytes(4, "big")
        first[at + 8:at + 12] = n_frames.to_bytes(4, "big")
        out += first
        out += frame * max(0, n_frames - 1)
    else:
        out += frame * n_frames
    return bytes(out)


def make_flac(total_samples: int = 441000, rate: int = 44100,
              channels: int = 2, bps: int = 16) -> bytes:
    """fLaC magic + a single (last) STREAMINFO block — no audio
    frames, which is all the metadata walker reads."""
    info = bytearray(34)
    info[0:2] = (4096).to_bytes(2, "big")
    info[2:4] = (4096).to_bytes(2, "big")
    info[10] = (rate >> 12) & 0xFF
    info[11] = (rate >> 4) & 0xFF
    info[12] = ((rate & 0xF) << 4) | ((channels - 1) << 1) \
        | ((bps - 1) >> 4)
    info[13] = (((bps - 1) & 0xF) << 4) | ((total_samples >> 32) & 0xF)
    info[14:18] = (total_samples & 0xFFFFFFFF).to_bytes(4, "big")
    return (b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
            + bytes(info))


# ----------------------------------------------------------------- Ogg

def ogg_meta(data: bytes) -> dict:
    """Ogg (RFC 3533) metadata: ``codec`` ("vorbis"/"opus"),
    ``rate``, ``channels`` from the first page's identification
    packet, plus ``total_samples`` (the LAST page's granule
    position, in the codec's granule timebase — PCM samples for
    Vorbis, 48 kHz ticks for Opus) and ``duration_s``. The tail
    scan for the last page is bounded (``OGG_TAIL_SCAN``); CRCs are
    not validated (metadata tier, not playback). Other codecs
    (Theora, FLAC-in-Ogg, Speex) refuse typed."""
    try:
        if data[:4] != b"OggS" or len(data) < 28 or data[4] != 0:
            raise UnsupportedFormat("not an Ogg page stream")
        nsegs = data[26]
        payload_at = 27 + nsegs
        first_len = sum(data[27:payload_at])
        pkt = data[payload_at:payload_at + first_len]
        if pkt[:7] == b"\x01vorbis" and len(pkt) >= 16:
            codec = "vorbis"
            channels = pkt[11]
            rate = int.from_bytes(pkt[12:16], "little")
            timebase = rate
        elif pkt[:8] == b"OpusHead" and len(pkt) >= 16:
            codec = "opus"
            channels = pkt[9]
            rate = int.from_bytes(pkt[12:16], "little")
            timebase = 48000               # Opus granules are 48 kHz
        else:
            raise UnsupportedFormat("Ogg stream with an unrecognized "
                                    "codec id packet")
        if rate == 0 or channels == 0:
            raise UnsupportedFormat("degenerate Ogg id header")
        # last granule: walk back over OggS captures in the tail
        # window until one carries a valid version byte and a
        # non -1 granule
        total = 0
        at = len(data)
        floor_at = max(0, len(data) - OGG_TAIL_SCAN)
        while True:
            at = data.rfind(b"OggS", floor_at, at)
            if at < 0:
                break
            if at + 14 <= len(data) and data[at + 4] == 0:
                g = int.from_bytes(data[at + 6:at + 14], "little")
                if g != (1 << 64) - 1:     # -1 = no packet ends here
                    total = g
                    break
            if at == 0:
                break
        return {"codec": codec, "rate": rate, "channels": channels,
                "total_samples": total,
                "duration_s": total / timebase}
    except UnsupportedFormat:
        raise
    except Exception as exc:
        raise UnsupportedFormat(
            f"malformed Ogg stream: {exc}") from exc


def _ogg_page(htype: int, granule: int, seq: int,
              payload: bytes) -> bytes:
    """One Ogg page with zeroed CRC (the walker doesn't validate) —
    payload must fit 255 lacing segments."""
    nsegs = len(payload) // 255 + 1
    lacing = bytes([255] * (nsegs - 1) + [len(payload) % 255])
    return (b"OggS" + bytes([0, htype])
            + granule.to_bytes(8, "little")
            + (7).to_bytes(4, "little") + seq.to_bytes(4, "little")
            + b"\x00" * 4 + bytes([nsegs]) + lacing + payload)


def make_ogg(codec: str = "vorbis", rate: int = 44100,
             channels: int = 2, total_samples: int = 441000) -> bytes:
    """Minimal Ogg stream: BOS page with the id packet + EOS page
    carrying the final granule position."""
    if codec == "vorbis":
        pkt = (b"\x01vorbis" + (0).to_bytes(4, "little")
               + bytes([channels]) + rate.to_bytes(4, "little")
               + b"\x00" * 12 + bytes([0xB8]) + bytes([0x01]))
    elif codec == "opus":
        pkt = (b"OpusHead" + bytes([1, channels])
               + (312).to_bytes(2, "little")
               + rate.to_bytes(4, "little") + b"\x00" * 2
               + bytes([0]))
    else:
        raise ValueError(f"unknown test codec {codec!r}")
    return (_ogg_page(0x02, 0, 0, pkt)
            + _ogg_page(0x04, total_samples, 1, b"\x00" * 16))


# ----------------------------------------------------------------- AVI

def avi_meta(data: bytes) -> dict:
    """RIFF AVI metadata from the ``hdrl``/``avih`` main header:
    ``width``, ``height``, ``n_frames``, ``us_per_frame``,
    ``duration_s``, ``n_streams``. Chunk walk is count-capped and
    length-validated; video/audio payload decode is out of scope
    (the ``-dims`` tier contract)."""
    try:
        if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
            raise UnsupportedFormat("not a RIFF AVI stream")

        def find_avih(start: int, end: int, chunks: list,
                      depth: int) -> int:
            if depth > 8:                # sibling walkers' cap
                raise UnsupportedFormat("AVI LIST nesting too deep")
            pos = start
            while pos + 8 <= end:
                chunks[0] += 1
                if chunks[0] > AVI_MAX_CHUNKS:
                    raise UnsupportedFormat(
                        f"AVI with more than {AVI_MAX_CHUNKS} chunks")
                fourcc = data[pos:pos + 4]
                size = int.from_bytes(data[pos + 4:pos + 8],
                                      "little")
                body = pos + 8
                if body + size > end:
                    raise UnsupportedFormat(
                        "AVI chunk overruns its parent")
                if fourcc == b"LIST":
                    at = find_avih(body + 4, body + size, chunks,
                                   depth + 1)
                    if at >= 0:
                        return at
                elif fourcc == b"avih":
                    return body
                pos = body + size + (size & 1)   # word alignment
            return -1

        # the RIFF size field counts from offset 8 (it INCLUDES the
        # 'AVI ' form type), so declared content ends at 8 + size
        at = find_avih(12, min(len(data),
                               8 + int.from_bytes(data[4:8],
                                                  "little")),
                       [0], 0)
        if at < 0 or at + 40 > len(data):
            raise UnsupportedFormat("AVI without an avih header")

        def u(off):
            return int.from_bytes(data[at + off:at + off + 4],
                                  "little")

        uspf, frames, streams = u(0), u(16), u(24)
        width, height = u(32), u(36)
        return {"width": width, "height": height,
                "n_frames": frames, "us_per_frame": uspf,
                "n_streams": streams,
                "duration_s": frames * uspf / 1e6}
    except UnsupportedFormat:
        raise
    except Exception as exc:
        raise UnsupportedFormat(
            f"malformed AVI stream: {exc}") from exc


def make_avi(width: int = 320, height: int = 240,
             n_frames: int = 100, fps: int = 25,
             n_streams: int = 1) -> bytes:
    """Minimal RIFF AVI: LIST hdrl with one avih chunk."""
    avih = bytearray(56)
    avih[0:4] = (10 ** 6 // fps).to_bytes(4, "little")
    avih[16:20] = n_frames.to_bytes(4, "little")
    avih[24:28] = n_streams.to_bytes(4, "little")
    avih[32:36] = width.to_bytes(4, "little")
    avih[36:40] = height.to_bytes(4, "little")
    hdrl = b"hdrl" + b"avih" + (56).to_bytes(4, "little") + avih
    lst = b"LIST" + len(hdrl).to_bytes(4, "little") + hdrl
    riff = b"AVI " + lst
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def make_heif(width: int = 1024, height: int = 768,
              brand: bytes = b"heic") -> bytes:
    """Minimal HEIF/AVIF shell: ftyp + meta(iprp(ipco(ispe))) — all
    the metadata walker reads; no coded image payload."""
    def box(btype: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + btype + payload

    ispe = box(b"ispe", b"\x00" * 4
               + width.to_bytes(4, "big")
               + height.to_bytes(4, "big"))
    meta = box(b"meta", b"\x00" * 4
               + box(b"iprp", box(b"ipco", ispe)))
    ftyp = box(b"ftyp", brand + (0).to_bytes(4, "big") + b"mif1")
    return ftyp + meta


# ------------------------------------------------------- EBML (MKV/WebM)

EBML_MAX_ELEMENTS = 4096      # elements visited per stream
EBML_MAX_DEPTH = 8

_EBML_MAGIC = b"\x1aE\xdf\xa3"
# master elements the walker descends into (IDs include their
# class-marker bits, as stored)
_EBML_MASTERS = {0x1A45DFA3, 0x18538067, 0x1549A966, 0x1654AE6B,
                 0xAE, 0xE0, 0xE1}


def _ebml_vint(data: bytes, pos: int,
               keep_marker: bool) -> tuple[int, int, bool]:
    """(value, length, is_unknown): EBML variable-length integer.
    IDs keep their marker bits (matching the spec's ID notation);
    sizes strip them; all-ones value bits mean 'unknown size'."""
    if pos >= len(data):
        raise UnsupportedFormat("truncated EBML element")
    first = data[pos]
    for ln in range(1, 9):
        if first & (0x100 >> ln):
            if pos + ln > len(data):
                raise UnsupportedFormat("truncated EBML varint")
            raw = int.from_bytes(data[pos:pos + ln], "big")
            if keep_marker:
                return raw, ln, False
            val = raw & ((1 << (7 * ln)) - 1)
            return val, ln, val == (1 << (7 * ln)) - 1
    raise UnsupportedFormat("invalid EBML varint lead byte")


def _ebml_walk(data: bytes, start: int, end: int, depth: int,
               state: dict, meta: dict, track: dict | None) -> None:
    pos = start
    while pos < end:
        state["n"] += 1
        if state["n"] > EBML_MAX_ELEMENTS:
            raise UnsupportedFormat(
                f"EBML stream with more than {EBML_MAX_ELEMENTS} "
                "elements")
        eid, idln, _ = _ebml_vint(data, pos, keep_marker=True)
        size, szln, unknown = _ebml_vint(data, pos + idln,
                                         keep_marker=False)
        body = pos + idln + szln
        bend = end if unknown else body + size
        if bend > end:
            raise UnsupportedFormat("EBML element overruns its parent")
        if eid in _EBML_MASTERS:
            if depth >= EBML_MAX_DEPTH:
                raise UnsupportedFormat("EBML nesting too deep")
            child = {"type": 0, "codec": None, "width": 0,
                     "height": 0, "rate": 0.0, "channels": 0} \
                if eid == 0xAE else track
            _ebml_walk(data, body, bend, depth + 1, state, meta,
                       child)
            if eid == 0xAE:
                if child["type"] == 1:
                    meta["n_video_tracks"] += 1
                    if meta["n_video_tracks"] == 1:
                        meta["width"] = child["width"]
                        meta["height"] = child["height"]
                        meta["video_codec"] = child["codec"]
                elif child["type"] == 2:
                    meta["n_audio_tracks"] += 1
                    if meta["n_audio_tracks"] == 1:
                        meta["audio_codec"] = child["codec"]
                        meta["rate"] = child["rate"]
                        meta["channels"] = child["channels"]
        else:
            raw = data[body:bend]
            if eid == 0x4282:                       # DocType
                meta["doctype"] = raw.decode("latin-1").rstrip("\x00")
            elif eid == 0x2AD7B1:                   # TimestampScale
                meta["timescale_ns"] = int.from_bytes(raw[:8], "big")
            elif eid == 0x4489:                     # Duration (float)
                import struct
                if len(raw) == 4:
                    meta["_dur"] = struct.unpack(">f", raw)[0]
                elif len(raw) == 8:
                    meta["_dur"] = struct.unpack(">d", raw)[0]
            elif track is not None:
                if eid == 0x83:                     # TrackType
                    track["type"] = int.from_bytes(raw, "big")
                elif eid == 0x86:                   # CodecID
                    track["codec"] = raw.decode("latin-1") \
                        .rstrip("\x00")
                elif eid == 0xB0:
                    track["width"] = int.from_bytes(raw[:8], "big")
                elif eid == 0xBA:
                    track["height"] = int.from_bytes(raw[:8], "big")
                elif eid == 0xB5:                   # SamplingFrequency
                    import struct
                    if len(raw) == 4:
                        track["rate"] = struct.unpack(">f", raw)[0]
                    elif len(raw) == 8:
                        track["rate"] = struct.unpack(">d", raw)[0]
                elif eid == 0x9F:
                    track["channels"] = int.from_bytes(raw, "big")
        pos = bend


def mkv_meta(data: bytes) -> dict:
    """Matroska/WebM metadata (public EBML + Matroska element specs):
    ``doctype``, ``duration_s`` (Info Duration × TimestampScale),
    first video track's ``width``/``height``/``video_codec``, first
    audio track's ``rate``/``channels``/``audio_codec``, and track
    counts. Element walk is count- and depth-capped; coded block
    payload decode is out of scope (the ``-dims`` tier contract)."""
    try:
        if data[:4] != _EBML_MAGIC:
            raise UnsupportedFormat("not an EBML stream")
        meta = {"doctype": "", "timescale_ns": 1_000_000, "_dur": 0.0,
                "width": 0, "height": 0, "n_video_tracks": 0,
                "n_audio_tracks": 0, "video_codec": None,
                "audio_codec": None, "rate": 0.0, "channels": 0}
        _ebml_walk(data, 0, len(data), 0, {"n": 0}, meta, None)
        if not meta["doctype"]:
            raise UnsupportedFormat("EBML stream without a DocType")
        import math
        dur = meta.pop("_dur") * meta["timescale_ns"] / 1e9
        # a crafted Duration float of inf/NaN (or negative) must
        # not escape as OverflowError/ValueError from a downstream
        # int(round(...)) — degrade to 0, keep the dims (review r14b)
        meta["duration_s"] = dur if (math.isfinite(dur)
                                     and dur >= 0) else 0.0
        return meta
    except UnsupportedFormat:
        raise
    except Exception as exc:
        raise UnsupportedFormat(
            f"malformed EBML stream: {exc}") from exc


def _eb(eid: int, payload: bytes) -> bytes:
    """Encode one EBML element (test-side): stored-form id + minimal
    size varint + payload."""
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    for ln in range(1, 9):
        if len(payload) < (1 << (7 * ln)) - 1:
            size = (1 << (7 * ln)) | len(payload)
            return idb + size.to_bytes(ln, "big") + payload
    raise ValueError("payload too large")


def make_mkv(doctype: str = "matroska", width: int = 0,
             height: int = 0, duration_s: float = 0.0,
             video_codec: str = "V_VP9",
             audio_rate: float = 0.0, audio_channels: int = 0,
             audio_codec: str = "A_OPUS") -> bytes:
    """Minimal Matroska/WebM stream: EBML(DocType) +
    Segment(Info(TimestampScale, Duration), Tracks(...))."""
    import struct
    header = _eb(0x1A45DFA3, _eb(0x4282, doctype.encode()))
    scale = 1_000_000
    info = _eb(0x1549A966,
               _eb(0x2AD7B1, scale.to_bytes(3, "big"))
               + _eb(0x4489, struct.pack(
                   ">d", duration_s * 1e9 / scale)))
    tracks = b""
    if width > 0:
        tracks += _eb(0xAE, _eb(0x83, b"\x01")
                      + _eb(0x86, video_codec.encode())
                      + _eb(0xE0, _eb(0xB0, width.to_bytes(2, "big"))
                            + _eb(0xBA, height.to_bytes(2, "big"))))
    if audio_rate > 0:
        tracks += _eb(0xAE, _eb(0x83, b"\x02")
                      + _eb(0x86, audio_codec.encode())
                      + _eb(0xE1,
                            _eb(0xB5, struct.pack(">f", audio_rate))
                            + _eb(0x9F,
                                  bytes([audio_channels]))))
    seg = _eb(0x18538067, info + _eb(0x1654AE6B, tracks))
    return header + seg


# ------------------------------------------- documents & archives

TAR_MAX_MEMBERS = 4096        # member headers walked per archive


def pdf_meta(data: bytes) -> dict:
    """PDF header metadata: ``version`` ("1.7"...) and ``pages_est``
    — a whole-payload count of `/Type/Page` object markers (both
    spacings, `/Pages` nodes excluded). A heuristic, not an xref
    parse: object streams (compressed page trees) undercount, which
    is documented and acceptable for data-card attribution — the
    point is that a crawl bucket's dominant DOCUMENT class stops
    reporting `unknown`."""
    try:
        if data[:5] != b"%PDF-":
            raise UnsupportedFormat("not a PDF payload")
        version = data[5:8].decode("latin-1")
        if len(version) != 3 or version[1] != "." \
                or not (version[0].isdigit()
                        and version[2].isdigit()):
            raise UnsupportedFormat("malformed PDF version header")
        pages = 0
        # a page token must END at a PDF delimiter (ISO 32000-1
        # §7.2.2: whitespace or ()<>[]{}/%) — excluding only a
        # trailing 's' counted '/Type /PageLabel' and any other
        # '/Type /Page<suffix>' name as a page (ADVICE r14)
        for pat in (b"/Type /Page", b"/Type/Page"):
            at = -1
            while True:
                at = data.find(pat, at + 1)
                if at < 0:
                    break
                nxt = data[at + len(pat):at + len(pat) + 1]
                if nxt in (b"", b"\x00", b"\t", b"\n", b"\f", b"\r",
                           b" ", b"(", b")", b"<", b">", b"[", b"]",
                           b"{", b"}", b"/", b"%"):
                    pages += 1
        return {"version": version, "pages_est": pages}
    except UnsupportedFormat:
        raise
    except Exception as exc:
        raise UnsupportedFormat(f"malformed PDF payload: {exc}") \
            from exc


def zip_meta(data: bytes) -> dict:
    """ZIP end-of-central-directory metadata: ``n_members``,
    ``central_dir_bytes``. EOCD is searched from the tail (the spec
    allows a trailing comment ≤ 64 KiB). When the 16/32-bit fields
    carry the ZIP64 sentinels (0xFFFF / 0xFFFFFFFF — APPNOTE §4.4.1.4),
    the real values are read from the ZIP64 EOCD record via the
    locator that immediately precedes the EOCD; a sentinel with no
    reachable ZIP64 record refuses typed rather than reporting
    exactly 65535 members as if it were data (ADVICE r14)."""
    try:
        floor_at = max(0, len(data) - (1 << 16) - 22)
        at = data.rfind(b"PK\x05\x06", floor_at)
        if at < 0 or at + 22 > len(data):
            raise UnsupportedFormat("ZIP without an EOCD record")
        n = int.from_bytes(data[at + 10:at + 12], "little")
        cd = int.from_bytes(data[at + 12:at + 16], "little")
        if n == 0xFFFF or cd == 0xFFFFFFFF:
            loc_at = at - 20               # fixed-size ZIP64 locator
            if loc_at < 0 or data[loc_at:loc_at + 4] != b"PK\x06\x07":
                raise UnsupportedFormat(
                    "ZIP64 sentinel without an EOCD locator")
            z64 = int.from_bytes(data[loc_at + 8:loc_at + 16],
                                 "little")
            if z64 + 56 > len(data) \
                    or data[z64:z64 + 4] != b"PK\x06\x06":
                raise UnsupportedFormat(
                    "ZIP64 EOCD record out of reach")
            # APPNOTE §4.3.14: total entries at +32, cd size at +40
            n = int.from_bytes(data[z64 + 32:z64 + 40], "little")
            cd = int.from_bytes(data[z64 + 40:z64 + 48], "little")
        return {"n_members": n, "central_dir_bytes": cd}
    except UnsupportedFormat:
        raise
    except Exception as exc:
        raise UnsupportedFormat(f"malformed ZIP payload: {exc}") \
            from exc


def gzip_meta(data: bytes) -> dict:
    """gzip (RFC 1952) metadata: ``method``, ``mtime``, ``name``
    (FNAME field when present), ``isize`` (uncompressed size mod
    2³², from the trailer)."""
    try:
        if data[:2] != b"\x1f\x8b" or len(data) < 18:
            raise UnsupportedFormat("not a gzip payload")
        method, flags = data[2], data[3]
        mtime = int.from_bytes(data[4:8], "little")
        pos = 10
        if flags & 0x04:                   # FEXTRA
            xlen = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2 + xlen
        name = None
        if flags & 0x08:                   # FNAME, zero-terminated
            end = data.index(b"\x00", pos)
            name = data[pos:end].decode("latin-1")
            pos = end + 1
        isize = int.from_bytes(data[-4:], "little")
        return {"method": method, "mtime": mtime, "name": name,
                "isize": isize}
    except UnsupportedFormat:
        raise
    except Exception as exc:
        raise UnsupportedFormat(f"malformed gzip payload: {exc}") \
            from exc


def tar_header_ok(data: bytes) -> bool:
    """Validate the FIRST ustar header's checksum (sum of the 512
    header bytes with the checksum field read as spaces) — the
    discriminator that keeps `sniff` from classifying arbitrary text
    that happens to contain 'ustar' at offset 257 as an archive (a
    false positive would silently change the oracle-checked decode
    attribution of a text corpus)."""
    if len(data) < 512 or data[257:262] != b"ustar":
        return False
    block = data[:512]
    try:
        want = int(block[148:156].split(b"\x00")[0].strip() or b"-1",
                   8)
    except ValueError:
        return False
    got = sum(block) - sum(block[148:156]) + 8 * ord(" ")
    return got == want


def tar_meta(data: bytes) -> dict:
    """POSIX ustar metadata: ``n_members``, ``total_bytes`` (sum of
    member sizes). 512-byte header walk, member-count capped."""
    try:
        if not tar_header_ok(data):
            raise UnsupportedFormat("not a ustar archive")
        pos, members, total = 0, 0, 0
        while pos + 512 <= len(data):
            block = data[pos:pos + 512]
            if block == b"\x00" * 512:     # end-of-archive marker
                break
            members += 1
            if members > TAR_MAX_MEMBERS:
                raise UnsupportedFormat(
                    f"tar with more than {TAR_MAX_MEMBERS} members")
            size_f = block[124:136].split(b"\x00")[0].strip() or b"0"
            size = int(size_f, 8)
            total += size
            pos += 512 + ((size + 511) // 512) * 512
        return {"n_members": members, "total_bytes": total}
    except UnsupportedFormat:
        raise
    except Exception as exc:
        raise UnsupportedFormat(f"malformed tar archive: {exc}") \
            from exc


# ------------------------------------------------- PDF text extraction

PDF_MAX_STREAMS = 512         # stream objects walked per document
PDF_MAX_TEXT = 1 << 20        # extracted-text character cap
PDF_TJ_SPACE = -180           # TJ kerning (thousandths of em) that
                              # reads as a word gap, like real
                              # extractors' default


def _pdf_literal(buf: bytes, i: int) -> tuple[str, int]:
    """Parse the literal string starting at ``buf[i] == '('``
    (ISO 32000-1 §7.3.4.2): balanced unescaped parens, \\n \\r \\t
    \\b \\f \\( \\) \\\\ escapes, 1-3 digit octal escapes, and
    backslash-EOL line continuations. Returns (text, next_index);
    bytes decode as Latin-1 (the simple-font tier — see pdf_text)."""
    out = bytearray()
    depth, i = 1, i + 1
    n = len(buf)
    while i < n and depth > 0:
        c = buf[i]
        if c == 0x5C:                      # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e in b"nrtbf":
                out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\f"}[e]
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:        # octal, up to 3 digits
                oct_d, k = 0, 0
                while k < 3 and i < n and 0x30 <= buf[i] <= 0x37:
                    oct_d = oct_d * 8 + (buf[i] - 0x30)
                    i += 1
                    k += 1
                out.append(oct_d & 0xFF)
            elif e in b"\r\n":             # line continuation
                i += 1
                if e == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
            else:                          # §7.3.4.2: ignore the \
                out.append(e)
                i += 1
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
        out.append(c)
        i += 1
    return out.decode("latin-1"), i


def _pdf_hex_string(buf: bytes, i: int) -> tuple[str, int]:
    """Parse the hex string at ``buf[i] == '<'`` (§7.3.4.3); an odd
    final digit is padded with 0 per spec."""
    j = buf.find(b">", i + 1)
    if j < 0:
        return "", len(buf)
    digits = bytes(ch for ch in buf[i + 1:j]
                   if ch in b"0123456789abcdefABCDEF")
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")).decode("latin-1"), \
        j + 1


def _pdf_stream_text(buf: bytes, parts: list) -> None:
    """Scan ONE decoded content stream for show-text operators
    (§9.4.3: Tj, ', \", TJ) and line-move operators (Td/TD/T*, and
    ET as a block break → newline markers). A tiny operand-stack
    walk — strings and arrays are tracked, every other token is
    skipped — so malformed streams degrade to fewer strings, never
    an exception."""
    i, n = 0, len(buf)
    last: str | None = None
    arr: list | None = None
    closed: list | None = None
    while i < n:
        c = buf[i]
        if c == 0x28:                                  # ( literal
            s, i = _pdf_literal(buf, i)
            if arr is not None:
                arr.append(s)
            else:
                last = s
            continue
        if c == 0x3C:
            if buf[i + 1:i + 2] == b"<":               # << dict
                i += 2
                continue
            s, i = _pdf_hex_string(buf, i)             # < hex
            if arr is not None:
                arr.append(s)
            else:
                last = s
            continue
        if c == 0x5B:                                  # [ array
            arr = []
            closed = None
            i += 1
            continue
        if c == 0x5D:                                  # ] end array
            # the closed array is an OPERAND awaiting its operator:
            # only a following TJ consumes it — any other operator
            # (dash patterns '[3 3] 0 d', destinations, ...) must
            # discard it, never divert later strings (review r15)
            closed = arr
            arr = None
            i += 1
            continue
        if c == 0x25:                                  # % comment
            j = buf.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        if (arr is not None
                and (0x30 <= c <= 0x39 or c in b"+-.")):
            j = i + 1                                  # TJ kerning
            while j < n and (0x30 <= buf[j] <= 0x39
                             or buf[j] in b"+-.eE"):
                j += 1
            try:
                if float(buf[i:j]) <= PDF_TJ_SPACE:
                    arr.append(" ")
            except ValueError:
                pass
            i = j
            continue
        if (0x41 <= c <= 0x5A or 0x61 <= c <= 0x7A
                or c in b"'\"*"):                      # operator
            j = i + 1
            # bytes literals have no ranges — a "0-9" spelling would
            # be the 3-byte set {0, -, 9} (ADVICE r15); no standard
            # operator carries a digit, so only ' " * continue tokens
            while j < n and (0x41 <= buf[j] <= 0x5A
                             or 0x61 <= buf[j] <= 0x7A
                             or buf[j] in b"'\"*"):
                j += 1
            op = buf[i:j]
            if op == b"Tj" and last is not None:
                parts.append(last)
            elif op in (b"'", b'"') and last is not None:
                parts.append("\n")
                parts.append(last)
            elif op == b"TJ" and closed is not None:
                parts.append("".join(closed))
            elif op in (b"Td", b"TD", b"T*", b"ET"):
                parts.append("\n")
            # every operator consumes its operands: a pending array
            # or string never survives past the next operator token —
            # clearing `last` only on show ops let a malformed
            # stream like `(A) Tj (LEAK) ... Tm Tj` re-show the
            # stale operand (ADVICE r15); drop, never re-show
            closed = None
            last = None
            i = j
            continue
        i += 1


def pdf_text(data: bytes) -> dict:
    """Text extraction from PDF content streams — the document tier
    above `pdf_meta` (version/pages): walks every ``stream`` object,
    inflates FlateDecode bodies (zlib) or takes unfiltered bodies
    verbatim, and reads the show-text operators (Tj/'/\"/TJ — ISO
    32000-1 §9.4.3) with Td/TD/T*/ET as line breaks. Returns
    ``text``, ``n_streams`` (decoded), ``n_skipped`` (undecodable —
    other filters, broken zlib, or past the walk cap).

    Honest-tier contract (same stance as the codec family):
    * ``/Encrypt`` in the trailer → typed `UnsupportedFormat`
      (strings are RC4/AES-encrypted; silent garbage is worse
      than a refusal).
    * Exotic filters (DCT/LZW/JBIG2/Crypt/filter ARRAYS) are
      skipped and COUNTED, never guessed at.
    * String bytes decode as Latin-1 — exact for Standard/WinAnsi
      simple fonts, garbage-in-garbage-out for CID/Type0 subsets
      (a font-table parse is out of pure-python scope; callers see
      the skip/stream counts and can gate on them)."""
    try:
        if data[:5] != b"%PDF-":
            raise UnsupportedFormat("not a PDF payload")
        # /Encrypt lives in the trailer dictionary (or the xref
        # stream dict, both at the tail) — scope the refusal there so
        # a page whose VISIBLE TEXT mentions '/Encrypt' is not
        # falsely refused (review r15); a linearized file's first-
        # page trailer copy is still within rfind's reach
        t_at = data.rfind(b"trailer")
        tail = data[t_at:] if t_at >= 0 else data[-4096:]
        if b"/Encrypt" in tail:
            raise UnsupportedFormat(
                "encrypted PDF — strings are not extractable")
        parts: list[str] = []
        n_streams = n_skipped = 0
        pos = 0
        while n_streams + n_skipped < PDF_MAX_STREAMS:
            at = data.find(b"stream", pos)
            if at < 0:
                break
            if data[max(0, at - 3):at] == b"end":
                pos = at + 6               # the 'stream' inside an
                continue                   # unconsumed 'endstream'
            head = data[max(0, at - 512):at]
            # bound the dict lookback to THIS object: without the
            # cut, rfind('/Filter') could pick up the PREVIOUS
            # object's filter when the current dict has none and
            # misclassify an unfiltered stream (review r15)
            for tok in (b"endstream", b"obj"):
                cut = head.rfind(tok)
                if cut >= 0:
                    head = head[cut + len(tok):]
            body_at = at + 6
            if data[body_at:body_at + 2] == b"\r\n":
                body_at += 2
            elif data[body_at:body_at + 1] in (b"\n", b"\r"):
                body_at += 1
            end = data.find(b"endstream", body_at)
            if end < 0:
                break
            body = data[body_at:end]
            pos = end + 9
            filt = None
            f_at = head.rfind(b"/Filter")
            if f_at >= 0:
                filt = head[f_at + 7:f_at + 64].strip()
            if filt is None:
                decoded = body
            elif filt.startswith(b"/FlateDecode"):
                import zlib
                try:
                    decoded = zlib.decompress(body)
                except Exception:
                    n_skipped += 1
                    continue
            else:                       # arrays / exotic filters
                n_skipped += 1
                continue
            if b"BT" not in decoded and b"Tj" not in decoded \
                    and b"TJ" not in decoded:
                continue                # image/xref stream, no text
            n_streams += 1
            _pdf_stream_text(decoded, parts)
            if sum(len(p) for p in parts) > PDF_MAX_TEXT:
                break
        import re as _re
        text = "".join(parts)[:PDF_MAX_TEXT]
        text = _re.sub(r"[ \t]*\n[ \t]*", "\n", text)
        text = _re.sub(r"\n{2,}", "\n", text).strip("\n")
        return {"text": text, "n_streams": n_streams,
                "n_skipped": n_skipped}
    except UnsupportedFormat:
        raise
    except Exception as exc:
        raise UnsupportedFormat(f"malformed PDF payload: {exc}") \
            from exc


def make_pdf(pages: list[str], compress: bool = False,
             encrypted: bool = False, exotic_filter: bool = False) \
        -> bytes:
    """Minimal valid PDF: catalog → page tree → one page + one
    content stream per entry, each showing its text via Tj/TJ.
    ``compress`` emits FlateDecode streams (zlib), ``encrypted``
    plants an /Encrypt trailer entry, ``exotic_filter`` tags the
    streams /DCTDecode — the three tiers pdf_text distinguishes."""
    import zlib
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(len(pages)))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] "
                f"/Count {len(pages)} >>".encode())
    for i, text in enumerate(pages):
        objs.append(f"<< /Type /Page /Parent 2 0 R "
                    f"/Contents {4 + 2 * i} 0 R >>".encode())
        safe = (text.replace("\\", r"\\").replace("(", r"\(")
                .replace(")", r"\)"))
        stream = (f"BT /F1 12 Tf 72 720 Td ({safe}) Tj ET"
                  .encode("latin-1"))
        if compress or exotic_filter:
            body = zlib.compress(stream) if compress else stream
            name = "/FlateDecode" if compress else "/DCTDecode"
            objs.append(f"<< /Length {len(body)} /Filter {name} >>"
                        .encode() + b"\nstream\n" + body
                        + b"\nendstream")
        else:
            objs.append(f"<< /Length {len(stream)} >>".encode()
                        + b"\nstream\n" + stream + b"\nendstream")
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for k, payload in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{k} 0 obj\n".encode() + payload + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    trailer = f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R"
    if encrypted:
        trailer += " /Encrypt 9 0 R"
    out += (trailer + " >>\n").encode()
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)
