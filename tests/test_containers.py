"""MP4/MOV (ISO-BMFF), MP3, and FLAC metadata tiers.

Round-13 verdict #2: these are the dominant real-world A/V container
families and previously landed `unknown` → `unknown-stub`, leaving
corpus profiles blind to a web-crawl bucket's biggest media classes.
The walkers are header-only (`image_dims` pattern): duration, track
dims, rate, channels — compressed A/V sample decode stays refused.

Streams are built by the in-repo encoders (no binary fixtures) plus
hand-crafted byte-literals for the variants the encoders don't emit
(v1 boxes, largesize, crafted bombs)."""

from __future__ import annotations

import pytest

from big_data_bowl___2023_spark.multimodal import codecs, containers
from big_data_bowl___2023_spark.multimodal.binary_ops import (
    _decode_one,
    decode_media,
)


# ------------------------------------------------------------ ISO-BMFF

def test_mp4_meta_video_round_trip():
    data = containers.make_mp4(12.5, 1000, 640, 360, audio=True)
    assert codecs.sniff(data) == "mp4"
    m = containers.mp4_meta(data)
    assert m["brand"] == "isom"
    assert m["timescale"] == 1000
    assert m["duration_s"] == pytest.approx(12.5)
    assert (m["width"], m["height"]) == (640, 360)
    assert m["n_video_tracks"] == 1 and m["n_audio_tracks"] == 1
    assert m["n_tracks"] == 2


def test_mp4_meta_audio_only_m4a():
    data = containers.make_mp4(3.0, 44100, audio=True, brand=b"M4A ")
    m = containers.mp4_meta(data)
    assert m["brand"] == "M4A"
    assert m["n_video_tracks"] == 0 and m["n_audio_tracks"] == 1
    assert m["width"] == 0 and m["height"] == 0
    assert m["duration_s"] == pytest.approx(3.0)


def test_mp4_meta_stts_frame_count_and_codecs():
    """stts gives the TRUE video frame count (the y4m convention for
    the decode tier) and stsd the codec fourcc per track."""
    data = containers.make_mp4(10.0, 30, 640, 360, audio=True,
                               n_frames=300, video_codec=b"avc1",
                               audio_codec=b"mp4a")
    m = containers.mp4_meta(data)
    assert m["n_frames"] == 300
    assert m["video_codec"] == "avc1"
    assert m["audio_codec"] == "mp4a"
    # decode tier prefers the real frame count over whole seconds
    assert _decode_one(data, "video") == (640, 360, 300, "mp4-dims")
    # without stts the tier falls back to whole-second duration
    plain = containers.make_mp4(10.0, 30, 640, 360)
    assert containers.mp4_meta(plain)["n_frames"] == 0
    assert _decode_one(plain, "video") == (640, 360, 10, "mp4-dims")


def test_mp4_qt_data_handler_does_not_clobber(review_r14=True):
    """QuickTime-style .mov streams carry a SECOND hdlr (dhlr/'url ')
    inside minf; it must not overwrite the mdia-level 'vide'
    classification (review r14: the track silently vanished from the
    metadata, and the 0x0 dims then crashed the resize stub)."""
    data = containers.make_mp4(4.0, 600, 320, 240, brand=b"qt  ",
                               n_frames=120, video_codec=b"avc1",
                               qt_data_handler=True)
    m = containers.mp4_meta(data)
    assert m["n_video_tracks"] == 1
    assert (m["width"], m["height"]) == (320, 240)
    assert m["n_frames"] == 120


def test_dimsless_video_mp4_survives_resize(spark):
    """An audio-only/dims-less ISO-BMFF whose brand is not M4A/M4B
    classifies as video; its 0x0 metadata dims must not escape as a
    ZeroDivisionError from the resize stub (review r14 — the
    one-corrupt-blob contract applies to legitimate-but-dimsless
    payloads too)."""
    from big_data_bowl___2023_spark.multimodal.binary_ops import (
        _resize_one,
        media_from_binary_files,
        resize_media,
    )
    data = containers.make_mp4(5.0, 44100, audio=True,
                               brand=b"isom")
    assert _decode_one(data, "video")[3] == "mp4-dims"
    w, h, payload = _resize_one(data, "video", 32)
    assert w >= 1 and h >= 1 and len(payload) == w * h
    files = spark.createDataFrame(
        [("x.bin", bytearray(data), len(data))],
        "path string, content binary, length long")
    media = media_from_binary_files(files)
    assert media.collect()[0]["modality"] == "video"
    row = resize_media(media, max_side=32).collect()[0]
    assert row["width"] >= 1 and row["height"] >= 1


def test_mp4_meta_v1_and_largesize():
    """Version-1 mvhd (64-bit duration) and a largesize (size==1)
    box header — hand-crafted, the encoder emits neither."""
    ts, dur = 90000, 90000 * 7
    mvhd_body = (b"\x01\x00\x00\x00" + b"\x00" * 16
                 + ts.to_bytes(4, "big") + dur.to_bytes(8, "big")
                 + b"\x00" * 80)
    mvhd = (8 + len(mvhd_body)).to_bytes(4, "big") + b"mvhd" \
        + mvhd_body
    # moov wrapped in a largesize header: size field 1 + 8-byte size
    moov = (1).to_bytes(4, "big") + b"moov" \
        + (16 + len(mvhd)).to_bytes(8, "big") + mvhd
    ftyp = (16).to_bytes(4, "big") + b"ftyp" + b"isom" + b"\x00" * 4
    m = containers.mp4_meta(ftyp + moov)
    assert m["timescale"] == ts
    assert m["duration_s"] == pytest.approx(7.0)


def test_mp4_crafted_streams_refuse_typed():
    good = containers.make_mp4(1.0, 1000, 64, 64)
    # box claiming to overrun its parent
    bad = bytearray(good)
    at = good.index(b"moov") - 4
    bad[at:at + 4] = (len(good) * 2).to_bytes(4, "big")
    with pytest.raises(codecs.UnsupportedFormat, match="overruns"):
        containers.mp4_meta(bytes(bad))
    # no moov/mvhd at all
    ftyp = (16).to_bytes(4, "big") + b"ftyp" + b"isom" + b"\x00" * 4
    with pytest.raises(codecs.UnsupportedFormat, match="mvhd"):
        containers.mp4_meta(ftyp)
    # box-count bomb: thousands of tiny free boxes
    free = (8).to_bytes(4, "big") + b"free"
    with pytest.raises(codecs.UnsupportedFormat, match="boxes"):
        containers.mp4_meta(ftyp + free * (containers.MP4_MAX_BOXES
                                           + 8))
    # nesting bomb: trak-in-trak past the depth cap
    inner = b""
    for _ in range(containers.MP4_MAX_DEPTH + 2):
        inner = (8 + len(inner)).to_bytes(4, "big") + b"trak" + inner
    mvhd = containers.make_mp4(1.0, 1000)[16:]   # reuse moov(mvhd)
    deep = (8 + len(inner)).to_bytes(4, "big") + b"moov" + inner
    with pytest.raises(codecs.UnsupportedFormat, match="deep"):
        containers.mp4_meta(ftyp + deep)
    assert containers.mp4_meta(good)["width"] == 64   # still clean


# ----------------------------------------------------------- MPEG audio

def test_mp3_meta_xing_and_id3():
    data = containers.make_mp3(8, xing=True, id3_bytes=64)
    assert codecs.sniff(data) == "mp3"
    m = containers.mp3_meta(data)
    assert m["rate"] == 44100 and m["channels"] == 2
    assert m["n_frames"] == 8 and m["vbr"] is True
    assert m["duration_s"] == pytest.approx(8 * 1152 / 44100)


def test_mp3_meta_cbr_estimate_and_mono():
    data = containers.make_mp3(6, xing=False)
    assert codecs.sniff(data) == "mp3"        # raw sync, no ID3
    m = containers.mp3_meta(data)
    assert m["vbr"] is False
    assert m["n_frames"] == 6                 # bytes / frame_size
    assert m["duration_s"] == pytest.approx(len(data) * 8 / 128000)
    mono = containers.make_mp3(4, xing=True, mono=True)
    mm = containers.mp3_meta(mono)
    assert mm["channels"] == 1 and mm["n_frames"] == 4


def test_mp3_crafted_streams_refuse_typed():
    # ID3 shell with no audio frames in the scan window
    shell = b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\x00" * 256
    with pytest.raises(codecs.UnsupportedFormat, match="frame"):
        containers.mp3_meta(shell)
    # free-format (bitrate index 0) refuses rather than guessing
    free = bytes([0xFF, 0xFB, 0x00, 0x40]) + b"\x00" * 64
    assert containers._mp3_frame(free, 0) is None
    assert codecs.sniff(free) is None
    with pytest.raises(codecs.UnsupportedFormat):
        containers.mp3_meta(free)


# ---------------------------------------------------------------- FLAC

def test_flac_meta_round_trip():
    data = containers.make_flac(441000, 44100, 2, 16)
    assert codecs.sniff(data) == "flac"
    m = containers.flac_meta(data)
    assert m["rate"] == 44100 and m["channels"] == 2
    assert m["bits_per_sample"] == 16
    assert m["total_samples"] == 441000
    assert m["duration_s"] == pytest.approx(10.0)
    # the 36-bit total-samples field (> 2^32)
    big = containers.make_flac((1 << 35) + 7, 96000, 8, 24)
    mb = containers.flac_meta(big)
    assert mb["total_samples"] == (1 << 35) + 7
    assert mb["channels"] == 8 and mb["bits_per_sample"] == 24


def test_flac_crafted_streams_refuse_typed():
    good = containers.make_flac()
    with pytest.raises(codecs.UnsupportedFormat, match="STREAMINFO"):
        # first block is not STREAMINFO
        containers.flac_meta(b"fLaC" + bytes([0x84])
                             + (34).to_bytes(3, "big") + b"\x00" * 34)
    with pytest.raises(codecs.UnsupportedFormat, match="truncated"):
        containers.flac_meta(good[:20])
    with pytest.raises(codecs.UnsupportedFormat, match="zero rate"):
        containers.flac_meta(containers.make_flac(0, 0, 1, 16))
    # block-count bomb: never-last tiny blocks
    bomb = bytearray(good[:4])
    block = bytes([0x02]) + (0).to_bytes(3, "big")   # non-last, empty
    head = bytes([0x00]) + (34).to_bytes(3, "big") + good[8:42]
    bomb += bytes([head[0] & 0x7F]) + head[1:]        # non-last info
    bomb += block * (containers.FLAC_MAX_BLOCKS + 8)
    with pytest.raises(codecs.UnsupportedFormat, match="blocks"):
        containers.flac_meta(bytes(bomb))


# ----------------------------------------------- decode-tier plumbing

def test_decode_one_container_tiers():
    """Tier attribution follows the wav/y4m column conventions:
    audio → (frames, rate, channels), video → (w, h, seconds)."""
    mp4 = containers.make_mp4(12.8, 1000, 640, 360)
    assert _decode_one(mp4, "video") == (640, 360, 13, "mp4-dims")
    m4a = containers.make_mp4(3.0, 44100, audio=True, brand=b"M4A ")
    assert _decode_one(m4a, "audio") == (3 * 44100, 44100, 1,
                                         "mp4-dims")
    mp3 = containers.make_mp3(8, xing=True)
    assert _decode_one(mp3, "audio") == (8, 44100, 2, "mp3-dims")
    flac = containers.make_flac(441000, 44100, 2, 16)
    assert _decode_one(flac, "audio") == (441000, 44100, 2,
                                          "flac-dims")
    # a crafted container still falls to the honest stub tier
    w, h, c, tier = _decode_one(b"fLaC" + b"\x00" * 8, "audio")
    assert tier == "stub"


def test_container_tiers_through_spark(spark):
    """End-to-end: neutral `.bin` names, modality from magic bytes
    in the bridge, tier attribution in the decode pass."""
    from big_data_bowl___2023_spark.multimodal.binary_ops import (
        media_from_binary_files,
    )
    payloads = {
        "a.bin": containers.make_mp4(5.0, 600, 320, 240),
        "b.bin": containers.make_mp4(2.0, 8000, audio=True,
                                     brand=b"M4A "),
        "c.bin": containers.make_flac(80000, 8000, 1, 16),
        "d.bin": containers.make_mp3(4, xing=True, id3_bytes=32),
        "e.mp3": containers.make_mp3(3, xing=False),   # raw sync →
        # extension rule (11-bit sync is too weak for a magic test)
    }
    files = spark.createDataFrame(
        [(k, bytearray(v), len(v)) for k, v in payloads.items()],
        "path string, content binary, length long")
    media = media_from_binary_files(files)
    mods = {r["source"]: r["modality"] for r in media.collect()}
    assert mods == {"a.bin": "video", "b.bin": "audio",
                    "c.bin": "audio", "d.bin": "audio",
                    "e.mp3": "audio"}
    dec = {r["modality"] + ":" + r["decoder"]
           for r in decode_media(media).collect()}
    assert dec == {"video:mp4-dims", "audio:mp4-dims",
                   "audio:flac-dims", "audio:mp3-dims"}


# -------------------------------------------- second wave (r14 late)

def test_tiff_dims_both_byte_orders():
    def make_tiff(bo, w, h, spp):
        import struct
        e = "<" if bo == "II" else ">"
        hdr = (b"II*\x00" if bo == "II" else b"MM\x00*") \
            + struct.pack(e + "I", 8)
        entries = [(256, 3, 1, w), (257, 4, 1, h), (277, 3, 1, spp)]
        ifd = struct.pack(e + "H", len(entries))
        for tag, typ, cnt, val in entries:
            if typ == 3:      # SHORT sits left-justified in either order
                vf = struct.pack(e + "H", val) + b"\x00\x00"
            else:
                vf = struct.pack(e + "I", val)
            ifd += struct.pack(e + "HHI", tag, typ, cnt) + vf
        return hdr + ifd + struct.pack(e + "I", 0)

    for bo in ("II", "MM"):
        data = make_tiff(bo, 640, 480, 3)
        assert codecs.sniff(data) == "tiff"
        assert codecs.image_dims(data) == (640, 480, 3)
        assert _decode_one(data, "image") == (640, 480, 3,
                                              "tiff-dims")
    # dims-less and bomb IFDs refuse typed
    import pytest as _pt
    with _pt.raises(codecs.UnsupportedFormat, match="without"):
        codecs.image_dims(b"II*\x00\x08\x00\x00\x00\x00\x00")
    bomb = b"II*\x00\x08\x00\x00\x00" + (60000).to_bytes(2, "little")
    with _pt.raises(codecs.UnsupportedFormat, match="entries"):
        codecs.image_dims(bomb)


def test_ogg_meta_vorbis_and_opus():
    v = containers.make_ogg("vorbis", 44100, 2, 441000)
    assert codecs.sniff(v) == "ogg"
    m = containers.ogg_meta(v)
    assert (m["codec"], m["rate"], m["channels"]) == ("vorbis",
                                                      44100, 2)
    assert m["total_samples"] == 441000
    assert m["duration_s"] == 10.0
    o = containers.ogg_meta(containers.make_ogg("opus", 48000, 1,
                                                480000))
    # Opus granules tick at 48 kHz regardless of input rate
    assert o["codec"] == "opus" and o["duration_s"] == 10.0
    # unknown codec id packet refuses typed
    import pytest as _pt
    theora = containers._ogg_page(0x02, 0, 0, b"\x80theora" + b"x" * 9)
    with _pt.raises(codecs.UnsupportedFormat, match="codec"):
        containers.ogg_meta(theora)


def test_avi_meta_round_trip():
    data = containers.make_avi(320, 240, 250, fps=25, n_streams=2)
    assert codecs.sniff(data) == "avi"
    m = containers.avi_meta(data)
    assert (m["width"], m["height"], m["n_frames"]) == (320, 240,
                                                        250)
    assert m["n_streams"] == 2
    assert m["duration_s"] == 10.0
    assert _decode_one(data, "video") == (320, 240, 250, "avi-dims")
    import pytest as _pt
    with _pt.raises(codecs.UnsupportedFormat, match="avih"):
        containers.avi_meta(b"RIFF\x04\x00\x00\x00AVI ")


def test_heif_avif_dims():
    h = containers.make_heif(1024, 768, brand=b"heic")
    m = containers.mp4_meta(h)
    assert (m["ispe_width"], m["ispe_height"]) == (1024, 768)
    assert _decode_one(h, "image") == (1024, 768, 3, "heif-dims")
    a = containers.make_heif(512, 512, brand=b"avif")
    assert _decode_one(a, "image") == (512, 512, 3, "avif-dims")


def test_second_wave_through_spark(spark):
    """Neutral .bin names: magic-byte modality for TIFF/Ogg/AVI/
    HEIF/AVIF, tier attribution in the decode pass."""
    from big_data_bowl___2023_spark.multimodal.binary_ops import (
        media_from_binary_files,
    )
    import struct
    tiff = (b"II*\x00" + struct.pack("<I", 8)
            + struct.pack("<H", 2)
            + struct.pack("<HHI", 256, 3, 1) + struct.pack("<H", 99)
            + b"\x00\x00"
            + struct.pack("<HHI", 257, 3, 1) + struct.pack("<H", 77)
            + b"\x00\x00" + struct.pack("<I", 0))
    payloads = {
        "a.bin": tiff,
        "b.bin": containers.make_ogg("opus", 48000, 2, 96000),
        "c.bin": containers.make_avi(160, 120, 50),
        "d.bin": containers.make_heif(64, 48, brand=b"heic"),
        "e.bin": containers.make_heif(32, 32, brand=b"avif"),
    }
    files = spark.createDataFrame(
        [(k, bytearray(v), len(v)) for k, v in payloads.items()],
        "path string, content binary, length long")
    media = media_from_binary_files(files)
    mods = {r["source"]: r["modality"] for r in media.collect()}
    assert mods == {"a.bin": "image", "b.bin": "audio",
                    "c.bin": "video", "d.bin": "image",
                    "e.bin": "image"}
    dec = {r["source"]: (r["width"], r["height"], r["n_channels"],
                         r["decoder"])
           for r in decode_media(media)
           .join(media.select("media_id", "source"), "media_id")
           .collect()}
    assert dec["a.bin"] == (99, 77, 1, "tiff-dims")
    assert dec["b.bin"] == (96000, 48000, 2, "ogg-dims")
    assert dec["c.bin"] == (160, 120, 50, "avi-dims")
    assert dec["d.bin"] == (64, 48, 3, "heif-dims")
    assert dec["e.bin"] == (32, 32, 3, "avif-dims")


def test_mkv_webm_meta_round_trip():
    d = containers.make_mkv("webm", 1920, 1080, 12.5,
                            video_codec="V_VP9",
                            audio_rate=48000.0, audio_channels=2,
                            audio_codec="A_OPUS")
    assert codecs.sniff(d) == "mkv"
    m = containers.mkv_meta(d)
    assert m["doctype"] == "webm"
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["video_codec"] == "V_VP9"
    assert m["audio_codec"] == "A_OPUS"
    assert (m["rate"], m["channels"]) == (48000.0, 2)
    assert m["duration_s"] == pytest.approx(12.5)
    # 12.5 s → 12 whole seconds (round-half-even, the mp4 fallback
    # convention)
    assert _decode_one(d, "video") == (1920, 1080, 12, "mkv-dims")
    # audio-only webm: honest 0x0 dims, still typed-clean
    a = containers.make_mkv("webm", duration_s=3.0,
                            audio_rate=44100.0, audio_channels=1)
    am = containers.mkv_meta(a)
    assert am["n_video_tracks"] == 0 and am["n_audio_tracks"] == 1
    assert _decode_one(a, "video") == (0, 0, 3, "mkv-dims")


def test_mkv_crafted_streams_refuse_typed():
    good = containers.make_mkv("matroska", 64, 48, 1.0)
    # element overrunning its parent
    with pytest.raises(codecs.UnsupportedFormat):
        containers.mkv_meta(good[:20])
    # no DocType
    with pytest.raises(codecs.UnsupportedFormat, match="DocType"):
        containers.mkv_meta(containers._eb(0x1A45DFA3, b""))
    # element-count bomb: thousands of tiny void elements
    void = containers._eb(0xEC, b"")
    bomb = (containers._eb(0x1A45DFA3,
                           containers._eb(0x4282, b"matroska"))
            + containers._eb(0x18538067,
                             void * (containers.EBML_MAX_ELEMENTS
                                     + 8)))
    with pytest.raises(codecs.UnsupportedFormat, match="elements"):
        containers.mkv_meta(bomb)
    assert containers.mkv_meta(good)["width"] == 64


# --------------------------------------------- documents & archives

def test_pdf_zip_gzip_tar_meta():
    """Walkers validated against stdlib-BUILT payloads (zipfile/
    gzip/tarfile as independent reference encoders)."""
    import gzip as _gzip
    import io
    import tarfile
    import zipfile

    pdf = (b"%PDF-1.7\n1 0 obj << /Type /Catalog >>\n"
           b"2 0 obj << /Type /Pages /Kids [3 0 R 4 0 R] >>\n"
           b"3 0 obj << /Type /Page >>\n"
           b"4 0 obj << /Type/Page >>\ntrailer\n%%EOF")
    assert codecs.sniff(pdf) == "pdf"
    m = containers.pdf_meta(pdf)
    assert m["version"] == "1.7" and m["pages_est"] == 2
    assert _decode_one(pdf, "unknown") == (2, 17, 1, "pdf-meta")
    # a PDF under a lying image extension still attributes pdf-meta
    assert _decode_one(pdf, "image") == (2, 17, 1, "pdf-meta")

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", "hello")
        z.writestr("b/c.txt", "world")
    zdata = buf.getvalue()
    assert codecs.sniff(zdata) == "zip"
    assert containers.zip_meta(zdata)["n_members"] == 2
    assert _decode_one(zdata, "unknown") == (2, 0, 1, "zip-meta")

    gz = _gzip.compress(b"x" * 1000)
    assert codecs.sniff(gz) == "gzip"
    gm = containers.gzip_meta(gz)
    assert gm["isize"] == 1000 and gm["method"] == 8
    assert _decode_one(gz, "unknown") == (1000, 0, 1, "gzip-meta")

    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as t:
        for nm in ("a", "b", "c"):
            ti = tarfile.TarInfo(nm)
            ti.size = 100
            t.addfile(ti, io.BytesIO(b"y" * 100))
    tar = tbuf.getvalue()
    assert codecs.sniff(tar) == "tar"
    tm = containers.tar_meta(tar)
    assert tm["n_members"] == 3 and tm["total_bytes"] == 300
    assert _decode_one(tar, "unknown") == (3, 0, 1, "tar-meta")


def test_tar_sniff_requires_valid_checksum():
    """Arbitrary text with 'ustar' at offset 257 must NOT classify
    as an archive — a false positive would silently change the
    oracle-checked decode attribution of a text corpus. The header
    checksum is the discriminator."""
    fake = b"x" * 257 + b"ustar" + b"x" * 300
    assert codecs.sniff(fake) is None
    assert containers.tar_header_ok(fake) is False
    w, h, c, tier = _decode_one(fake, "unknown")
    assert tier == "unknown-stub"


def test_document_archive_refusals_typed():
    with pytest.raises(codecs.UnsupportedFormat, match="version"):
        containers.pdf_meta(b"%PDF-x.y junk")
    with pytest.raises(codecs.UnsupportedFormat, match="EOCD"):
        containers.zip_meta(b"PK\x03\x04" + b"\x00" * 64)
    with pytest.raises(codecs.UnsupportedFormat):
        containers.gzip_meta(b"\x1f\x8b")
    # member-count bomb: valid first header, looping tiny members
    import io
    import tarfile
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as t:
        for i in range(containers.TAR_MAX_MEMBERS + 8):
            ti = tarfile.TarInfo(f"m{i}")
            t.addfile(ti, io.BytesIO(b""))
    with pytest.raises(codecs.UnsupportedFormat, match="members"):
        containers.tar_meta(tbuf.getvalue())


def test_media_profile_data_card(spark):
    """media_profile: one row per (modality, tier) with exact counts
    and byte totals — cross-checked against a hand rollup."""
    from big_data_bowl___2023_spark.multimodal.binary_ops import (
        media_from_binary_files,
        media_profile,
    )
    payloads = {
        "a.bin": containers.make_mp4(5.0, 600, 320, 240),
        "b.bin": containers.make_mp4(6.0, 600, 640, 480),
        "c.bin": containers.make_flac(80000, 8000, 1),
        "d.bin": (b"%PDF-1.6\n1 0 obj << /Type /Page >>\n"
                  b"trailer %%EOF"),
        "e.bin": b"\x00unclassifiable junk bytes" * 4,
    }
    files = spark.createDataFrame(
        [(k, bytearray(v), len(v)) for k, v in payloads.items()],
        "path string, content binary, length long")
    prof = {(r["modality"], r["decoder"]):
            (r["n_media"], r["total_bytes"])
            for r in media_profile(
                media_from_binary_files(files)).collect()}
    mp4_bytes = len(payloads["a.bin"]) + len(payloads["b.bin"])
    assert prof[("video", "mp4-dims")] == (2, mp4_bytes)
    assert prof[("audio", "flac-dims")] == (1, len(payloads["c.bin"]))
    assert prof[("unknown", "pdf-meta")] == (1,
                                             len(payloads["d.bin"]))
    assert prof[("unknown", "unknown-stub")] == (
        1, len(payloads["e.bin"]))
    assert len(prof) == 4


def test_review_r14b_crafted_values_stay_bounded():
    """Second review pass: crafted numeric fields must neither
    escape as untyped errors nor overflow the int32 decode columns."""
    import struct

    # MKV Duration = +inf / NaN / negative → duration degrades to 0,
    # dims survive, nothing untyped escapes int(round(...))
    for bits in (struct.pack(">d", float("inf")),
                 struct.pack(">d", float("nan")),
                 struct.pack(">d", -5.0)):
        d = containers.make_mkv("webm", 320, 240, 1.0)
        at = d.index(b"\x44\x89")             # Duration element id
        bad = d[:at + 3] + bits + d[at + 11:]
        m = containers.mkv_meta(bad)
        assert m["duration_s"] == 0.0
        assert _decode_one(bad, "video") == (320, 240, 0, "mkv-dims")

    # MKV 5-byte PixelWidth (~2^38) → capped at int32 max (built
    # with consistent parent sizes via the element encoder)
    eb = containers._eb
    trk = eb(0xAE, eb(0x83, b"\x01")
             + eb(0xE0, eb(0xB0, (1 << 38).to_bytes(5, "big"))
                  + eb(0xBA, (4).to_bytes(2, "big"))))
    huge = (eb(0x1A45DFA3, eb(0x4282, b"webm"))
            + eb(0x18538067, eb(0x1654AE6B, trk)))
    assert containers.mkv_meta(huge)["width"] == 1 << 38
    w = _decode_one(huge, "video")[0]
    assert w == 2**31 - 1

    # Ogg rate bytes FF FF FF FF → capped
    o = containers.make_ogg("vorbis", 44100, 2, 1000)
    at = o.index((44100).to_bytes(4, "little"))
    bad = o[:at] + b"\xff\xff\xff\xff" + o[at + 4:]
    assert _decode_one(bad, "audio")[1] == 2**31 - 1

    # AVI width u32 >= 2^31 → capped
    a = bytearray(containers.make_avi(320, 240, 10))
    at = bytes(a).index(b"avih") + 8 + 32
    a[at:at + 4] = (0xFFFFFFFF).to_bytes(4, "little")
    assert _decode_one(bytes(a), "video")[0] == 2**31 - 1

    # HEIF ispe dims >= 2^31 → capped
    h = bytearray(containers.make_heif(64, 48))
    at = bytes(h).index(b"ispe") + 8
    h[at:at + 4] = (0xF0000000).to_bytes(4, "big")
    assert _decode_one(bytes(h), "image")[0] == 2**31 - 1


def test_qt_meta_atom_without_fullbox_offset():
    """Classic QuickTime meta atoms carry NO version/flags — the
    walker must not misparse them (previously the first child's
    size was read 4 bytes in, refusing the whole stream and
    dropping it from mp4-dims to the stub tier, review r14b)."""
    def box(t, payload):
        return (8 + len(payload)).to_bytes(4, "big") + t + payload

    good = containers.make_mp4(4.0, 600, 320, 240)
    # QT-style meta: first child directly at body (an hdlr atom)
    qt_meta = box(b"meta", box(b"hdlr", b"\x00" * 24))
    patched = good + qt_meta[:0]              # sanity: untouched ok
    m = containers.mp4_meta(patched)
    assert m["width"] == 320
    # splice the QT meta INSIDE moov (after mvhd)
    moov_at = good.index(b"moov") - 4
    moov_size = int.from_bytes(good[moov_at:moov_at + 4], "big")
    inner_end = moov_at + moov_size
    spliced = (good[:moov_at]
               + (moov_size + len(qt_meta)).to_bytes(4, "big")
               + good[moov_at + 4:inner_end] + qt_meta
               + good[inner_end:])
    m = containers.mp4_meta(spliced)
    assert m["width"] == 320 and m["timescale"] == 600


def test_avi_riff_boundary_is_8_plus_size():
    """The RIFF size field counts from offset 8 (includes 'AVI '):
    an avih whose bytes sit past the declared payload end must
    refuse, not read trailing garbage (review r14b)."""
    good = containers.make_avi(320, 240, 10)
    # shrink the declared RIFF size so the LIST now overruns it
    bad = bytearray(good)
    bad[4:8] = (12).to_bytes(4, "little")
    with pytest.raises(codecs.UnsupportedFormat):
        containers.avi_meta(bytes(bad))


# ------------------------------------------------ ADVICE r14 closures

def test_mp3_spurious_sync_refuses():
    """A lone header-shaped 4 bytes inside junk must NOT lock the
    scan: the header at pos+frame_size has to parse with matching
    version/layer/rate (2-consecutive-frame validation, ADVICE r14).
    Junk after a single valid-looking header fails that check."""
    lone = bytes([0xFF, 0xFB, 0x90, 0x40])      # valid MPEG-1 L3 hdr
    junk = bytes((i * 37 + 11) % 251 for i in range(2048))
    # ensure the junk itself carries no accidental sync run
    payload = junk[:512] + lone + junk[512:]
    with pytest.raises(codecs.UnsupportedFormat):
        containers.mp3_meta(payload)
    # a real stream (consecutive identical frames) still parses
    good = containers.make_mp3(6, xing=False)
    assert containers.mp3_meta(good)["n_frames"] == 6
    # a single truncated frame (stream ends before a second header
    # could exist) is still accepted — nothing disproves it
    one = containers.make_mp3(1, xing=False)
    assert containers.mp3_meta(one)["rate"] == 44100


def test_id3_shelled_flac_redispatches():
    """An ID3v2 tag is a shell, not a codec: ID3+fLaC must sniff as
    flac and parse via the FLAC walker, never lock onto a spurious
    MPEG sync inside FLAC frames (ADVICE r14)."""
    flac = containers.make_flac(80000, 8000, 1, 16)
    size = 64
    shell = (b"ID3\x04\x00\x00"
             + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                      (size >> 7) & 0x7F, size & 0x7F])
             + b"\x00" * size)
    shelled = shell + flac
    assert codecs.sniff(shelled) == "flac"
    m = containers.flac_meta(shelled)
    assert (m["total_samples"], m["rate"]) == (80000, 8000)
    with pytest.raises(codecs.UnsupportedFormat):
        containers.mp3_meta(shelled)
    # decode tier follows: flac-dims, not mp3-dims or stub
    assert _decode_one(shelled, "audio") == (80000, 8000, 1,
                                             "flac-dims")


def test_pdf_page_token_needs_delimiter():
    """'/Type /PageLabel' (a real PDF dict type) and any other
    '/Type /Page<suffix>' name must not count as a page; delimiters
    per ISO 32000-1 §7.2.2 do (ADVICE r14)."""
    body = (b"%PDF-1.6\n"
            b"1 0 obj << /Type /Page >> endobj\n"
            b"2 0 obj << /Type /Page/Parent 3 0 R >> endobj\n"
            b"3 0 obj << /Type /Pages /Count 2 >> endobj\n"
            b"4 0 obj << /Type /PageLabel >> endobj\n"
            b"5 0 obj << /Type /PageMode >> endobj\n")
    m = containers.pdf_meta(body)
    assert m["pages_est"] == 2
    # a token ending at EOF still counts (delimiter-or-end)
    assert containers.pdf_meta(b"%PDF-1.4 /Type /Page")["pages_est"] \
        == 1


def _zip64_fixture(n_members: int) -> bytes:
    z64 = (b"PK\x06\x06" + (44).to_bytes(8, "little")
           + (45).to_bytes(2, "little") + (45).to_bytes(2, "little")
           + (0).to_bytes(4, "little") + (0).to_bytes(4, "little")
           + n_members.to_bytes(8, "little")
           + n_members.to_bytes(8, "little")
           + (123456).to_bytes(8, "little")
           + (0).to_bytes(8, "little"))
    loc = (b"PK\x06\x07" + (0).to_bytes(4, "little")
           + (0).to_bytes(8, "little")          # z64 record at 0
           + (1).to_bytes(4, "little"))
    eocd = (b"PK\x05\x06" + b"\x00" * 4
            + (0xFFFF).to_bytes(2, "little")
            + (0xFFFF).to_bytes(2, "little")
            + (0xFFFFFFFF).to_bytes(4, "little")
            + (0xFFFFFFFF).to_bytes(4, "little")
            + (0).to_bytes(2, "little"))
    return z64 + loc + eocd


def test_zip64_sentinel_reads_real_counts():
    """A ZIP64 archive stores 0xFFFF in the EOCD entry count; the
    walker must follow the locator to the ZIP64 EOCD record instead
    of reporting exactly 65535 members as data (ADVICE r14)."""
    m = containers.zip_meta(_zip64_fixture(70000))
    assert m["n_members"] == 70000
    assert m["central_dir_bytes"] == 123456
    # sentinel with NO locator refuses typed (stub tier), never 65535
    bare = (b"PK\x05\x06" + b"\x00" * 4
            + (0xFFFF).to_bytes(2, "little") * 2
            + (0xFFFFFFFF).to_bytes(4, "little") * 2
            + (0).to_bytes(2, "little"))
    with pytest.raises(codecs.UnsupportedFormat):
        containers.zip_meta(bare)
    # classic small archives still read the 16-bit count verbatim
    import io
    import zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", "x")
        z.writestr("b.txt", "y")
    assert containers.zip_meta(buf.getvalue())["n_members"] == 2


def test_mp4_facts_override_claimed_modality():
    """ISO-BMFF tier dispatch keys on the parsed moov/meta facts,
    not the bridge's major-brand guess (ADVICE r14): an audio-only
    'isom' MP4 claimed video attributes the audio convention
    (ticks, timescale, n_audio), and a HEIF with an unlisted brand
    claimed video attributes heif-dims with real ispe dims."""
    m4a_isom = containers.make_mp4(5.0, 44100, audio=True,
                                   brand=b"isom")
    assert _decode_one(m4a_isom, "video") == (220500, 44100, 1,
                                              "mp4-dims")
    assert _decode_one(m4a_isom, "audio") == (220500, 44100, 1,
                                              "mp4-dims")
    heis = containers.make_heif(640, 480, brand=b"heis")
    assert _decode_one(heis, "video") == (640, 480, 3, "heif-dims")
    assert _decode_one(heis, "image") == (640, 480, 3, "heif-dims")
    # a real video track still wins the video convention
    vid = containers.make_mp4(10.0, 30, 640, 360, audio=True,
                              n_frames=300)
    assert _decode_one(vid, "audio") == (640, 360, 300, "mp4-dims")


def test_advice_r15_id3v24_footer_offset():
    """An ID3v2.4 tag with the footer flag (byte 5 bit 4) declares a
    size that excludes BOTH the 10-byte header and the 10-byte
    footer — audio starts at 10+size+10. A footered ID3-shelled
    FLAC previously missed the fLaC check by 10 bytes and sniffed
    as mp3 (ADVICE r15)."""
    flac = containers.make_flac(80000, 8000, 1, 16)
    size = 64
    syncsafe = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                      (size >> 7) & 0x7F, size & 0x7F])
    # footer flag set: header + size bytes of frames + 10-byte footer
    shell = (b"ID3\x04\x00\x10" + syncsafe + b"\x00" * size
             + b"3DI\x04\x00\x10" + syncsafe)
    assert containers._id3v2_end(shell + flac) == len(shell)
    shelled = shell + flac
    assert codecs.sniff(shelled) == "flac"
    m = containers.flac_meta(shelled)
    assert (m["total_samples"], m["rate"]) == (80000, 8000)
    with pytest.raises(codecs.UnsupportedFormat):
        containers.mp3_meta(shelled)
    # footerless tag keeps the old arithmetic
    plain = (b"ID3\x04\x00\x00" + syncsafe + b"\x00" * size)
    assert containers._id3v2_end(plain + flac) == 10 + size
