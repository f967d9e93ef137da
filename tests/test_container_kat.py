"""Known-answer vectors for the container walkers (VERDICT r14 #7).

The 17 container walkers are fuzz-armored and (where possible)
stdlib-cross-checked, but their round-trip tests build streams with
the in-repo make_* fixtures — an encoder and walker could share a
systematic misreading of ISO 14496-12 / the FLAC spec / RFC 3533 /
EBML and still agree. These vectors close that hole the same way
r14's codec KATs did: every stream below is a BYTE-LITERAL derived
in comments straight from the public spec (never from make_mp4 /
make_flac / make_ogg / make_mkv), and the expected field values are
computed by hand from the spec's arithmetic.
"""

from __future__ import annotations

from big_data_bowl___2023_spark.multimodal import codecs, containers
from big_data_bowl___2023_spark.multimodal.binary_ops import _decode_one

# ISO/IEC 14496-12. Box = u32 size ∥ fourcc ∥ body (sizes include the
# 8-byte header). Layout: ftyp(16) then
# moov(296) = mvhd(108) ∥ trak(180)
#   mvhd v0 body (100 B): ver/flags 0, creation 0, modification 0,
#     timescale 0x258 = 600, duration 0x5DC = 1500 → 1500/600 = 2.5 s,
#     rate 1.0 (0x00010000), volume 1.0 (0x0100), 10 reserved bytes,
#     unity matrix (0x10000,0,0, 0,0x10000,0, 0,0,0x40000000),
#     6×u32 predefined, next_track_id 2
#   trak(180) = tkhd(92) ∥ mdia(80)
#     tkhd v0 body (84 B): ..., track_id 1, duration 1500, ...,
#       width/height 16.16 fixed: 0x01400000 = 320.0, 0x00F00000
#       = 240.0
#     mdia(80) = hdlr(32: handler_type 'vide' at body+8) ∥
#       minf(40) = stbl(32) = stts(24: 1 entry, sample_count
#       0x4B = 75, delta 0x14 = 20 → 75 frames, 75·20 = 1500 ticks —
#       consistent with the mvhd duration)
MP4_KAT = bytes.fromhex(
    "000000106674797069736f6d00000000000001286d6f6f760000006c6d766864"
    "00000000000000000000000000000258000005dc000100000100000000000000"
    "0000000000010000000000000000000000000000000100000000000000000000"
    "0000000040000000000000000000000000000000000000000000000000000000"
    "00000002000000b47472616b0000005c746b6864000000000000000000000000"
    "0000000100000000000005dc0000000000000000000000000000000000010000"
    "0000000000000000000000000001000000000000000000000000000040000000"
    "0140000000f00000000000506d6469610000002068646c720000000000000000"
    "76696465000000000000000000000000000000286d696e66000000207374626c"
    "000000187374747300000000000000010000004b00000014")

# xiph.org FLAC spec. 'fLaC' ∥ block header 0x80 (last=1, type=0 →
# STREAMINFO) ∥ length 34 ∥ body: min/max blocksize 0x1000, min/max
# framesize 0, then the packed run —
#   byte10 0x0A, byte11 0xC4: rate(20b) = 0x0A<<12 | 0xC4<<4 |
#     0x42>>4 = 40960+3136+4 = 44100
#   byte12 0x42: rate low nibble 4; channels ((0x42>>1)&7)+1 = 2;
#     bps hi bit 0
#   byte13 0xF0: bps (0<<4 | 0xF)+1 = 16; total-samples hi nibble 0
#   bytes14-17 0x00015888 = 88200 samples → 88200/44100 = 2.0 s
# ∥ 16 zero MD5 bytes.
FLAC_KAT = bytes.fromhex(
    "664c614380000022"
    "10001000000000000000"
    "0ac442f000015888"
    "00000000000000000000000000000000")

# RFC 3533 page = 'OggS' ∥ version 0 ∥ header_type ∥ granule (8 LE)
# ∥ serial 0xAB57 (4 LE) ∥ page_seq (4 LE) ∥ crc (4, not validated
# at the metadata tier) ∥ nsegs ∥ segment table ∥ payload.
# Page 1 (BOS, type 0x02): one 30-byte segment = the Vorbis I
# identification header: packtype 0x01 ∥ 'vorbis' ∥ version 0 (4 LE)
# ∥ channels 2 ∥ rate 8000 = 0x1F40 (4 LE) ∥ bitrate max/nom/min
# 12×00 ∥ blocksizes 0xB8 ∥ framing 0x01.
# Page 2 (EOS, type 0x04): granule 16000 = 0x3E80 → 16000 PCM
# samples at 8000 Hz = 2.0 s; one 1-byte dummy segment.
OGG_KAT = bytes.fromhex(
    "4f6767530002000000000000000057ab0000000000000000000001"
    "1e"
    "01766f726269730000000002401f0000"
    "000000000000000000000000b801"
    "4f6767530004803e0000000000000057ab0000010000000000000001"
    "0100")

# EBML + Matroska element IDs (stored form, size = 0x80|len varints):
#   1A45DFA3 8B [4282 88 'matroska']          EBML header, DocType
#   18538067 B2 [                             Segment (50 B)
#     1549A966 92 [                           Info (18 B)
#       2AD7B1 83 0F4240                      TimestampScale 1e6 ns
#       4489 88 40A7700000000000]             Duration = IEEE-754
#                                             double 3000.0 →
#                                             3000·1e6 ns = 3.0 s
#     1654AE6B 96 [AE 94 [                    Tracks → TrackEntry
#       83 81 01                              TrackType 1 = video
#       86 85 'V_VP9'                         CodecID
#       E0 88 [B0 82 0280  BA 82 0168]]]]     Video: PixelWidth
#                                             0x280 = 640,
#                                             PixelHeight 0x168 = 360
MKV_KAT = bytes.fromhex(
    "1a45dfa38b4282886d6174726f736b61"
    "18538067b2"
    "1549a966922ad7b1830f424044898840a7700000000000"
    "1654ae6b96ae94838101868556"
    "5f565039e088b0820280ba820168")


def test_kat_mp4_fields():
    assert codecs.sniff(MP4_KAT) == "mp4"
    m = containers.mp4_meta(MP4_KAT)
    assert m["timescale"] == 600
    assert m["duration_s"] == 2.5
    assert (m["width"], m["height"]) == (320, 240)
    assert m["n_frames"] == 75
    assert (m["n_tracks"], m["n_video_tracks"],
            m["n_audio_tracks"]) == (1, 1, 0)
    # decode tier: video convention (w, h, stts frame count)
    assert _decode_one(MP4_KAT, "video") == (320, 240, 75, "mp4-dims")


def test_kat_flac_fields():
    assert codecs.sniff(FLAC_KAT) == "flac"
    m = containers.flac_meta(FLAC_KAT)
    assert m["rate"] == 44100
    assert m["channels"] == 2
    assert m["bits_per_sample"] == 16
    assert m["total_samples"] == 88200
    assert m["duration_s"] == 2.0
    assert _decode_one(FLAC_KAT, "audio") == (88200, 44100, 2,
                                              "flac-dims")


def test_kat_ogg_vorbis_fields():
    assert codecs.sniff(OGG_KAT) == "ogg"
    m = containers.ogg_meta(OGG_KAT)
    assert m["codec"] == "vorbis"
    assert m["rate"] == 8000
    assert m["channels"] == 2
    assert m["total_samples"] == 16000
    assert m["duration_s"] == 2.0
    assert _decode_one(OGG_KAT, "audio") == (16000, 8000, 2,
                                             "ogg-dims")


def test_kat_mkv_fields():
    assert codecs.sniff(MKV_KAT) == "mkv"
    m = containers.mkv_meta(MKV_KAT)
    assert m["doctype"] == "matroska"
    assert m["timescale_ns"] == 1_000_000
    assert m["duration_s"] == 3.0
    assert (m["width"], m["height"]) == (640, 360)
    assert m["video_codec"] == "V_VP9"
    assert (m["n_video_tracks"], m["n_audio_tracks"]) == (1, 0)
    assert _decode_one(MKV_KAT, "video") == (640, 360, 3, "mkv-dims")
