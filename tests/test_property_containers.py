"""Property-based round trips for the container metadata walkers
(hypothesis) — parameter-space coverage the fixed-value tests in
test_containers.py can't enumerate: arbitrary durations/timescales/
dims for ISO-BMFF, frame counts and channel modes for MP3, the full
rate/channels/bps/total-samples lattice for FLAC (including the
36-bit total field). No Spark jobs — these are pure functions, so
example counts can be generous."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_bowl___2023_spark.multimodal import codecs, containers

SETTINGS = dict(max_examples=60, deadline=None)


@given(dur_ts=st.integers(1, 2**31 - 1),
       timescale=st.integers(1, 10_000_000),
       width=st.integers(0, 65535), height=st.integers(0, 65535),
       audio=st.booleans())
@settings(**SETTINGS)
def test_mp4_meta_round_trip_property(dur_ts, timescale, width,
                                      height, audio):
    data = containers.make_mp4(dur_ts / timescale, timescale,
                               width, height, audio=audio)
    m = containers.mp4_meta(data)
    assert m["timescale"] == timescale
    # duration round-trips to the tick (the encoder re-quantizes)
    assert abs(m["duration_s"] * timescale - dur_ts) <= 1
    if width > 0:
        assert (m["width"], m["height"]) == (width, height)
        assert m["n_video_tracks"] == 1
    else:
        assert m["n_video_tracks"] == 0
    assert m["n_audio_tracks"] == (1 if audio else 0)
    assert codecs.sniff(data) == "mp4"


@given(n_frames=st.integers(1, 5000), xing=st.booleans(),
       id3=st.integers(0, 512), mono=st.booleans())
@settings(max_examples=40, deadline=None)
def test_mp3_meta_round_trip_property(n_frames, xing, id3, mono):
    data = containers.make_mp3(n_frames, xing=xing, id3_bytes=id3,
                               mono=mono)
    m = containers.mp3_meta(data)
    assert m["rate"] == 44100
    assert m["channels"] == (1 if mono else 2)
    assert m["n_frames"] == n_frames
    if xing:
        assert m["duration_s"] == n_frames * 1152 / 44100
    else:
        # CBR estimate: payload bits / bitrate — exact for the
        # constant-size frames the encoder emits
        assert abs(m["duration_s"]
                   - (len(data) - (10 + id3 if id3 else 0))
                   * 8 / 128000) < 0.05
    assert codecs.sniff(data) == "mp3"


@given(total=st.integers(0, (1 << 36) - 1),
       rate=st.integers(1, (1 << 20) - 1),
       channels=st.integers(1, 8), bps=st.integers(4, 32))
@settings(**SETTINGS)
def test_flac_meta_round_trip_property(total, rate, channels, bps):
    data = containers.make_flac(total, rate, channels, bps)
    m = containers.flac_meta(data)
    assert m["total_samples"] == total
    assert m["rate"] == rate
    assert m["channels"] == channels
    assert m["bits_per_sample"] == bps
    assert m["duration_s"] == total / rate
    assert codecs.sniff(data) == "flac"


@given(codec=st.sampled_from(["vorbis", "opus"]),
       rate=st.integers(8000, 192000), channels=st.integers(1, 8),
       total=st.integers(0, 2**40))
@settings(max_examples=40, deadline=None)
def test_ogg_meta_round_trip_property(codec, rate, channels, total):
    data = containers.make_ogg(codec, rate, channels, total)
    m = containers.ogg_meta(data)
    assert m["codec"] == codec
    assert m["rate"] == rate and m["channels"] == channels
    assert m["total_samples"] == total
    timebase = rate if codec == "vorbis" else 48000
    assert m["duration_s"] == total / timebase
    assert codecs.sniff(data) == "ogg"


@given(w=st.integers(1, 65535), h=st.integers(1, 65535),
       frames=st.integers(0, 2**31 - 1), fps=st.integers(1, 240),
       streams=st.integers(1, 8))
@settings(max_examples=40, deadline=None)
def test_avi_meta_round_trip_property(w, h, frames, fps, streams):
    data = containers.make_avi(w, h, frames, fps, streams)
    m = containers.avi_meta(data)
    assert (m["width"], m["height"]) == (w, h)
    assert m["n_frames"] == frames and m["n_streams"] == streams
    assert m["us_per_frame"] == 10 ** 6 // fps
    assert codecs.sniff(data) == "avi"


@given(doctype=st.sampled_from(["matroska", "webm"]),
       w=st.integers(0, 65535), h=st.integers(0, 65535),
       dur=st.floats(0, 1e6, allow_nan=False),
       arate=st.floats(0, 384000, allow_nan=False),
       ach=st.integers(0, 255))
@settings(max_examples=40, deadline=None)
def test_mkv_meta_round_trip_property(doctype, w, h, dur, arate,
                                      ach):
    data = containers.make_mkv(doctype, w, h, dur,
                               audio_rate=arate,
                               audio_channels=ach)
    m = containers.mkv_meta(data)
    assert m["doctype"] == doctype
    if w > 0:
        assert (m["width"], m["height"]) == (w, h)
        assert m["n_video_tracks"] == 1
    if arate > 0:
        assert m["n_audio_tracks"] == 1
        assert m["channels"] == ach
        # SamplingFrequency travels as float32
        assert abs(m["rate"] - arate) <= max(1e-3, arate * 1e-6)
    # Duration travels as float64 in timescale-ns units
    assert abs(m["duration_s"] - dur) < max(1e-6, dur * 1e-9)
    assert codecs.sniff(data) == "mkv"


@given(w=st.integers(1, 2**32 - 1), h=st.integers(1, 2**32 - 1),
       brand=st.sampled_from([b"heic", b"heix", b"mif1", b"avif",
                              b"avis"]))
@settings(max_examples=40, deadline=None)
def test_heif_dims_round_trip_property(w, h, brand):
    data = containers.make_heif(w, h, brand=brand)
    m = containers.mp4_meta(data)
    assert (m["ispe_width"], m["ispe_height"]) == (w, h)
    assert m["brand"] == brand.decode().strip()


@given(members=st.lists(st.integers(0, 4096), min_size=0,
                        max_size=24))
@settings(max_examples=25, deadline=None)
def test_zip_tar_member_counts_property(members):
    import io
    import tarfile
    import zipfile
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as z:
        for i, size in enumerate(members):
            z.writestr(f"m{i}", "x" * size)
    assert containers.zip_meta(zbuf.getvalue())["n_members"] \
        == len(members)
    if not members:
        # an EMPTY tar is two zero blocks with no ustar header —
        # tar_meta correctly refuses it (nothing to validate)
        return
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as t:
        for i, size in enumerate(members):
            ti = tarfile.TarInfo(f"m{i}")
            ti.size = size
            t.addfile(ti, io.BytesIO(b"y" * size))
    tm = containers.tar_meta(tbuf.getvalue())
    assert tm["n_members"] == len(members)
    assert tm["total_bytes"] == sum(members)
