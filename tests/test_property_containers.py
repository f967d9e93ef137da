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
