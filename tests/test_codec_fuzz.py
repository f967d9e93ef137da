"""Mutation fuzz over the whole codec family.

THE contract behind the 100 TB media story: `_decode_one` /
`_features_one` / `_resize_one` dispatch on untrusted bytes, and one
corrupt blob must fall to the stub tier — decode either succeeds or
raises `UnsupportedFormat`; NOTHING else may escape (an IndexError /
OverflowError / zlib.error inside a mapInPandas pass kills the whole
job at corpus scale). Seeded and deterministic: every failure prints
the (format, seed, mutation) triple needed to reproduce it.

Three mutation classes per format:
* byte flips / truncations / extensions of VALID streams (the
  bit-rot and partial-upload cases);
* splices of one format's body into another's magic (the
  mislabeled-extension case);
* pure noise behind a valid magic prefix (the adversarial case).
"""

from __future__ import annotations

import numpy as np
import pytest

from big_data_bowl___2023_spark.multimodal import (codecs, containers,
                                                   gif, jpeg)


def _doc_archive_seeds() -> dict[str, bytes]:
    import gzip as _gzip
    import io
    import tarfile
    import zipfile
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as z:
        z.writestr("a.txt", "hello fuzz")
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as t:
        ti = tarfile.TarInfo("a")
        ti.size = 64
        t.addfile(ti, io.BytesIO(b"y" * 64))
    return {
        "pdf": (b"%PDF-1.4\n1 0 obj << /Type /Page >>\nendobj\n"
                b"trailer\n%%EOF"),
        "zip": zbuf.getvalue(),
        "gzip": _gzip.compress(b"payload " * 64),
        "tar": tbuf.getvalue(),
    }


def _seed_payloads() -> dict[str, bytes]:
    img = (np.arange(12 * 16 * 3, dtype=np.uint64) % 256) \
        .astype(np.uint8).reshape(12, 16, 3)
    clip = (np.arange(3 * 16 * 16, dtype=np.uint64) % 251) \
        .astype(np.uint8).reshape(3, 16, 16)
    t = np.arange(800) / 800.0
    tone = np.stack([np.sin(2 * np.pi * 440 * t)], axis=1)
    return {
        "bmp": codecs.make_bmp(img),
        "ppm": codecs.encode(img),
        "png": codecs.make_png(img),
        "png-adam7": codecs.make_png(img, interlace=True),
        "jpeg": jpeg.make_jpeg(img),
        "jpeg-prog": jpeg.make_jpeg(img, progressive=True),
        "gif": gif.make_gif((img // 64) * 64),
        "wav": codecs.make_wav(tone, 8000),
        "y4m": codecs.make_y4m(clip),
        "mp4": containers.make_mp4(12.5, 1000, 640, 360, audio=True),
        "m4a": containers.make_mp4(3.0, 44100, audio=True,
                                   brand=b"M4A "),
        "mp3": containers.make_mp3(8, xing=True, id3_bytes=64),
        "mp3-cbr": containers.make_mp3(6, xing=False),
        "flac": containers.make_flac(441000, 44100, 2, 16),
        "ogg-vorbis": containers.make_ogg("vorbis", 44100, 2),
        "ogg-opus": containers.make_ogg("opus", 48000, 1, 96000),
        "avi": containers.make_avi(320, 240, 100),
        "heif": containers.make_heif(640, 480),
        "avif": containers.make_heif(64, 64, brand=b"avif"),
        "mkv": containers.make_mkv("matroska", 320, 240, 5.0),
        **_doc_archive_seeds(),
        "webm": containers.make_mkv("webm", duration_s=2.0,
                                    audio_rate=48000.0,
                                    audio_channels=2),
        "tiff": (b"II*\x00\x08\x00\x00\x00\x02\x00"
                 + b"\x00\x01\x03\x00\x01\x00\x00\x00\x40\x00\x00\x00"
                 + b"\x01\x01\x03\x00\x01\x00\x00\x00\x30\x00\x00\x00"
                 + b"\x00\x00\x00\x00"),
    }


def _decode_any(data: bytes) -> None:
    """Exercise every per-record entry point the Arrow passes use."""
    kind = codecs.sniff(data)
    if kind == "wav":
        codecs.decode_wav(data)
    elif kind == "y4m":
        codecs.decode_y4m(data, [0])
        codecs.sample_y4m(data, 2)
    elif kind in ("jpeg", "gif", "webp"):
        # the dims pass runs both classifiers (must never raise
        # anything, even typed) and image_dims (typed only)
        jpeg.is_decodable(data)
        gif.has_frame(data)
        try:
            codecs.image_dims(data)
        except codecs.UnsupportedFormat:
            pass
        codecs.decode(data)
    elif kind == "mp4":
        containers.mp4_meta(data)
    elif kind == "mp3":
        containers.mp3_meta(data)
    elif kind == "flac":
        containers.flac_meta(data)
    elif kind == "ogg":
        containers.ogg_meta(data)
    elif kind == "avi":
        containers.avi_meta(data)
    elif kind == "mkv":
        containers.mkv_meta(data)
    elif kind == "pdf":
        containers.pdf_meta(data)
    elif kind == "zip":
        containers.zip_meta(data)
    elif kind == "gzip":
        containers.gzip_meta(data)
    elif kind == "tar":
        containers.tar_meta(data)
    elif kind == "tiff":
        # metadata-only tier: decode() refuses tiff BY CONTRACT even
        # on valid streams, so the sanity pass exercises the dims
        # walk (typed-catch for mutants)
        codecs.image_dims(data)
    else:
        codecs.decode(data)


def _assert_typed(data: bytes, ctx: str) -> None:
    try:
        _decode_any(data)
    except codecs.UnsupportedFormat:
        pass
    except Exception as exc:      # noqa: BLE001 — the assertion
        pytest.fail(f"untyped {type(exc).__name__} escaped decode "
                    f"({ctx}): {exc}")


@pytest.mark.parametrize("fmt", sorted(_seed_payloads()))
def test_fuzz_mutations_stay_typed(fmt):
    data = _seed_payloads()[fmt]
    rng = np.random.default_rng(0xC0DEC)
    # valid stream sanity: decodes clean
    _decode_any(data)
    for trial in range(200):
        buf = bytearray(data)
        n_flips = int(rng.integers(1, 8))
        for _ in range(n_flips):
            i = int(rng.integers(0, len(buf)))
            buf[i] = int(rng.integers(0, 256))
        _assert_typed(bytes(buf), f"{fmt} flip trial {trial}")
    for trial in range(60):
        cut = int(rng.integers(0, len(data)))
        _assert_typed(data[:cut], f"{fmt} truncation at {cut}")
        _assert_typed(data + bytes(rng.integers(0, 256, 16,
                                                dtype=np.uint8)
                                   .tobytes()),
                      f"{fmt} extension trial {trial}")


def test_fuzz_cross_format_splices():
    payloads = _seed_payloads()
    names = sorted(payloads)
    for a in names:
        for b in names:
            if a == b:
                continue
            head = payloads[a][:16]
            body = payloads[b][16:]
            _assert_typed(head + body, f"{a} head + {b} body")


def test_fuzz_noise_behind_valid_magic():
    rng = np.random.default_rng(7)
    magics = [b"BM", b"P6 ", b"P5 ", codecs._PNG_SIG,
              b"\xff\xd8\xff", b"GIF89a", b"GIF87a",
              b"RIFF\x00\x01\x00\x00WAVE",
              b"RIFF\x00\x01\x00\x00WEBP", b"YUV4MPEG2 ",
              b"\x00\x00\x00\x18ftypisom", b"fLaC", b"ID3\x04\x00\x00",
              b"\xff\xfb\x90\x40", b"OggS\x00\x02",
              b"RIFF\x00\x01\x00\x00AVI ", b"II*\x00", b"MM\x00*",
              b"\x00\x00\x00\x18ftypheic",
              b"\x00\x00\x00\x18ftypavif", b"\x1aE\xdf\xa3",
              b"%PDF-1.5\n", b"PK\x03\x04", b"\x1f\x8b\x08\x00"]
    for magic in magics:
        for trial in range(40):
            noise = rng.integers(0, 256, int(rng.integers(0, 400)),
                                 dtype=np.uint8).tobytes()
            _assert_typed(magic + noise,
                          f"{magic!r} + noise trial {trial}")
