"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata; the
per-record transforms (decode, feature-extract, resize, frame-sample)
run as Arrow-batched ``mapInPandas`` passes — the only layer of the
engine where Python touches row data, sized by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so each batch fits
executor memory regardless of blob size.

The actual codec calls are STUBBED (this container ships no
PIL/ffmpeg): ``decode_media`` tries the real libraries and falls back
to a deterministic pseudo-decode derived from the bytes, clearly
marked. Everything Spark-side — schema, partitioning, the mapInPandas
signature, Arrow batch shape — is real and tested; swapping in a real
codec changes only the body of ``_decode_one``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("modality", T.StringType()),      # image|audio|video
    T.StructField("data", T.BinaryType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("modality", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("decoder", T.StringType()),
])

FEATURE_DIM = 8
# Double, not float32: the stub features are exact small-int ratios
# (byte/255) and the driver oracle recomputes them in SQL — float32
# round-trip noise would make cross-engine value hashes diverge.
FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("frame_bytes", T.BinaryType()),
])

RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("data", T.BinaryType()),
])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents`` (the test
    corpus has no stored blobs): text bytes stand in for an encoded
    image payload. Real deployments read blob columns or (better at
    100 TB) blob *pointers* resolved inside the map pass."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "UTF-8").alias("data"),
        "source",
        F.octet_length(F.encode("text", "UTF-8"))
         .cast("bigint").alias("n_bytes"))


def _decode_one(data: bytes, modality: str) -> tuple[int, int, int, str]:
    """STUB DECODE. Tries real codecs; otherwise a deterministic fake
    derived from the payload hash (stable across runs/engines)."""
    if modality == "image":
        try:  # real path, absent in this container
            import io

            from PIL import Image  # noqa: F401
            img = Image.open(io.BytesIO(data))
            return img.width, img.height, len(img.getbands()), "pil"
        except Exception:
            pass
    h = hashlib.md5(data).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    channels = 1 + h[2] % 3
    return width, height, channels, "stub"


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode pass: (media_id, modality, data) →
    per-record dimensions. One mapInPandas over the payload column;
    column pruning keeps undecoded columns out of the Arrow transfer."""
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_one(bytes(d), m)
                       for d, m in zip(pdf["data"], pdf["modality"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "n_channels": [d[2] for d in decoded],
                "decoder": [d[3] for d in decoded],
            })

    return (media.select("media_id", "modality", "data")
            .mapInPandas(decode, DECODED_SCHEMA))


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature embedding per media record (stub: hash-derived floats in
    [0,1); real path: a model forward pass per Arrow batch). Output is
    an ``array<float>`` ready for the similarity package."""
    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf["data"]:
                h = hashlib.sha256(bytes(d)).digest()
                out.append([h[i] / 255.0 for i in range(dim)])
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "features": out})

    return (media.select("media_id", "data")
            .mapInPandas(feats, FEATURES_SCHEMA))


def _resize_one(data: bytes, modality: str,
                max_side: int) -> tuple[int, int, bytes]:
    """STUB RESIZE. Tries the real codec; otherwise derives the
    target dims from the stub decode (aspect-preserving fit into
    ``max_side``) and emits a deterministic byte payload proportional
    to the target pixel count — the real path's cost shape (output
    bytes scale with target dims, not source bytes) without the
    codec."""
    if modality == "image":
        try:  # real path, absent in this container
            import io

            from PIL import Image
            img = Image.open(io.BytesIO(data))
            img.thumbnail((max_side, max_side))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return img.width, img.height, buf.getvalue()
        except Exception:
            pass
    w, h, _, _ = _decode_one(data, modality)
    scale = min(1.0, max_side / max(w, h))
    tw, th = max(1, int(w * scale)), max(1, int(h * scale))
    seed = hashlib.md5(data).digest()
    n_out = tw * th  # 1 "byte per pixel" stand-in
    payload = (seed * (n_out // len(seed) + 1))[:n_out]
    return tw, th, payload


def resize_media(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Aspect-preserving resize pass (thumbnailing for vision-model
    preprocessing): (media_id, data) → (media_id, width, height,
    data). Same Arrow mapInPandas shape as decode — and the one pass
    whose OUTPUT payload is bounded by design (≤ max_side² per
    record), which is what makes downstream shuffles of resized
    media affordable at 100 TB while the raw originals stay in the
    object store."""
    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_resize_one(bytes(d), m, max_side)
                   for d, m in zip(pdf["data"], pdf["modality"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": [o[0] for o in out],
                "height": [o[1] for o in out],
                "data": [o[2] for o in out],
            })

    return (media.select("media_id", "modality", "data")
            .mapInPandas(resize, RESIZED_SCHEMA))


def frame_sample(media: DataFrame, every_n_bytes: int = 64,
                 max_frames: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads: emit up to
    ``max_frames`` fixed-stride byte windows per record (stub for
    keyframe extraction). Demonstrates the 1→N mapInPandas shape —
    output rows exceed input rows, which no scalar UDF can express."""
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, d in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(d)
                for i in range(min(max_frames,
                                   max(len(raw) // every_n_bytes, 1))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(
                        raw[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_index": idxs,
                                "frame_bytes": frames})

    return (media.select("media_id", "data")
            .mapInPandas(sample, FRAME_SCHEMA))
