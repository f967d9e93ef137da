from . import codecs, containers
from .binary_ops import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    frame_sample,
    media_from_binary_files,
    media_from_documents,
    media_profile,
    resize_media,
)

__all__ = ["MEDIA_SCHEMA", "codecs", "containers",
           "decode_media",
           "extract_features", "frame_sample",
           "media_from_binary_files",
           "media_from_documents", "media_profile",
           "resize_media"]
