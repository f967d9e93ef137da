from . import (
    gopher,
    json_ops,
    lm_score,
    redact,
    scalar,
    text,
    vectors,
    vocab,
)

__all__ = ["gopher", "json_ops", "lm_score", "redact", "scalar",
           "text", "vectors", "vocab"]
