from . import (
    bpe,
    gopher,
    json_ops,
    lm_score,
    redact,
    scalar,
    text,
    vectors,
    vocab,
)

__all__ = ["bpe", "gopher", "json_ops", "lm_score", "redact",
           "scalar", "text", "vectors", "vocab"]
