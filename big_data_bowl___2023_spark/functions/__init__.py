from . import gopher, json_ops, redact, scalar, text, vectors

__all__ = ["gopher", "json_ops", "redact", "scalar", "text", "vectors"]
