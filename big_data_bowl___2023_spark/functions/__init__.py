from . import json_ops, scalar, text, vectors

__all__ = ["json_ops", "scalar", "text", "vectors"]
