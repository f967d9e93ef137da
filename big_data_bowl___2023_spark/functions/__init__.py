from . import scalar, text, vectors

__all__ = ["scalar", "text", "vectors"]
