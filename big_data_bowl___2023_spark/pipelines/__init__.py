from . import fixtures, nfl

__all__ = ["fixtures", "nfl"]
