from . import artifacts, curation, fixtures, nfl

__all__ = ["artifacts", "curation", "fixtures", "nfl"]
