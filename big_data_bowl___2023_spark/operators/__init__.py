from . import aggregates, filters, joins, setops, sorts, windows

__all__ = ["aggregates", "filters", "joins", "setops", "sorts", "windows"]
