from . import aggregates, filters, joins, sampling, setops, sorts, windows

__all__ = ["aggregates", "filters", "joins", "sampling", "setops",
           "sorts", "windows"]
