from . import (
    aggregates,
    filters,
    incremental,
    joins,
    sampling,
    setops,
    skew,
    sorts,
    windows,
)

__all__ = ["aggregates", "filters", "incremental", "joins", "sampling",
           "setops", "skew", "sorts", "windows"]
