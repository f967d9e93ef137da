from . import (
    aggregates,
    filters,
    incremental,
    joins,
    sampling,
    setops,
    sorts,
    windows,
)

__all__ = ["aggregates", "filters", "incremental", "joins", "sampling",
           "setops", "sorts", "windows"]
