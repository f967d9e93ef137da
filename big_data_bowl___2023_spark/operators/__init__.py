from . import (
    aggregates,
    filters,
    fuzzy,
    graph,
    incremental,
    joins,
    sampling,
    setops,
    skew,
    sorts,
    windows,
)

__all__ = ["aggregates", "filters", "fuzzy", "graph", "incremental",
           "joins", "sampling", "setops", "skew", "sorts", "windows"]
