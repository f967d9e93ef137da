from . import (
    aggregates,
    filters,
    fuzzy,
    graph,
    heavy,
    incremental,
    joins,
    sampling,
    setops,
    skew,
    sorts,
    splits,
    windows,
)

__all__ = ["aggregates", "filters", "fuzzy", "graph", "heavy", "incremental",
           "joins", "sampling", "setops", "skew", "sorts", "splits",
           "windows"]
