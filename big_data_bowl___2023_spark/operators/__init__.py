from . import (
    aggregates,
    filters,
    graph,
    incremental,
    joins,
    sampling,
    setops,
    skew,
    sorts,
    windows,
)

__all__ = ["aggregates", "filters", "graph", "incremental", "joins",
           "sampling", "setops", "skew", "sorts", "windows"]
