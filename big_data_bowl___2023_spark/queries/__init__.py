"""Named driver-checked queries, one module per operator family.

Each module registers entries via ``registry.query``; the mapping from
SURVEY.md §2 inventory rows to query names is in each docstring.
"""
