"""Shared artifact-union fold for the mergeable-sketch family.

Every merge_* entry point starts the same way: refuse an empty
artifact list, then union the summaries by name before applying the
sketch's own combine (bit_or / sum / hll_union / recompress /
re-take-k). One definition keeps the guard and the strict-schema
union behavior identical across the family."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def fold_union(summaries: Sequence[DataFrame], what: str) -> DataFrame:
    if not summaries:
        raise ValueError(f"{what} needs at least one summary "
                         f"(got an empty artifact list)")
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s, allowMissingColumns=False)
    return out
