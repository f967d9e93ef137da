"""Exact heavy hitters without a full-key shuffle (Misra-Gries).

``groupBy(key).count()`` over a 100 TB corpus shuffles every distinct
key — for per-line / per-shingle / per-domain frequency questions the
distinct-key universe is billions of rows, yet the answer wanted is
the handful of keys above a frequency threshold. The classic two-pass
fix (Misra & Gries 1982; merge rule from Agarwal et al.,
"Mergeable Summaries", PODS'12):

* **pass 1 — candidate discovery, ZERO shuffle**: each partition
  folds its rows into a bounded Misra-Gries summary of capacity
  ``c`` (an ``mapInPandas`` scan, Arrow-batched; state is one dict of
  ≤ c keys regardless of partition size). A partition summary
  undercounts any key by at most ``n_p/(c+1)``, and the union of the
  per-partition summaries therefore contains EVERY key with global
  count > n/(c+1): a key absent from all summaries has total count
  ≤ Σ n_p/(c+1) = n/(c+1). With ``c ≥ 1/phi`` the candidate set is a
  superset of all phi-heavy keys — a hard guarantee, not a heuristic.
  The summary side output also carries per-partition row counts, so
  the total ``n`` falls out of the same pass (no extra count job).
* **pass 2 — exact verification, candidate-only shuffle**: the tiny
  candidate set (≤ partitions·c rows) broadcast-semi-joins the corpus
  and only MATCHING rows reach the groupBy — the shuffle carries the
  heavy keys' rows, not the billion-key tail. Counts are exact, so
  the final ``count >= ceil(phi·n)`` filter makes the result
  IDENTICAL to the naive full groupBy — verified against a DuckDB
  oracle in tests.

Reference scope note: north-star extension (SURVEY.md §2 extensions);
the reference has no corpus-frequency operators. The corpus use case
is boilerplate mining: "which exact lines / user agents / domains
dominate the crawl" before choosing line-scrub thresholds
(dedup/lines.py consumes the answer).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import pin

MAX_CAPACITY = 200_000


def mg_capacity(min_freq_ratio: float, slack: int = 2) -> int:
    """Summary capacity for a phi = ``min_freq_ratio`` query: the
    union-of-summaries guarantee needs c ≥ 1/phi; ``slack`` tightens
    the per-key undercount (error ≤ n/(slack/phi)) so pass-2's
    candidate set stays close to the true heavy set instead of
    dragging in ~1/phi borderline keys per partition."""
    import math

    if not (0.0 < min_freq_ratio <= 1.0):
        raise ValueError(f"min_freq_ratio must be in (0, 1], "
                         f"got {min_freq_ratio}")
    c = int(math.ceil(slack / min_freq_ratio))
    if c > MAX_CAPACITY:
        raise ValueError(
            f"capacity {c} (= {slack}/{min_freq_ratio}) exceeds "
            f"{MAX_CAPACITY}; thresholds this small are a full "
            f"frequency query — use groupBy().count() instead")
    return max(1, c)


def ceil_phi_n(min_freq_ratio: float, n: int) -> int:
    """ceil(phi·n) in exact DECIMAL arithmetic on phi's decimal repr:
    float multiply turns 0.07·100 into 7.000000000000001 and a float
    ceil would silently raise the threshold to 8, excluding a key at
    exactly the documented frequency. Decimal(str(phi)) recovers the
    number the caller wrote."""
    import math
    from decimal import Decimal

    return int(math.ceil(Decimal(str(min_freq_ratio)) * n))


def _mg_merge(state: dict, counts, capacity: int) -> None:
    """Merge a batch's exact counts into the bounded summary IN
    PLACE: add, then apply the PODS'12 merge step — subtract the
    (c+1)-th largest count from everything and drop non-positives.
    Each such step removes at least one key, so the state size is
    bounded by c + batch_distinct between compactions and ≤ c after."""
    import heapq

    for val, cnt in counts.items():
        state[val] = state.get(val, 0) + int(cnt)
    if len(state) > capacity:
        sub = heapq.nlargest(capacity + 1, state.values())[capacity]
        for val in [v for v, c in state.items() if c <= sub]:
            del state[val]
        for val in state:
            state[val] -= sub


def partition_summaries(df: DataFrame, key_col: str,
                        capacity: int) -> DataFrame:
    """(key, lower_bound, is_null_key, part_rows): one Misra-Gries
    summary row per surviving key per partition. ``part_rows`` is the
    partition's total row count, carried on the FIRST row only (0 on
    the rest) so a plain sum recovers n. NULL keys are counted like
    any other value (SQL GROUP BY semantics) but travel under the
    ``is_null_key`` flag because an Arrow null in ``key`` must stay
    distinguishable from a padding row. No shuffle: pure
    mapInPandas."""
    key_type = df.schema[key_col].dataType
    out_schema = T.StructType([
        T.StructField("key", key_type),
        T.StructField("lower_bound", T.LongType()),
        T.StructField("is_null_key", T.BooleanType()),
        T.StructField("part_rows", T.LongType()),
    ])

    def summarize(batches: Iterator[pd.DataFrame]
                  ) -> Iterator[pd.DataFrame]:
        state: dict = {}
        null_cnt = 0
        rows = 0
        for pdf in batches:
            rows += len(pdf)
            col = pdf[key_col]
            null_cnt += int(col.isna().sum())
            vc = col.dropna().value_counts()
            if len(vc):
                _mg_merge(state, vc, capacity)
        if rows == 0:
            return
        # NULL keys can't live in the dict next to real values
        # (pandas NaN collapses them); track exactly via one counter —
        # no capacity pressure, the bound still holds for every key.
        keys = list(state) + ([None] if null_cnt else [])
        lbs = list(state.values()) + ([null_cnt] if null_cnt else [])
        nulls = [False] * len(state) + ([True] if null_cnt else [])
        if not keys:        # rows present but every count decremented
            keys, lbs, nulls = [None], [0], [False]
        part = [rows] + [0] * (len(keys) - 1)
        yield pd.DataFrame({"key": keys,
                            "lower_bound": pd.array(lbs, dtype="int64"),
                            "is_null_key": nulls,
                            "part_rows": pd.array(part, dtype="int64")})

    return df.select(key_col).mapInPandas(summarize, out_schema)


def heavy_hitters(df: DataFrame, key_col: str,
                  min_freq_ratio: float, slack: int = 2) -> DataFrame:
    """(``key_col``, count): EXACTLY the keys whose frequency is
    ≥ ceil(min_freq_ratio · n), with exact counts — same rows as
    ``groupBy(key).count().filter(...)`` but the only corpus-scale
    shuffle carries candidate-key rows, not the full distinct-key
    universe. NULL keys participate (SQL GROUP BY semantics).

    The summary never materializes on the driver: it is
    localCheckpoint-ed (bounded by partitions × capacity rows), only
    the scalar (n, has-null-candidate) pair is collected, and the
    candidate set feeds the probe as a broadcast DataFrame — so the
    operator holds at any partition count."""
    capacity = mg_capacity(min_freq_ratio, slack)
    # one pass-1 job; the checkpoint stops the (full-corpus) scan
    # from re-running for the stats agg and the candidate probe
    summary = pin(partition_summaries(df, key_col, capacity))
    return heavy_hitters_from_summary(df, summary, key_col,
                                      min_freq_ratio)


def merge_summaries(*summaries: DataFrame) -> DataFrame:
    """Fold several :func:`partition_summaries` outputs (e.g. one
    persisted artifact per ingest batch) into one summary with the
    same schema and the same guarantee: summed lower bounds
    undercount any key by at most Σ nᵢ/(capacity+1) = n/(capacity+1),
    so the union of keys remains a candidate superset for the
    combined corpus — heavy-hitter monitoring of a GROWING corpus
    without ever rescanning old batches. No re-compaction is applied
    (it would only shrink the candidate set; correctness never needs
    it), so this is a plain union + groupBy over tiny inputs."""
    from ._fold import fold_union

    out = fold_union(summaries, "merge_summaries")
    return (out.groupBy("key", "is_null_key")
            .agg(F.sum("lower_bound").alias("lower_bound"),
                 F.sum("part_rows").alias("part_rows"))
            .select("key", "lower_bound", "is_null_key", "part_rows"))


def heavy_hitters_from_summary(df: DataFrame, summary: DataFrame,
                               key_col: str,
                               min_freq_ratio: float,
                               broadcast_max_candidates: int = 1_000_000
                               ) -> DataFrame:
    """Exact recount pass against a prebuilt (possibly merged)
    summary: same output contract as :func:`heavy_hitters`, with
    ``df`` the COMBINED corpus the summary describes.

    ``broadcast_max_candidates`` bounds the candidate build side the
    broadcast hint is applied to — MAX_CAPACITY bounds per-partition
    state, but partitions × capacity does not bound the union; past
    the cap the hint is dropped and the semi join shuffles candidate
    KEYS only (still never the corpus tail's distinct-key universe)."""
    stats = summary.agg(
        F.sum("part_rows").alias("n"),
        F.max(F.col("is_null_key")
              & (F.col("lower_bound") > 0)).alias("null_cand"),
        F.sum((F.col("key").isNotNull()
               & (F.col("lower_bound") > 0)).cast("long"))
        .alias("n_cand")).first()
    n = stats.n or 0
    if n == 0:
        # An empty summary describes an empty corpus. Returning a full
        # groupBy of df here would silently run the exact unthresholded
        # full-shuffle query this operator exists to avoid whenever the
        # summary is stale or mismatched — fail safe with an empty
        # result in the output schema instead.
        return (df.select(key_col).limit(0)
                .groupBy(key_col)
                .agg(F.count(F.lit(1)).alias("count")))
    min_count = ceil_phi_n(min_freq_ratio, n)
    # padding rows (all-decremented partitions) are key-NULL with
    # lower_bound 0 — not candidates; a real NULL-key candidate rides
    # the is_null_key flag. No distinct on candidates: duplicates are
    # deduped by the broadcast hash build, and skipping it keeps the
    # candidate path shuffle-free. Equi semi-join only — an OR'd
    # left-side NULL predicate would become a nested-loop join.
    cand = (summary
            .filter(F.col("key").isNotNull()
                    & (F.col("lower_bound") > 0))
            .select(F.col("key").alias("__hh_key")))
    if (stats.n_cand or 0) <= broadcast_max_candidates:
        cand = F.broadcast(cand)
    matched = df.select(key_col).join(
        cand, F.col(key_col) == F.col("__hh_key"), "left_semi")
    if stats.null_cand:
        matched = matched.unionByName(
            df.select(key_col).filter(F.col(key_col).isNull()))
    return (matched.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("count"))
            .filter(F.col("count") >= F.lit(min_count)))
