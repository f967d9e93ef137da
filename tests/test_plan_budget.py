"""Shuffle-budget regression guard: each headline query's physical
plan has a known-good number of shuffle exchanges (measured when the
plan was reviewed and accepted). An edit that silently adds a shuffle
— a lost broadcast, a redundant repartition, a window sneaking in —
fails HERE as a named assertion instead of surfacing as a bench
regression two rounds later.

Budgets are ≤ bounds on the pre-AQE optimized plan (AQE can only
remove exchanges at runtime, never add them). Broadcast exchanges are
NOT counted against the budget — replicating a small side is the
cheap alternative to a shuffle, and the dimension-join queries assert
a minimum broadcast count instead so the broadcast can't silently
degrade into a sort-merge join.
"""

from __future__ import annotations

import re

import pytest

from big_data_bowl___2023_spark import registry
from big_data_bowl___2023_spark.plans.explain import formatted_plan

# name -> (max shuffle exchanges, min broadcast exchanges)
BUDGETS = {
    "q1_pricing_summary": (1, 0),       # partial→final agg
    "j3_broadcast_dim_revenue": (1, 5),  # star join: dims broadcast
    "w1_lag_delta": (1, 0),             # one window partition
    "w4_running_sum": (1, 0),           # shared ordered window
    "a11_pivot_sum": (2, 0),            # groupBy + pivot
    "o5_ranking": (1, 0),               # agg→having→order (TakeOrdered)
    "t_quality_score": (0, 0),          # pure scan-side codegen
    "dedup_exact": (1, 0),              # one fingerprint shuffle
    "f9_datetime_rollup": (1, 0),
    "qpipe_session_bounds": (2, 1),     # two filtered aggs, one joined
    "qpipe_blocker_counts": (4, 3),     # 2 distinct-counts + fills
    "j9_self_join_back": (1, 1),        # derived agg broadcast back
    "p15_left_join_fill": (1, 1),
    "dedup_minhash_lsh": (2, 3),        # band agg + verify join
    "sim_topk_cosine": (1, 1),          # queries broadcast, topk window
    # --- expensive extension queries (round 5): the costly plans are
    # where a crept-in shuffle hurts most, so they get budgets too.
    "dedup_semantic_pairs": (1, 2),     # centroids broadcast; one
                                        # cluster-keyed shuffle
    "dsir_select": (6, 2),              # explode + doc-keyed shuffles
                                        # + TakeOrdered; models bcast
    "dedup_repeated_lines": (2, 1),     # line-hash count + doc
                                        # reassembly; repeated-subset
                                        # join broadcasts at this SF
    "qpipe_pivot_metric": (2, 0),       # groupBy + pivot
    "mm_extract_features": (0, 1),      # mapInPandas scan-side; meta
                                        # join broadcasts
    "qpipe_epa_comparison": (2, 1),     # per-order agg + median agg;
                                        # orders side broadcasts
    "qpipe_time_to_throw": (1, 0),      # one grouped min/max
    "curation_e2e": (5, 2),             # r16: the fan-out pins
                                        # materialize four boundaries
                                        # (localCheckpoint → Scan
                                        # ExistingRDD), so the visible
                                        # terminal plan is the tail
                                        # segment only: measured 5
                                        # shuffles / 2 broadcasts at
                                        # sf0.01. Stage-level shapes
                                        # behind the pins stay guarded
                                        # by the plan-fingerprint gate
                                        # (PLAN_FINGERPRINTS.json,
                                        # both pin modes).
    "heavy_hitters_lines": (1, 1),      # candidate-only recount: one
                                        # groupBy shuffle, candidates
                                        # broadcast (pass 1 is
                                        # mapInPandas, no plan here)
    "seq_assembly": (1, 0),             # per-source window; the
                                        # manifest groupBy REUSES the
                                        # window's source partitioning
                                        # (source ⊆ grouping keys)
    "corpus_profile": (3, 1),           # signal agg + fingerprint
                                        # window + dup-rate agg; tally
                                        # joins back broadcast
}

# Extension ops benched outside the 50-slot registry (bench._extra_ops)
# still need budget coverage — resolve names through bench's map too.
def _all_queries():
    import bench

    qs = dict(registry.all_queries())
    qs.update(bench._extra_ops())
    return qs


def _counts(plan: str) -> tuple[int, int]:
    shuffles = len(re.findall(r"\(\d+\) Exchange\b", plan))
    bcasts = len(re.findall(r"\(\d+\) BroadcastExchange\b", plan))
    return shuffles, bcasts


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_shuffle_budget(spark, sf_dir, name):
    qs = _all_queries()
    plan = formatted_plan(qs[name](spark, sf_dir))
    shuffles, bcasts = _counts(plan)
    max_shuffles, min_bcast = BUDGETS[name]
    assert shuffles <= max_shuffles, (
        f"{name}: {shuffles} shuffle exchanges, budget "
        f"{max_shuffles} — a shuffle crept into the plan:\n"
        + plan[:1500])
    assert bcasts >= min_bcast, (
        f"{name}: {bcasts} broadcast exchanges, expected >= "
        f"{min_bcast} — a broadcast degraded into a shuffle join:\n"
        + plan[:1500])
    assert "CartesianProduct" not in plan
