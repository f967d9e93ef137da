"""E29 — incremental rollup maintenance: merging per-batch partial
states must equal the full recompute EXACTLY (count/sum/min/max/avg
are algebraic; HLL sketch union is lossless, so even the distinct
estimates must match the full-scan sketch), including parquet
round-tripping the binary sketch state."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.incremental import (
    finalize_rollup,
    merge_rollups,
    partial_rollup,
)
from big_data_bowl___2023_spark.sources.io import load_table

GROUP = ["l_returnflag", "l_linestatus"]
NUMS = ["l_quantity", "l_extendedprice"]
DIST = ["l_partkey"]


def _final_rows(state):
    out = finalize_rollup(state, GROUP, NUMS, DIST)
    rows = {}
    for r in out.collect():
        d = r.asDict()
        key = tuple(d.pop(c) for c in GROUP)
        # float-normalize sums/avgs for cross-plan comparison
        rows[key] = {k: (round(v, 6) if isinstance(v, float) else v)
                     for k, v in d.items()}
    return rows


def test_merged_batches_equal_full_recompute(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    b1 = li.filter(F.col("l_orderkey") % 3 == 0)
    b2 = li.filter(F.col("l_orderkey") % 3 == 1)
    b3 = li.filter(F.col("l_orderkey") % 3 == 2)

    state = partial_rollup(b1, GROUP, NUMS, DIST)
    for delta in (b2, b3):
        state = merge_rollups(state, partial_rollup(delta, GROUP, NUMS,
                                                    DIST),
                              GROUP, NUMS, DIST)
    full = partial_rollup(li, GROUP, NUMS, DIST)

    assert _final_rows(state) == _final_rows(full)


def test_state_round_trips_through_parquet(spark, sf_dir):
    """The maintenance loop persists state between runs — binary
    sketches included — and keeps merging correctly after reload."""
    li = load_table(spark, sf_dir, "lineitem")
    b1 = li.filter(F.col("l_orderkey") % 2 == 0)
    b2 = li.filter(F.col("l_orderkey") % 2 == 1)

    with tempfile.TemporaryDirectory() as tmp:
        partial_rollup(b1, GROUP, NUMS, DIST).write.parquet(f"{tmp}/state")
        reloaded = spark.read.parquet(f"{tmp}/state")
        merged = merge_rollups(reloaded, partial_rollup(b2, GROUP, NUMS,
                                                        DIST),
                               GROUP, NUMS, DIST)
        full = partial_rollup(li, GROUP, NUMS, DIST)
        assert _final_rows(merged) == _final_rows(full)


def test_distinct_estimate_accuracy_and_exact_counts(spark, sf_dir):
    """HLL estimates land within the sketch's error envelope of the
    exact distinct count; n/sum are exact vs a direct aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    state = partial_rollup(li, GROUP, NUMS, DIST)
    fin = {tuple(r[c] for c in GROUP): r
           for r in finalize_rollup(state, GROUP, NUMS, DIST).collect()}
    exact = {tuple(r[c] for c in GROUP): r
             for r in (li.groupBy(*GROUP)
                       .agg(F.count(F.lit(1)).alias("n"),
                            F.countDistinct("l_partkey").alias("d"))
                       ).collect()}
    assert set(fin) == set(exact)
    for k in exact:
        assert fin[k].n == exact[k].n
        rel = abs(fin[k].distinct_l_partkey - exact[k].d) / exact[k].d
        assert rel < 0.05, (k, fin[k].distinct_l_partkey, exact[k].d)
