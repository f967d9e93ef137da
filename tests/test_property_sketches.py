"""Property-based invariants (hypothesis) for the mergeable-sketch
family: randomized small corpora and ARBITRARY CHUNKINGS exercise
the merge laws where hand fixtures pick friendly splits. Example
counts stay low — every example pays Spark jobs — so these assert
LOGICAL invariants, not throughput.
"""

from __future__ import annotations

import collections

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_bowl___2023_spark.dedup.bloom import (
    bloom_bytes,
    bloom_summary,
    merge_blooms,
)
from big_data_bowl___2023_spark.operators.bottomk import (
    bottomk_summary,
    merge_bottomk,
)
from big_data_bowl___2023_spark.operators.frequency import (
    cms_matrix,
    cms_summary,
    merge_cms,
)
from big_data_bowl___2023_spark.operators.quantiles import (
    merge_quantile_summaries,
    quantile_estimate,
    quantile_summary,
)

SETTINGS = dict(max_examples=6, deadline=None,
                suppress_health_check=[
                    HealthCheck.function_scoped_fixture])

KEYS = ["a", "b", "c", "dd", "ee", "hot", "hot", "hot"]

keys_st = st.lists(st.sampled_from(KEYS), min_size=1, max_size=30)
# chunk boundaries: a sorted list of cut points
cuts_st = st.lists(st.integers(min_value=0, max_value=29),
                   max_size=3).map(sorted)


def _chunks(items, cuts):
    cuts = [c for c in cuts if 0 < c < len(items)]
    out, prev = [], 0
    for c in sorted(set(cuts)):
        out.append(items[prev:c])
        prev = c
    out.append(items[prev:])
    return [c for c in out if c]


@given(keys=keys_st, cuts=cuts_st)
@settings(**SETTINGS)
def test_bloom_merge_equals_whole_under_any_chunking(spark, keys,
                                                     cuts):
    """OR-merge of per-chunk filters is BIT-EXACT equal to the
    single-pass filter for EVERY chunking — and idempotent under
    re-merging any chunk."""
    params = (640, 3)
    whole = bloom_bytes(
        bloom_summary(spark.createDataFrame([(k,) for k in keys],
                                            "k string"),
                      "k", *params))
    chunks = _chunks(keys, cuts)
    summaries = [bloom_summary(
        spark.createDataFrame([(k,) for k in c], "k string"),
        "k", *params) for c in chunks]
    merged = merge_blooms(*summaries)
    assert bloom_bytes(merged) == whole
    assert bloom_bytes(merge_blooms(merged, summaries[0])) == whole


@given(keys=keys_st, cuts=cuts_st)
@settings(**SETTINGS)
def test_cms_merge_cell_exact_and_sound_under_any_chunking(
        spark, keys, cuts):
    """Cell-sum merge equals the single-pass sketch for every
    chunking, total mass is exact per sketch row, and every key's
    estimate (min over rows) is >= its true count."""
    w, d = 64, 3
    whole_c, _ = cms_matrix(cms_summary(
        spark.createDataFrame([(k,) for k in keys], "k string"),
        "k", w, d))
    merged = merge_cms(*[cms_summary(
        spark.createDataFrame([(k,) for k in c], "k string"),
        "k", w, d) for c in _chunks(keys, cuts)])
    merged_c, _ = cms_matrix(merged)
    assert (whole_c == merged_c).all()
    assert (merged_c.sum(axis=1) == len(keys)).all()
    # one-sided soundness spot check against exact counts
    from big_data_bowl___2023_spark.operators.frequency import (
        estimate_counts,
    )
    exact = collections.Counter(keys)
    probe = spark.createDataFrame([(k,) for k in exact],
                                  "k string")
    for r in estimate_counts(probe, "k", merged).collect():
        assert r["freq_estimate"] >= exact[r["k"]]


@given(keys=keys_st, cuts=cuts_st)
@settings(**SETTINGS)
def test_bottomk_merge_exact_under_any_chunking(spark, keys, cuts):
    """Union-and-retake merge reproduces the single-pass sample
    EXACTLY for every chunking (idempotent law), and the sample size
    is min(k, distinct keys)."""
    k = 4
    df = spark.createDataFrame([(x,) for x in keys], "k string")
    whole = sorted(map(tuple, bottomk_summary(df, "k", k).collect()))
    merged = merge_bottomk(
        *[bottomk_summary(
            spark.createDataFrame([(x,) for x in c], "k string"),
            "k", k) for c in _chunks(keys, cuts)],
        key_col="k", k=k)
    assert sorted(map(tuple, merged.collect())) == whole
    assert len(whole) == min(k, len(set(keys)))


@given(vals=st.lists(st.floats(min_value=-100, max_value=100,
                               allow_nan=False),
                     min_size=1, max_size=40),
       cuts=cuts_st)
@settings(**SETTINGS)
def test_tdigest_merge_conserves_mass_and_bounds(spark, vals, cuts):
    """For every chunking: merged digests conserve exact count,
    min, and max; estimates stay inside [min, max]; p=0/p=1 exact."""
    def df_of(v):
        return spark.createDataFrame([(float(x),) for x in v],
                                     "v double")

    merged = merge_quantile_summaries(
        *[quantile_summary(df_of(c), "v")
          for c in _chunks(vals, cuts)])
    row = merged.collect()[0]
    assert row["count"] == len(vals)
    assert row["min"] == min(vals)
    assert row["max"] == max(vals)
    est = {round(r["probability"], 4): r["quantile"] for r in
           quantile_estimate(merged, [0.0, 0.5, 1.0]).collect()}
    assert est[0.0] == min(vals)
    assert est[1.0] == max(vals)
    assert min(vals) <= est[0.5] <= max(vals)
