"""Sketch-based join-size estimation (operators/frequency.py::
cms_join_size): one-sided guarantee, error envelope, merge-law
composition, real-table estimate vs the exact join count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.frequency import (
    cms_join_size,
    cms_summary,
    merge_cms,
)

SF = "/root/testdata/sf0.001"
W, D = 2048, 5


def _exact_join_size(spark, a, key_a, b, key_b):
    return (a.join(b, a[key_a] == b[key_b]).count())


def test_estimate_is_one_sided_and_tight_on_small_keys(spark):
    a = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 2, 3]], ["k"])
    b = spark.createDataFrame(
        [(k,) for k in [1, 2, 2, 2, 4]], ["k"])
    # true inner product: f_a(1)*f_b(1) + f_a(2)*f_b(2) = 3 + 6 = 9
    exact = _exact_join_size(spark, a, "k", b, "k")
    assert exact == 9
    got = cms_join_size(cms_summary(a, "k", W, D),
                        cms_summary(b, "k", W, D))
    assert got["join_size_estimate"] >= exact
    assert got["join_size_estimate"] <= exact + got["error_bound"]
    assert got["n_rows_a"] == 6 and got["n_rows_b"] == 5
    # 3 keys in a 2048-wide sketch: collisions are absent here, the
    # estimate is exact (deterministic hashes — pinned, not flaky)
    assert got["join_size_estimate"] == exact


def test_real_tables_orders_lineitem(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet") \
        .select("o_orderkey")
    items = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .select("l_orderkey")
    exact = _exact_join_size(spark, orders, "o_orderkey",
                             items, "l_orderkey")
    got = cms_join_size(cms_summary(orders, "o_orderkey", W, D),
                        cms_summary(items, "l_orderkey", W, D))
    assert got["join_size_estimate"] >= exact
    assert got["join_size_estimate"] <= exact + got["error_bound"]
    # the FK join is near-unique on the orders side: the estimate
    # should be a usable planning signal, not an order-of-magnitude
    # overshoot
    assert got["join_size_estimate"] <= 2 * exact


def test_disjoint_keys_estimate_stays_within_envelope(spark):
    a = spark.createDataFrame([(k,) for k in range(100)], ["k"])
    b = spark.createDataFrame([(k,) for k in range(1000, 1100)],
                              ["k"])
    got = cms_join_size(cms_summary(a, "k", W, D),
                        cms_summary(b, "k", W, D))
    assert got["join_size_estimate"] <= got["error_bound"]


def test_merged_batches_estimate_equals_whole(spark):
    items = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .select("l_orderkey").limit(2000).cache()
    orders = spark.read.parquet(f"{SF}/orders.parquet") \
        .select("o_orderkey")
    whole = cms_summary(items, "l_orderkey", W, D)
    parts = [cms_summary(items.filter(F.col("l_orderkey") % 2 == i),
                         "l_orderkey", W, D) for i in (0, 1)]
    osum = cms_summary(orders, "o_orderkey", W, D)
    a = cms_join_size(whole, osum)
    b = cms_join_size(merge_cms(*parts), osum)
    assert a == b  # cell-exact merge law ⇒ identical estimate


def test_parameter_mismatch_refused(spark):
    a = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError, match="parameter mismatch"):
        cms_join_size(cms_summary(a, "k", 1024, 5),
                      cms_summary(a, "k", 2048, 5))


def test_key_type_mismatch_refused(spark):
    """xxhash64(int 5) != xxhash64('5'): sketches over differently-
    typed keys share no hash space, so the inner product would be a
    silent massive UNDER-estimate from a function documented as
    never-under. The artifact records its key type; refuse."""
    ints = spark.createDataFrame([(5,), (6,)], "k long")
    strs = spark.createDataFrame([("5",), ("6",)], "k string")
    with pytest.raises(ValueError, match="key-type mismatch"):
        cms_join_size(cms_summary(ints, "k", W, D),
                      cms_summary(strs, "k", W, D))
    # a legacy artifact (pre-key_type parquet) recorded no type to
    # check: the caller is trusted, exactly as documented
    legacy = cms_summary(ints, "k", W, D).drop("key_type")
    got = cms_join_size(legacy, cms_summary(ints, "k", W, D))
    assert got["join_size_estimate"] == 2
