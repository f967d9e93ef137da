"""SCD2 dimension versioning: hand-derived merge fixture, python
simulation oracle on real events, structural invariants, and
point-in-time views."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.scd import (
    scd2_apply,
    scd2_at,
    scd2_init,
)
from big_data_bowl___2023_spark.sources.io import load_table

T = lambda d, h=0: datetime(2026, 1, d, h)


def _invariants(rows, keys=("k",)):
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(tuple(getattr(r, k) for k in keys),
                          []).append(r)
    for vers in by_key.values():
        assert sum(1 for v in vers if v.is_current) == 1
        vers = sorted(vers, key=lambda v: v.valid_from)
        for a, b in zip(vers, vers[1:]):
            assert a.valid_to == b.valid_from      # contiguous
        assert vers[-1].valid_to is None           # open-ended


def test_init_and_apply_hand_fixture(spark):
    ups = spark.createDataFrame(
        [("a", "v1", T(1)), ("a", "v1", T(2)),      # no-op suppressed
         ("a", "v2", T(3)),
         ("b", "x", T(1))],
        ["k", "attr", "effective_ts"])
    dim = scd2_init(ups, ["k"])
    rows = dim.collect()
    _invariants(rows)
    a = sorted([r for r in rows if r.k == "a"],
               key=lambda r: r.valid_from)
    assert [(r.attr, r.valid_from, r.valid_to) for r in a] == [
        ("v1", T(1), T(3)), ("v2", T(3), None)]

    # batch 2: change b, no-op a (suppressed), late update for a
    # (ts <= open valid_from -> dropped), brand-new key c
    ups2 = spark.createDataFrame(
        [("b", "y", T(5)), ("a", "v2", T(6)), ("a", "v9", T(2)),
         ("c", "new", T(4))],
        ["k", "attr", "effective_ts"])
    dim2 = scd2_apply(dim, ups2, ["k"])
    rows2 = dim2.collect()
    _invariants(rows2)
    got = {(r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
           for r in rows2}
    assert ("b", "x", T(1), T(5), False) in got
    assert ("b", "y", T(5), None, True) in got
    assert ("c", "new", T(4), None, True) in got
    # a unchanged: still two versions, v2 open; late v9 dropped
    assert sum(1 for r in rows2 if r.k == "a") == 2
    assert ("a", "v2", T(3), None, True) in got


def test_multi_update_chain_single_batch(spark):
    dim = scd2_init(spark.createDataFrame(
        [("k1", "a", T(1))], ["k", "attr", "effective_ts"]), ["k"])
    ups = spark.createDataFrame(
        [("k1", "b", T(2)), ("k1", "b", T(3)), ("k1", "c", T(4))],
        ["k", "attr", "effective_ts"])
    rows = scd2_apply(dim, ups, ["k"]).collect()
    _invariants(rows)
    chain = sorted(rows, key=lambda r: r.valid_from)
    assert [(r.attr, r.valid_from, r.valid_to) for r in chain] == [
        ("a", T(1), T(2)), ("b", T(2), T(4)), ("c", T(4), None)]


def test_apply_vs_python_simulation_on_events(spark, sf_dir):
    """Real data: per-user latest event_type as the tracked attribute,
    first half of the stream bootstraps, second half applies; oracle
    is a direct python replay of the documented semantics."""
    ev = (load_table(spark, sf_dir, "events")
          .select(F.col("user_id").alias("k"),
                  F.col("event_type").alias("attr"),
                  F.col("ts").alias("effective_ts"),
                  "event_id"))
    # unique ts per key: keep the first event per (k, ts)
    ev = (ev.withColumn("__rn", F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"])
        .Window.partitionBy("k", "effective_ts")
        .orderBy("event_id"))).filter(F.col("__rn") == 1)
        .drop("__rn", "event_id"))
    rows = [(r.k, r.attr, r.effective_ts) for r in ev.collect()]
    rows.sort(key=lambda x: (x[0], x[2]))
    cut = sorted(t for _, _, t in rows)[len(rows) // 2]   # median ts
    first = [(k, a, t) for k, a, t in rows if t < cut]
    second = [(k, a, t) for k, a, t in rows if t >= cut]
    assert first and second

    def replay(seq):
        state: dict = {}
        for k, a, t in seq:
            vers = state.setdefault(k, [])
            if vers and vers[-1][0] == a:
                continue
            if vers:
                vers[-1] = (vers[-1][0], vers[-1][1], t)
            vers.append((a, t, None))
        return {(k, a, vf, vt, vt is None)
                for k, vers in state.items() for a, vf, vt in vers}

    dim = scd2_init(spark.createDataFrame(
        first, ["k", "attr", "effective_ts"]), ["k"])
    out = scd2_apply(dim, spark.createDataFrame(
        second, ["k", "attr", "effective_ts"]), ["k"])
    got = {(r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
           for r in out.collect()}
    assert got == replay(first + second)
    _invariants(out.collect())


def test_point_in_time_view(spark):
    ups = spark.createDataFrame(
        [("a", "v1", T(1)), ("a", "v2", T(5)), ("b", "x", T(3))],
        ["k", "attr", "effective_ts"])
    dim = scd2_init(ups, ["k"])
    at = {r.k: r.attr for r in scd2_at(dim, T(4)).collect()}
    assert at == {"a": "v1", "b": "x"}       # v2 not yet effective
    at5 = {r.k: r.attr for r in scd2_at(dim, T(5)).collect()}
    assert at5["a"] == "v2"                  # inclusive valid_from
    assert scd2_at(dim, T(1, 0)).count() == 1  # only a exists at T1


def test_enrich_time_travel_join(spark):
    from big_data_bowl___2023_spark.operators.scd import scd2_enrich

    dim = scd2_init(spark.createDataFrame(
        [("a", "v1", T(1)), ("a", "v2", T(5)), ("b", "x", T(3))],
        ["k", "attr", "effective_ts"]), ["k"])
    facts = spark.createDataFrame(
        [(1, "a", T(2)), (2, "a", T(5)), (3, "a", T(9)),
         (4, "b", T(1)),      # before b existed -> NULL attr
         (5, "c", T(4))],     # unknown key -> NULL attr
        ["fact_id", "k", "ts"])
    out = {r.fact_id: r.attr
           for r in scd2_enrich(facts, dim, ["k"], "ts").collect()}
    assert out == {1: "v1", 2: "v2", 3: "v2", 4: None, 5: None}
    # exactly one row per fact (non-overlapping versions)
    assert scd2_enrich(facts, dim, ["k"], "ts").count() == 5


def test_scd2_plan_shapes(spark):
    """init is ONE key shuffle (lag and lead share the window
    partition); apply over a materialized dimension stays at ≤4
    shuffles with the close-out aggregate broadcast; the enrich join
    is a hash join on the entity keys, never a nested loop."""
    import re

    from big_data_bowl___2023_spark.operators.scd import scd2_enrich
    from big_data_bowl___2023_spark.plans.explain import formatted_plan

    ups = spark.createDataFrame(
        [("a", "v1", T(1)), ("a", "v2", T(3)), ("b", "x", T(1))],
        ["k", "attr", "effective_ts"])

    def counts(df):
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        return (len(re.findall(r"\(\d+\) Exchange\b", plan)),
                len(re.findall(r"\(\d+\) BroadcastExchange\b", plan)))

    sh, _ = counts(scd2_init(ups, ["k"]))
    assert sh <= 1

    dim = scd2_init(ups, ["k"]).localCheckpoint()
    ups2 = spark.createDataFrame([("b", "y", T(5))],
                                 ["k", "attr", "effective_ts"])
    sh, bc = counts(scd2_apply(dim, ups2, ["k"]))
    assert sh <= 4 and bc >= 1

    facts = spark.createDataFrame([(1, "a", T(2))], ["f", "k", "ts"])
    counts(scd2_enrich(facts, dim, ["k"], "ts"))


def test_compare_cols_subset_keeps_payload(spark):
    """compare_cols narrows change detection only — non-compared
    payload columns are carried on every version, and apply must not
    churn versions on payload-only changes."""
    ups = spark.createDataFrame(
        [("a", "v1", "p1", T(1)),
         ("a", "v1", "p2", T(2)),    # payload-only change: suppressed
         ("a", "v2", "p3", T(3))],   # compared change: new version
        ["k", "attr", "extra", "effective_ts"])
    dim = scd2_init(ups, ["k"], compare_cols=["attr"])
    rows = sorted(dim.collect(), key=lambda r: r.valid_from)
    assert [r.extra for r in rows] == ["p1", "p3"]   # payload kept
    assert [(r.attr, r.valid_to is None) for r in rows] == [
        ("v1", False), ("v2", True)]

    ups2 = spark.createDataFrame(
        [("a", "v2", "p9", T(5)),    # payload-only: suppressed
         ("a", "v3", "p4", T(6))],
        ["k", "attr", "extra", "effective_ts"])
    out = scd2_apply(dim, ups2, ["k"], compare_cols=["attr"])
    rows2 = sorted(out.collect(), key=lambda r: r.valid_from)
    assert [(r.attr, r.extra) for r in rows2] == [
        ("v1", "p1"), ("v2", "p3"), ("v3", "p4")]
    _invariants(rows2)


def test_duplicate_ts_deterministic(spark):
    """Duplicate (key, ts) updates resolve deterministically: the
    smallest attribute tuple wins the slot, on any layout."""
    rows = [("a", "zzz", T(1)), ("a", "aaa", T(1)), ("a", "mmm", T(2))]
    a = scd2_init(spark.createDataFrame(
        rows, ["k", "attr", "effective_ts"]).repartition(5),
        ["k"]).collect()
    b = scd2_init(spark.createDataFrame(
        list(reversed(rows)), ["k", "attr", "effective_ts"])
        .repartition(2), ["k"]).collect()
    key = lambda rs: sorted((r.attr, r.valid_from, r.valid_to)
                            for r in rs)
    assert key(a) == key(b)
    assert key(a)[0][0] == "aaa"      # min tuple won the T(1) slot


def test_apply_quarantines_late_updates(spark):
    """scd2_apply_with_quarantine returns the dropped late rows in the
    update batch's own schema; the result dimension is identical to
    scd2_apply's."""
    from big_data_bowl___2023_spark.operators.scd import (
        scd2_apply_with_quarantine,
    )

    dim = scd2_init(spark.createDataFrame(
        [("a", "v1", T(3)), ("b", "x", T(4))],
        ["k", "attr", "effective_ts"]), ["k"])

    ups = spark.createDataFrame(
        [("a", "v2", T(5)),       # in-order: applies
         ("a", "v0", T(2)),       # late (ts < a's valid_from): drop
         ("b", "y", T(4)),        # late (ts == b's valid_from): drop
         ("c", "new", T(1))],     # unknown key: any ts admissible
        ["k", "attr", "effective_ts"])
    new_dim, quarantined = scd2_apply_with_quarantine(dim, ups, ["k"])

    assert quarantined.columns == ["k", "attr", "effective_ts"]
    assert {(r.k, r.attr, r.effective_ts)
            for r in quarantined.collect()} == {
        ("a", "v0", T(2)), ("b", "y", T(4))}

    got = {(r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
           for r in new_dim.collect()}
    assert got == {(r.k, r.attr, r.valid_from, r.valid_to,
                    r.is_current)
                   for r in scd2_apply(dim, ups, ["k"]).collect()}
    _invariants(new_dim.collect())
    assert ("c", "new", T(1), None, True) in got


def test_quarantine_empty_for_in_order_feed(spark):
    """Zero behavior change for in-order feeds: empty quarantine, and
    deduped duplicate-(key, ts) rows are NOT quarantined (redundant,
    not late)."""
    from big_data_bowl___2023_spark.operators.scd import (
        scd2_apply_with_quarantine,
    )

    dim = scd2_init(spark.createDataFrame(
        [("a", "v1", T(1))], ["k", "attr", "effective_ts"]), ["k"])
    ups = spark.createDataFrame(
        [("a", "v2", T(3)), ("a", "v9", T(3)),    # dup (key, ts)
         ("b", "x", T(2))],
        ["k", "attr", "effective_ts"])
    _, quarantined = scd2_apply_with_quarantine(dim, ups, ["k"])
    assert quarantined.count() == 0


def test_enrich_survives_fact_side_is_current(spark):
    """A fact table carrying its own is_current column keeps it intact
    through the time-travel enrich — only the dimension's bookkeeping
    column is dropped."""
    from big_data_bowl___2023_spark.operators.scd import scd2_enrich

    dim = scd2_init(spark.createDataFrame(
        [("a", "v1", T(1)), ("a", "v2", T(5))],
        ["k", "attr", "effective_ts"]), ["k"])
    facts = spark.createDataFrame(
        [(1, "a", T(2), True), (2, "a", T(6), False)],
        ["fact_id", "k", "ts", "is_current"])
    out = scd2_enrich(facts, dim, ["k"], "ts")
    assert out.columns.count("is_current") == 1
    got = {r.fact_id: (r.attr, r.is_current) for r in out.collect()}
    assert got == {1: ("v1", True), 2: ("v2", False)}


def test_null_timestamp_updates_quarantined(spark):
    """A NULL-timestamp update is a malformed CDC row: it must land in
    the quarantine (for known AND unknown keys), never vanish from
    both outputs or open a version at an unknown time."""
    from big_data_bowl___2023_spark.operators.scd import (
        scd2_apply_with_quarantine,
    )

    dim = scd2_init(spark.createDataFrame(
        [("a", "v1", T(3))], ["k", "attr", "effective_ts"]), ["k"])
    ups = spark.createDataFrame(
        [("a", "v2", None),       # known key, NULL ts
         ("z", "new", None),      # unknown key, NULL ts
         ("a", "v3", T(5))],      # well-formed
        "k string, attr string, effective_ts timestamp")
    new_dim, quar = scd2_apply_with_quarantine(dim, ups, ["k"])
    assert {(r.k, r.attr) for r in quar.collect()} == {
        ("a", "v2"), ("z", "new")}
    rows = {(r.k, r.attr, r.is_current) for r in new_dim.collect()}
    assert rows == {("a", "v1", False), ("a", "v3", True)}
    _invariants(new_dim.collect())
