"""PSI drift detection: python oracle parity, identity/shift
behavior, NULL-bucket drift, and approx-edges mode."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.drift import (
    drifted_columns,
    psi_report,
)
from big_data_bowl___2023_spark.sources.io import load_table


def _py_psi(ref_vals, cur_vals, n_buckets=10, eps=1e-6):
    """Direct python recompute: exact interpolated percentile edges
    from the reference, same bucket rule, same smoothing."""
    import statistics

    xs = sorted(v for v in ref_vals if v is not None)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    raw = [statistics.quantiles(xs, n=n_buckets,
                                method="inclusive")[i - 1]
           for i in range(1, n_buckets)] if xs else []
    edges = []
    for e in raw:
        if not edges or e > edges[-1]:
            edges.append(float(e))

    def bucket(v):
        if v is None:
            return -1
        for i, e in enumerate(edges):
            if v <= e:
                return i
        return len(edges)

    def shares(vals):
        c: dict = {}
        for v in vals:
            b = bucket(v)
            c[b] = c.get(b, 0) + 1
        return c, len(vals)

    cr, nr = shares(ref_vals)
    cc, nc = shares(cur_vals)
    psi = 0.0
    for b in set(cr) | set(cc):
        p = max(cr.get(b, 0) / nr, eps)
        q = max(cc.get(b, 0) / nc, eps)
        psi += (q - p) * math.log(q / p)
    return round(psi, 6)


def test_psi_vs_python_oracle_on_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    got = {r.column: r.psi
           for r in psi_report(ref, cur, ["value"]).collect()}
    want = _py_psi([r.value for r in ref.select("value").collect()],
                   [r.value for r in cur.select("value").collect()])
    assert got["value"] == want
    # even/odd halves of the same distribution: stable
    assert got["value"] < 0.1


def test_identity_and_planted_shift(spark):
    import random

    rnd = random.Random(7)
    base = [(i, rnd.gauss(0.0, 1.0)) for i in range(4000)]
    shifted = [(i, v + 2.0) for i, v in base]      # two-sigma shift
    ref = spark.createDataFrame(base, ["id", "x"])
    same = spark.createDataFrame(base, ["id", "x"])
    cur = spark.createDataFrame(shifted, ["id", "x"])

    psi_same = psi_report(ref, same, ["x"]).first().psi
    psi_shift = psi_report(ref, cur, ["x"]).first().psi
    assert psi_same == 0.0
    assert psi_shift > 1.0                          # massive drift
    assert drifted_columns(ref, cur, ["x"]) == ["x"]
    assert drifted_columns(ref, same, ["x"]) == []


def test_null_bucket_counts_as_drift(spark):
    ref = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(1000)], ["id", "x"])
    cur = spark.createDataFrame(
        [(i, None if i % 2 else float(i % 10)) for i in range(1000)],
        "id long, x double")
    psi = psi_report(ref, cur, ["x"]).first().psi
    assert psi > 0.25     # half the column going NULL is a red alert


def test_approx_edges_mode(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    exact = psi_report(ref, cur, ["value"]).first().psi
    approx = psi_report(ref, cur, ["value"],
                        exact_edges=False).first().psi
    assert abs(exact - approx) < 0.05     # same verdict either way


def test_categorical_psi_source_mix(spark, sf_dir):
    from big_data_bowl___2023_spark.operators.drift import (
        psi_report_categorical,
    )

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    same = ev.filter(F.col("event_id") % 2 == 1)
    # identical mix: stable
    psi = psi_report_categorical(ref, same,
                                 ["event_type"]).first().psi
    assert psi < 0.1
    # planted shift: drop one event type entirely from current
    etype = ev.groupBy("event_type").count() \
        .orderBy(F.desc("count")).first().event_type
    cur = same.filter(F.col("event_type") != etype)
    psi2 = psi_report_categorical(ref, cur,
                                  ["event_type"]).first().psi
    assert psi2 > 0.25

    # python oracle parity on the shifted pair
    def py(refv, curv):
        from collections import Counter
        top = sorted(Counter(v for v in refv if v is not None).items(),
                     key=lambda kv: (-kv[1], kv[0]))[:50]
        tops = {k for k, _ in top}

        def b(v):
            if v is None:
                return "__null__"
            return v if v in tops else "__other__"
        cr, cc = Counter(map(b, refv)), Counter(map(b, curv))
        nr, nc = sum(cr.values()), sum(cc.values())
        s = 0.0
        for k in set(cr) | set(cc):
            p = max(cr.get(k, 0) / nr, 1e-6)
            q = max(cc.get(k, 0) / nc, 1e-6)
            s += (q - p) * math.log(q / p)
        return round(s, 6)

    refv = [r.event_type for r in ref.select("event_type").collect()]
    curv = [r.event_type for r in cur.select("event_type").collect()]
    assert psi2 == py(refv, curv)


def test_streaming_drift_monitor_batch_parity(spark, sf_dir, tmp_path):
    """The streaming share table over a file stream equals the batch
    shares, and psi_from_shares reproduces psi_report exactly —
    batch/stream definitional consistency."""
    import uuid

    from big_data_bowl___2023_spark.operators.drift import (
        _all_edges,
        _all_shares,
        bucket_shares_stream,
        psi_from_shares,
        psi_report,
    )

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)

    edges = _all_edges(ref, ["value"], 10, True)
    ref_sh = _all_shares(ref, edges)

    # stream the current snapshot from files
    path = str(tmp_path / "cur")
    cur.coalesce(2).write.parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    name = f"q_{uuid.uuid4().hex[:12]}"
    q = (bucket_shares_stream(stream, edges).writeStream
         .format("memory").queryName(name).outputMode("complete")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got_rows = [(r.column, r.bucket, r["count"])
                for r in spark.table(name).collect()]

    # share parity with the batch scan
    assert {(c, b): n for c, b, n in got_rows} == _all_shares(cur,
                                                              edges)
    # PSI parity with the batch report
    psi_stream = psi_from_shares(ref_sh, got_rows)["value"]
    psi_batch = psi_report(ref, cur, ["value"]).first().psi
    assert psi_stream == psi_batch


def test_schema_diff(spark):
    from big_data_bowl___2023_spark.operators.drift import schema_diff

    ref = spark.createDataFrame([(1, "x", 2.0)], ["a", "b", "c"])
    cur = spark.createDataFrame([(1, 5, True)], ["a", "c", "d"])
    d = schema_diff(ref, cur)
    assert d == {"added": ["d"], "removed": ["b"],
                 "retyped": [("c", "double", "bigint")]}
    assert schema_diff(ref, ref) == {"added": [], "removed": [],
                                     "retyped": []}


def test_streaming_categorical_shares_parity(spark, sf_dir, tmp_path):
    import uuid

    from big_data_bowl___2023_spark.operators.drift import (
        category_bins,
        category_shares_stream,
        psi_from_shares,
        psi_report_categorical,
    )

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    bins = category_bins(ref, ["event_type"])

    path = str(tmp_path / "cur")
    cur.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(
        spark.read.parquet(path).schema).parquet(path)
    name = f"q_{uuid.uuid4().hex[:12]}"
    q = (category_shares_stream(stream, bins).writeStream
         .format("memory").queryName(name).outputMode("complete")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = [(r.column, r.bucket, r["count"])
           for r in spark.table(name).collect()]
    # PSI from the streamed shares == batch categorical report
    ref_shares = {("event_type", b): n for (_, b, n) in
                  [(r.column, r.bucket, r["count"]) for r in
                   category_shares_stream(ref, bins)
                   .collect()]}
    psi_stream = psi_from_shares(ref_shares, got)["event_type"]
    psi_batch = psi_report_categorical(
        ref, cur, ["event_type"]).first().psi
    assert psi_stream == psi_batch


def test_drift_artifacts_round_trip(spark, sf_dir, tmp_path):
    """Frozen reference bins persist through the Hadoop-FS JSON
    artifact bit-exactly; a monitor rebuilt from the artifact
    produces identical shares."""
    from big_data_bowl___2023_spark.operators.drift import (
        _all_edges,
        _all_shares,
        category_bins,
        load_drift_artifacts,
        save_drift_artifacts,
    )

    ev = load_table(spark, sf_dir, "events")
    edges = _all_edges(ev, ["value"], 10, True)
    bins = category_bins(ev, ["event_type"])
    path = str(tmp_path / "drift_ref.json")
    save_drift_artifacts(spark, path, edges, bins)
    edges2, bins2 = load_drift_artifacts(spark, path)
    assert edges2 == edges and bins2 == bins
    assert _all_shares(ev, edges2) == _all_shares(ev, edges)


def test_nan_gets_its_own_bucket(spark):
    """Float NaN routes to bucket −2 — a NaN-rate rise must read as
    its own drift, not as high-value drift in the top bucket."""
    from big_data_bowl___2023_spark.operators.drift import (
        _all_edges,
        _all_shares,
    )

    ref = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(1000)], ["id", "x"])
    cur = spark.createDataFrame(
        [(i, float("nan") if i % 2 else float(i % 10))
         for i in range(1000)], ["id", "x"])
    edges = _all_edges(ref, ["x"], 10, True)
    sh = _all_shares(cur, edges)
    assert sh[("x", -2)] == 500                 # NaN bucket, exact
    # the top value bucket did NOT absorb the NaNs: value buckets sum
    # to exactly the 500 real values
    assert sum(n for (c, b), n in sh.items() if b >= 0) == 500

    # exact python-oracle parity with NaN routing mirrored
    psi = psi_report(ref, cur, ["x"]).first().psi

    def bucket(v):
        if v is None:
            return -1
        if math.isnan(v):
            return -2
        es = edges["x"]
        for i, e in enumerate(es):
            if v <= e:
                return i
        return len(es)

    refv = [r.x for r in ref.select("x").collect()]
    curv = [r.x for r in cur.select("x").collect()]

    def shares(vals):
        c: dict = {}
        for v in vals:
            c[bucket(v)] = c.get(bucket(v), 0) + 1
        return c

    cr, cc = shares(refv), shares(curv)
    want = 0.0
    for b in set(cr) | set(cc):
        p = max(cr.get(b, 0) / 1000, 1e-6)
        q = max(cc.get(b, 0) / 1000, 1e-6)
        want += (q - p) * math.log(q / p)
    assert psi == round(want, 6)
    assert psi > 0.25        # half the column going NaN is a red alert


def test_bin_counts_report_observed_bins(spark):
    """n_buckets_used / n_categories_used both count bins actually
    observed in the share tables — NULL/NaN/__other__ included only
    when populated (the two reports use one convention)."""
    from big_data_bowl___2023_spark.operators.drift import (
        psi_report_categorical,
    )

    ref = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(1000)], ["id", "x"])
    r = psi_report(ref, ref, ["x"]).first()
    assert r.n_buckets_used == 10               # no NULL/NaN observed
    cur = spark.createDataFrame(
        [(i, None if i % 2 else float(i % 10)) for i in range(1000)],
        "id long, x double")
    r2 = psi_report(ref, cur, ["x"]).first()
    assert r2.n_buckets_used == 11              # + the NULL bin

    cat_ref = spark.createDataFrame(
        [(i, "ab"[i % 2]) for i in range(100)], ["id", "c"])
    rc = psi_report_categorical(cat_ref, cat_ref, ["c"]).first()
    assert rc.n_categories_used == 2            # no __other__/__null__
    cat_cur = spark.createDataFrame(
        [(i, None if i % 4 == 0 else "abz"[i % 3])
         for i in range(100)], "id long, c string")
    rc2 = psi_report_categorical(cat_ref, cat_cur, ["c"]).first()
    assert rc2.n_categories_used == 4           # a, b, __other__, __null__


def test_exact_edges_auto_selects_by_reference_size(spark, monkeypatch):
    """Default exact_edges=None picks exact percentile edges for small
    references and the approxQuantile scale path above the threshold —
    the 100 TB default is never the full-materialization aggregate."""
    from big_data_bowl___2023_spark.operators import drift

    ref = spark.createDataFrame(
        [(i, float(i)) for i in range(2000)], ["id", "x"])
    cur = spark.createDataFrame(
        [(i, float(i) + 100.0) for i in range(2000)], ["id", "x"])

    auto_small = psi_report(ref, cur, ["x"]).first().psi
    exact = psi_report(ref, cur, ["x"], exact_edges=True).first().psi
    assert auto_small == exact                  # small ref -> exact

    monkeypatch.setattr(drift, "EXACT_EDGES_MAX_ROWS", 100)
    auto_big = psi_report(ref, cur, ["x"]).first().psi
    approx = psi_report(ref, cur, ["x"], exact_edges=False).first().psi
    assert auto_big == approx                   # big ref -> approx


def test_grouped_psi_per_source(spark):
    """psi_report_grouped: per-group PSI against SHARED whole-reference
    edges — one group drifting is visible even when the global mix is
    engineered to look stable; python oracle parity per group."""
    import random

    from big_data_bowl___2023_spark.operators.drift import (
        _all_edges,
        psi_report_grouped,
    )

    rnd = random.Random(13)
    # two sources, same base distribution in the reference
    ref_rows = [(("s1" if i % 2 else "s2"), rnd.gauss(0.0, 1.0))
                for i in range(4000)]
    # current: s1 shifts +2 sigma, s2 shifts -2 sigma — the GLOBAL
    # mean is unchanged, only the grouped report can see it
    cur_rows = [(g, v + (2.0 if g == "s1" else -2.0))
                for g, v in ref_rows]
    ref = spark.createDataFrame(ref_rows, ["src", "x"])
    cur = spark.createDataFrame(cur_rows, ["src", "x"])

    rep = {(r.src, r.column): (r.psi, r.n_buckets_used)
           for r in psi_report_grouped(ref, cur, ["x"], "src")
           .collect()}
    assert set(rep) == {("s1", "x"), ("s2", "x")}
    assert rep[("s1", "x")][0] > 1.0 and rep[("s2", "x")][0] > 1.0

    # the global (ungrouped) report on the same pair is much tamer
    # than either group's drift — the signal the grouped report adds
    global_psi = psi_report(ref, cur, ["x"]).first().psi
    assert global_psi < min(rep[("s1", "x")][0], rep[("s2", "x")][0])

    # python oracle on one group, using the SHARED reference edges
    edges = _all_edges(ref, ["x"], 10, True)["x"]

    def bucket(v):
        for i, e in enumerate(edges):
            if v <= e:
                return i
        return len(edges)

    def psi_of(refv, curv):
        cr: dict = {}
        cc: dict = {}
        for v in refv:
            cr[bucket(v)] = cr.get(bucket(v), 0) + 1
        for v in curv:
            cc[bucket(v)] = cc.get(bucket(v), 0) + 1
        s = 0.0
        for b in set(cr) | set(cc):
            p = max(cr.get(b, 0) / len(refv), 1e-6)
            q = max(cc.get(b, 0) / len(curv), 1e-6)
            s += (q - p) * math.log(q / p)
        return round(s, 6)

    for g in ("s1", "s2"):
        want = psi_of([v for gg, v in ref_rows if gg == g],
                      [v for gg, v in cur_rows if gg == g])
        assert rep[(g, "x")][0] == want


def test_grouped_psi_appearing_vanishing_source(spark):
    """A source present in only one snapshot is scored against the
    smoothed-empty other side — it must appear in the report with a
    large PSI, not vanish."""
    from big_data_bowl___2023_spark.operators.drift import (
        psi_report_grouped,
    )

    ref = spark.createDataFrame(
        [("old", float(i % 7)) for i in range(500)], ["src", "x"])
    cur = spark.createDataFrame(
        [("new", float(i % 7)) for i in range(500)], ["src", "x"])
    rep = {r.src: r.psi
           for r in psi_report_grouped(ref, cur, ["x"], "src")
           .collect()}
    assert set(rep) == {"old", "new"}
    assert rep["old"] > 1.0 and rep["new"] > 1.0


def test_grouped_psi_degenerates_to_ungrouped(spark, sf_dir):
    """With one group, psi_report_grouped must equal psi_report —
    both bucket on the same whole-reference edges, so the grouped
    report is a strict refinement, not a different statistic."""
    from big_data_bowl___2023_spark.operators.drift import (
        psi_report_grouped,
    )

    ev = load_table(spark, sf_dir, "events") \
        .withColumn("g", F.lit("all"))
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    grouped = psi_report_grouped(ref, cur, ["value"], "g").first()
    flat = psi_report(ref, cur, ["value"]).first()
    assert grouped.psi == flat.psi
    assert grouped.n_buckets_used == flat.n_buckets_used


def test_grouped_psi_rejects_id_grouping(spark):
    """An id-cardinality group_col fails fast instead of collecting
    millions of driver-side share rows."""
    import pytest

    from big_data_bowl___2023_spark.operators.drift import (
        psi_report_grouped,
    )

    df = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(500)], ["id", "x"])
    with pytest.raises(ValueError, match="max_groups"):
        psi_report_grouped(df, df, ["x"], "id", max_groups=100)


def test_streaming_shares_route_nan_like_batch(spark, tmp_path):
    """The streaming bucket chain gives float NaN the same dedicated
    bucket (−2) as the batch scan — stream/batch definitional
    consistency extends to the NaN bin."""
    import uuid

    from big_data_bowl___2023_spark.operators.drift import (
        _all_edges,
        _all_shares,
        bucket_shares_stream,
    )

    ref = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(200)], ["id", "x"])
    cur = spark.createDataFrame(
        [(i, float("nan") if i % 4 == 0 else float(i % 10))
         for i in range(200)], ["id", "x"])
    edges = _all_edges(ref, ["x"], 5, True)

    path = str(tmp_path / "cur")
    cur.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(
        spark.read.parquet(path).schema).parquet(path)
    name = f"q_{uuid.uuid4().hex[:12]}"
    q = (bucket_shares_stream(stream, edges).writeStream
         .format("memory").queryName(name).outputMode("complete")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.column, r.bucket): r["count"]
           for r in spark.table(name).collect()}
    assert got == _all_shares(cur, edges)
    assert got[("x", -2)] == 50
