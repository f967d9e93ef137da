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
