"""Local replica of the driver's correctness gate.

Runs every registered query at a given SF dir on Spark AND its DuckDB
oracle, then compares row count, column names, and an order-insensitive
value hash. Use while iterating so oracle drift is caught before the
driver round runs.

Usage: python tools/verify_local.py [sf_dir] [name_filter ...]

``--extras`` additionally smoke-runs the bench-only operators
(bench.py `_extra_ops` — outside the 50-slot driver registry, so
rows-only: each must execute and return > 0 rows).

``--bench-gate`` appends an anchor-aware micro-bench: three cheap
representative queries (q1 wide agg, w1 window scan, minhash dedup)
run median-of-3 at sf0.1 through the noop sink and print their ratio
to the committed ``BASELINE_anchors.json`` quiet-run anchors — a plan
regression in the core paths is caught here, before the driver's
bench sweep is the first to see it. Ratios ≲ 1.5x are noise on a
shared VM; > 2x on a quiet machine means look at the plan.

Plan-fingerprint gate (always on): every registry query's physical
plan is summarized with ``plans.explain.plan_report`` and compared to
the committed ``PLAN_FINGERPRINTS.json`` — a NEW Exchange, a new
BroadcastNestedLoopJoin, or a new CartesianProduct in any query is a
FAIL (the tree-wide version of the per-query plan pytests; it also
catches job-shape drift like round 7's silent extra
materialization). Shrinking counts only print a re-baseline hint.
``--update-plans`` rewrites the fingerprint file from this run
(commit it with the plan-changing code). The gate compares only when
the sweep runs at the recorded sf_dir — plan shapes (broadcast
thresholds, file splits) are sf-specific.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def frame_hash(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(
        "|".join(norm_cell(v) for v in rec) for rec in df.itertuples(index=False)
    )
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


GATE_QUERIES = ("q1_pricing_summary", "w1_lag_delta",
                "dedup_minhash_lsh")


BENCH_GATE_SF_DIR = "/root/testdata/sf0.1"   # anchors are sf0.1-only


def bench_gate(spark, qs) -> None:
    """Median-of-3 micro-bench of GATE_QUERIES vs the committed
    quiet-run anchors; prints one line per query. Always runs at
    BENCH_GATE_SF_DIR — the anchors are only meaningful at sf0.1, so
    neither the sweep's positional sf_dir nor SPARK_GRAFT_SF_DIR
    (often pointed at sf0.01 for fast iteration) is honored here;
    grading sf0.01 data against sf0.1 anchors would print ~0.1x
    ratios that hide a real regression. Never raises: a gate problem
    must not turn an all-pass correctness sweep into a failure."""
    import json
    import statistics

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "BASELINE_anchors.json")
    if not os.path.exists(path):
        print("bench-gate: no BASELINE_anchors.json, skipping")
        return
    if not os.path.isdir(BENCH_GATE_SF_DIR):
        print(f"bench-gate: {BENCH_GATE_SF_DIR} missing, skipping")
        return
    try:
        with open(path) as fh:
            anchors_payload = json.load(fh)
        anchors = anchors_payload["anchors"]
    except Exception as e:    # noqa: BLE001 — corrupt file, not a fail
        print(f"bench-gate: unreadable anchors file ({e}), skipping")
        return
    print(f"\nbench-gate ({BENCH_GATE_SF_DIR}, median-of-3 vs "
          f"quiet anchors):")
    # calibration first: a drifted probe means the ratios below are
    # ambient load, not plan regressions (bench.py's r9 mechanism)
    try:
        import bench

        shots = bench._calibration_shots(spark, 3)
        cal = statistics.median(shots)
        a = anchors_payload.get("calibration", {}).get(
            "anchors", {}).get(
                str(spark.sparkContext.defaultParallelism))
        drift = f" = {cal / a:.2f}x quiet" if a else ""
        print(f"  calibration: {cal:.2f}s{drift}")
    except Exception as e:    # noqa: BLE001 — advisory only
        print(f"  calibration: unavailable ({e})")
    for name in GATE_QUERIES:
        if name not in qs or name not in anchors:
            continue
        try:
            qs[name](spark, BENCH_GATE_SF_DIR).write.format("noop") \
                .mode("overwrite").save()            # warm
            runs = []
            for _ in range(3):
                t0 = time.time()
                qs[name](spark, BENCH_GATE_SF_DIR).write \
                    .format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
        except Exception as e:    # noqa: BLE001 — report, don't fail
            print(f"  {name}: ERROR {str(e).splitlines()[0][:120]}")
            continue
        med = statistics.median(runs)
        a = anchors[name]
        print(f"  {name}: {med:.2f}s vs anchor {a:.2f}s "
              f"= {med / a:.2f}x")


FINGERPRINT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLAN_FINGERPRINTS.json")


def _query_universe() -> set | None:
    """Every name a fingerprint may legitimately carry: the 50
    registry queries plus the bench-only extras. None when the bench
    module can't load (the gate then keeps all previous entries
    rather than silently pruning)."""
    try:
        import bench

        from big_data_bowl___2023_spark import registry

        return (set(registry.all_queries()) | set(bench._extra_ops())
                | {"stream_curation_ingest__batch_plan",
                   "stream_curation_ingest_audit__batch_plan"})
    except Exception:
        return None


def check_plan_fingerprints(got: dict, sf_dir: str,
                            update: bool) -> int:
    """Compare this sweep's plan_report summaries against the
    committed baseline; returns the number of regressed queries.
    More Exchanges / BNL joins, or a new cartesian = regression.
    Fingerprints are mode-specific: a durable-pin sweep keeps the
    lineage that localCheckpoint truncates away, so its plans
    legitimately show more nodes — compare only within the recorded
    pin mode (like sf_dir). Bench-only extras (bench._extra_ops) are
    fingerprinted too when an ``--extras`` sweep runs them (round-9
    task: the bench headliners used to be guarded only by per-module
    pytests); a sweep without extras judges/updates only the names it
    ran, so a registry-only re-baseline never drops the bench
    entries."""
    import json

    from big_data_bowl___2023_spark.session import durable_pins_default

    mode = "durable" if durable_pins_default() else "default"
    if update:
        # per-MODE slot inside one file: a durable-mode re-baseline
        # must never clobber the default-mode baseline (or vice
        # versa) — both sweeps stay gated. Within the mode slot,
        # names NOT run this sweep are kept (pruned only when they
        # left the query universe entirely), so registry-only and
        # extras sweeps can each re-baseline their own subset.
        data = {"sf_dir": sf_dir, "modes": {}}
        if os.path.exists(FINGERPRINT_PATH):
            try:
                with open(FINGERPRINT_PATH) as fh:
                    prev = json.load(fh)
                if prev.get("sf_dir") == sf_dir:
                    data["modes"] = dict(prev.get("modes") or {})
            except Exception:
                pass
        universe = _query_universe()
        merged = {k: v for k, v in (data["modes"].get(mode) or {}).items()
                  if universe is None or k in universe}
        merged.update(got)
        data["modes"][mode] = merged
        with open(FINGERPRINT_PATH, "w") as fh:
            json.dump(data, fh, indent=1, sort_keys=True)
        print(f"plan-gate: wrote {len(got)} fingerprints "
              f"({len(merged)} total, {mode} mode) to "
              f"{FINGERPRINT_PATH}")
        return 0
    if not os.path.exists(FINGERPRINT_PATH):
        print("plan-gate: no PLAN_FINGERPRINTS.json "
              "(run --update-plans to create), skipping")
        return 0
    with open(FINGERPRINT_PATH) as fh:
        base = json.load(fh)
    if base.get("sf_dir") != sf_dir:
        print(f"plan-gate: fingerprints recorded at "
              f"{base.get('sf_dir')}, sweep ran {sf_dir}; skipping")
        return 0
    base = (base.get("modes") or {}).get(mode)
    if base is None:
        print(f"plan-gate: no committed fingerprints for {mode} "
              f"mode (run --update-plans in this mode), skipping")
        return 0
    n_regress = n_better = n_new = 0
    for name, rep in sorted(got.items()):
        b = base.get(name)
        if b is None:
            n_new += 1
            continue
        bad = []
        if rep["n_exchanges"] > b["n_exchanges"]:
            bad.append(f"exchanges {b['n_exchanges']}->"
                       f"{rep['n_exchanges']}")
        if rep["n_bnl_joins"] > b["n_bnl_joins"]:
            bad.append(f"bnl_joins {b['n_bnl_joins']}->"
                       f"{rep['n_bnl_joins']}")
        if rep["has_cartesian"] and not b["has_cartesian"]:
            bad.append("new CartesianProduct")
        if bad:
            n_regress += 1
            print(f"PLAN-REGRESS {name}: {', '.join(bad)}")
        elif (rep["n_exchanges"] < b["n_exchanges"]
              or rep["n_bnl_joins"] < b["n_bnl_joins"]):
            n_better += 1
    note = f", {n_new} unbaselined" if n_new else ""
    print(f"plan-gate: {len(got)} checked, {n_regress} regressed, "
          f"{n_better} improved (re-baseline with --update-plans)"
          f"{note}")
    return n_regress


def main() -> int:
    flags = ("--extras", "--bench-gate", "--update-plans")
    args = [a for a in sys.argv[1:] if a not in flags]
    with_extras = "--extras" in sys.argv[1:]
    with_gate = "--bench-gate" in sys.argv[1:]
    update_plans = "--update-plans" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    name_filter = args[1:]

    from big_data_bowl___2023_spark import registry
    from big_data_bowl___2023_spark.session import get_spark

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    if with_extras:
        import bench
        qs.update(bench._extra_ops())
    if name_filter:
        qs = {k: v for k, v in qs.items()
              if any(f in k for f in name_filter)}

    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from big_data_bowl___2023_spark.plans.explain import plan_report

    fingerprints: dict[str, dict] = {}
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            # captured here (the plan), recorded below only once the
            # query actually PASSES — a failing query's plan must
            # never become (or be judged against) the baseline.
            # Bench-only extras are fingerprinted too (their names
            # are in qs only under --extras), so the bench headliner
            # compositions are plan-gated, not just pytest-guarded.
            rep = plan_report(df)
            sdf = df.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            fingerprints[name] = rep
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sn, scols, sh = frame_hash(sdf)
        on, ocols, oh = frame_hash(odf)
        ok = (sn, scols, sh) == (on, ocols, oh)
        status = "pass" if ok else "FAIL"
        if ok:
            n_pass += 1
            fingerprints[name] = rep
        else:
            n_fail += 1
        print(f"{status} {name}: spark({sn},{sh}) vs oracle({on},{oh}) "
              f"({time.time()-t0:.1f}s)")
        if not ok:
            if scols != ocols:
                print(f"  cols spark={scols} oracle={ocols}")
            elif sn == on:
                merged = sdf[sorted(sdf.columns)].copy()
                omerged = odf[sorted(odf.columns)].copy()
                srows = sorted("|".join(norm_cell(v) for v in r)
                               for r in merged.itertuples(index=False))
                orows = sorted("|".join(norm_cell(v) for v in r)
                               for r in omerged.itertuples(index=False))
                diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
                for a, b in diffs[:3]:
                    print(f"  spark : {a}\n  oracle: {b}")
    if with_extras and not name_filter:
        # representative micro-batch plans for the two EAGER loop
        # extras (VERDICT r16 #7): the loops execute at call time, so
        # the gate never saw their per-batch plan shape — fingerprint
        # the lazy batch-1 frames bench._stream_batch_plan_frames
        # constructs against a real bootstrap state. Rows are already
        # exercised by the extras' own runs above; this adds the
        # plan-shape gate.
        import shutil

        try:
            frames, tmp = bench._stream_batch_plan_frames(spark,
                                                          sf_dir)
            try:
                for pname, pdf in sorted(frames.items()):
                    fingerprints[pname] = plan_report(pdf)
                    print(f"plan-only {pname}: fingerprinted")
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL stream batch plans: {e}")
            n_fail += 1

    if name_filter and not update_plans:
        # partial sweeps never judge the tree-wide baseline
        print("plan-gate: filtered sweep, skipping")
    elif name_filter and update_plans:
        # ...but with an explicit --update-plans they may RE-BASELINE
        # their own subset: check_plan_fingerprints merges per name,
        # keeping every name not run this sweep (the documented
        # subset-re-baseline semantics — how a NEW bench extra gets
        # its first fingerprint without a full-sweep rewrite).
        # ONLY at the recorded sf_dir: the updater resets the whole
        # file on an sf_dir change (correct for a full re-baseline),
        # which from a filtered sweep would wipe every other
        # committed fingerprint (review r13).
        import json

        recorded_sf = None
        if os.path.exists(FINGERPRINT_PATH):
            try:
                with open(FINGERPRINT_PATH) as fh:
                    recorded_sf = json.load(fh).get("sf_dir")
            except Exception:
                pass
        if recorded_sf is not None and recorded_sf != sf_dir:
            print(f"plan-gate: baseline recorded at {recorded_sf}, "
                  f"filtered sweep ran {sf_dir} — refusing a "
                  f"subset rewrite that would wipe it; skipping")
        elif fingerprints:
            check_plan_fingerprints(fingerprints, sf_dir, True)
    elif fingerprints:
        n_fail += check_plan_fingerprints(fingerprints, sf_dir,
                                          update_plans)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if with_gate:
        gate_qs = registry.all_queries()
        try:
            import bench
            gate_qs.update(bench._extra_ops())
        except Exception:
            pass
        bench_gate(spark, gate_qs)
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
