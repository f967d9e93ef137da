"""Isolated certified-quiet probe for one bench query (the j3
adjudication recipe, verdict r10 #6 / r11 #2): fresh JVM, the
fixed-work calibration probe before and after, the target query as a
median-of-5 noop-sink sweep. Prints one JSON line with the
calibration median, its drift against the committed quiet anchor for
this thread count, and the query's shots/median — "certified quiet"
when drift is ~≤ 1.07 (the round-11 adjudication band).

Usage: SPARK_GRAFT_CPUS=16 python tools/quiet_probe.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402
from big_data_bowl___2023_spark import registry  # noqa: E402
from big_data_bowl___2023_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/testdata/sf0.1"
    qs = dict(registry.all_queries())
    qs.update(bench._extra_ops())
    if name not in qs:
        raise SystemExit(f"unknown query {name!r}")
    spark = get_spark("quiet_probe")

    # warm the JVM/codegen path once (the bench convention)
    qs[name](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()

    cal = bench._calibration_shots(spark, shots=3)
    shots = []
    for _ in range(5):
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        shots.append(round(time.time() - t0, 3))
    cal += bench._calibration_shots(spark, shots=3)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BASELINE_anchors.json")) as fh:
        payload = json.load(fh)
    par = str(spark.sparkContext.defaultParallelism)
    cal_anchor = payload.get("calibration", {}) \
        .get("anchors", {}).get(par)
    cal_median = round(statistics.median(cal), 3)
    drift = (round(cal_median / cal_anchor, 3)
             if cal_anchor else None)
    anchor = payload.get("anchors", {}).get(name)
    median = round(statistics.median(shots), 3)
    print(json.dumps({
        "query": name, "sf_dir": sf_dir, "parallelism": int(par),
        "cal_shots": cal, "cal_median": cal_median,
        "cal_anchor": cal_anchor, "drift": drift,
        "shots": shots, "median": median, "anchor": anchor,
        "ratio": round(median / anchor, 3) if anchor else None,
        "ratio_norm": (round(median / anchor / drift, 3)
                       if anchor and drift else None),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
