"""session.pin durability modes (round-7 verdict #1 / round-8 task 1).

pin() is the ONE materialization boundary the pipelines use; these
tests pin (a) the mode mechanics — local checkpoint vs DISK_ONLY
persist vs reliable checkpoint, selected per call or ambiently via
durable_pins()/SPARK_GRAFT_DURABLE_PINS — (b) the promised value
equivalence: the same pipeline run in fast-local mode and in
preemption-safe durable mode produces identical rows, and (c) the
source-hygiene rule that no engine module calls localCheckpoint()
directly (so the durability switch really governs every fan-out).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark import session as S
from big_data_bowl___2023_spark.dedup.clusters import connected_components
from big_data_bowl___2023_spark.operators.heavy import heavy_hitters
from big_data_bowl___2023_spark.pipelines import fixtures, nfl

PKG_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "big_data_bowl___2023_spark")


# ------------------------------------------------------------ mechanics

def test_pin_default_is_local_checkpoint(spark):
    df = spark.range(100)
    out = S.pin(df)
    assert out.count() == 100
    # localCheckpoint truncates lineage: the plan bottoms out in a
    # materialized RDD scan, not the Range source
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "Range" not in plan


def test_pin_durable_is_disk_only_persist(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = S.pin(df, durable=True)
    lvl = out.storageLevel
    assert lvl.useDisk and not lvl.useMemory
    # lineage kept: a lost block is recomputable from source
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "Range" in plan
    assert out.count() == 100
    out.unpersist()


def test_pin_durable_truncate_is_reliable_checkpoint(spark):
    out = S.pin(spark.range(50), durable=True, truncate=True)
    assert spark.sparkContext.getCheckpointDir() is not None
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "Range" not in plan       # truncated
    assert out.count() == 50


def test_durable_pins_context_scopes_the_default(spark):
    df = spark.range(10)
    with S.durable_pins(True):
        inner = S.pin(df)
        assert inner.storageLevel.useDisk
        with S.durable_pins(False):
            assert not S.durable_pins_default()
        assert S.durable_pins_default()
        # None = leave ambient mode alone (entry-point forwarding)
        with S.durable_pins(None):
            assert S.durable_pins_default()
        inner.unpersist()
    assert not S.durable_pins_default()


def test_durable_pins_scope_is_per_thread():
    """The mode rides a ContextVar: a concurrent pipeline thread
    (foreachBatch worker, parallel CV fit) must not see — or clobber
    — another thread's durable scope (the global set/restore race the
    per-write partitionOverwriteMode fix closes for writer confs)."""
    import threading

    seen = {}

    def other_thread():
        seen["other"] = S.durable_pins_default()
        with S.durable_pins(True):
            pass

    with S.durable_pins(True):
        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
        assert S.durable_pins_default()     # unclobbered by the thread
    assert seen["other"] is False           # scope did not leak over


def test_durable_truncate_refuses_clusterlike_master_without_dir():
    """On a non-local master with no checkpoint dir, a durable
    truncate pin must raise (a driver-local temp dir would scatter
    non-shared blocks across executors — the opposite of durable)."""
    class FakeSC:
        master = "spark://cluster:7077"

        def getCheckpointDir(self):
            return None

    class FakeSession:
        sparkContext = FakeSC()

    class FakeDF:
        sparkSession = FakeSession()

        def localCheckpoint(self):
            return self

    with pytest.raises(RuntimeError, match="SHARED checkpoint dir"):
        S.pin(FakeDF(), durable=True, truncate=True)


# -------------------------------------------------- value equivalence

def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def nfl_tables(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("pin_fixtures"))
    out = {}
    for name, sdf in fixtures.to_spark(spark, fixtures.generate()).items():
        path = f"{out_dir}/{name}.parquet"
        sdf.write.mode("overwrite").parquet(path)
        out[name] = spark.read.parquet(path)
    return out


def test_qb_set_point_identical_under_both_modes(spark, nfl_tables):
    """The docstring's promised equivalence, on the cheap pipeline
    subset that exercises pin(truncate=True) fan-out: Q1→Q2→Q3."""
    def run():
        main_df = nfl.build_main_df(
            nfl_tables["tracking"], nfl_tables["pff_scouting"],
            nfl_tables["plays"], nfl_tables["players"])
        start, end = nfl.play_bounds(main_df)
        return nfl.qb_set_point(main_df, start, end)

    with S.durable_pins(False):
        fast = _rows(run())
    with S.durable_pins(True):
        durable = _rows(run())
    assert fast == durable
    assert len(fast) > 0


def test_entry_point_threads_durable_kwarg(spark, nfl_tables):
    """run_relational_pipeline(durable=True) must produce the same
    rushers_final as the default mode — the full-pipeline leg of the
    equivalence (every pin flavor: truncate fan-outs + ML-free)."""
    args = (nfl_tables["tracking"], nfl_tables["pff_scouting"],
            nfl_tables["plays"], nfl_tables["players"])
    fast = nfl.run_relational_pipeline(*args)["rushers_final"]
    durable = nfl.run_relational_pipeline(*args, durable=True)[
        "rushers_final"]
    assert _rows(fast) == _rows(durable)


def test_iterative_and_persist_pins_equivalent(spark):
    """connected_components (pin truncate in a loop → reliable
    checkpoint under durable) and exact_heavy_hitters (plain pin →
    DISK_ONLY persist under durable) both value-match across modes."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)] + [(1, 3), (5, 7), (0, 38)],
        "doc_a long, doc_b long")
    keys = spark.createDataFrame(
        [(k,) for k in "aaaaabbbbbbbbccd"], "k string")
    with S.durable_pins(False):
        cc_fast = _rows(connected_components(pairs))
        hh_fast = _rows(heavy_hitters(keys, "k", 0.2))
    with S.durable_pins(True):
        cc_dur = _rows(connected_components(pairs))
        hh_dur = _rows(heavy_hitters(keys, "k", 0.2))
    assert cc_fast == cc_dur and len(cc_fast) > 0
    assert hh_fast == hh_dur and len(hh_fast) > 0


# ------------------------------------------------------ source hygiene

def test_no_direct_localcheckpoint_outside_session():
    """Every fan-out must route through session.pin so the durability
    switch governs the whole engine; a direct localCheckpoint() call
    anywhere else silently re-opens the executor-loss hole."""
    offenders = []
    for root, _dirs, files in os.walk(PKG_ROOT):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            with open(path) as fh:
                for ln, line in enumerate(fh, 1):
                    if ".localCheckpoint(" in line \
                            and not line.lstrip().startswith("#"):
                        if os.path.basename(path) == "session.py":
                            continue
                        offenders.append(f"{path}:{ln}")
    assert not offenders, (
        "direct localCheckpoint() calls outside session.pin: "
        + ", ".join(offenders))
