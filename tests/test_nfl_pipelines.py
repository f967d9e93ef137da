"""End-to-end tests for the Q1–Q10 composite pipelines on the
deterministic NFL fixtures (SURVEY.md §5.2.2). The key correctness
check re-derives the %PZ/s metric for known plays by hand from the
fixture's closed-form kinematics.

Spark actions are expensive (stage scheduling dominates on toy data),
so the module fixtures materialize each output exactly once and the
tests assert on collected rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.pipelines import fixtures, nfl


@pytest.fixture(scope="module")
def nfl_tables(spark, tmp_path_factory):
    """Generate → write parquet → read back: plans scan files (like
    production) instead of embedding a Python-local relation that
    re-serializes on every action."""
    out_dir = str(tmp_path_factory.mktemp("nfl_fixtures"))
    frames = fixtures.generate()
    sdfs = fixtures.to_spark(spark, frames)
    out = {}
    for name, sdf in sdfs.items():
        path = f"{out_dir}/{name}.parquet"
        sdf.write.mode("overwrite").parquet(path)
        out[name] = sdf.sparkSession.read.parquet(path)
    return out


@pytest.fixture(scope="module")
def pipeline(nfl_tables):
    return nfl.run_relational_pipeline(
        nfl_tables["tracking"], nfl_tables["pff_scouting"],
        nfl_tables["plays"], nfl_tables["players"],
        nfl_tables["epa_pbp"])


@pytest.fixture(scope="module")
def outputs(pipeline):
    collected = {}
    for name in ["play_start", "play_end", "qb_set_point",
                 "rushers_final", "time_to_throw", "epa_comparison",
                 "by_hurry"]:
        collected[name] = pipeline[name].collect()
    return collected


@pytest.fixture(scope="module")
def main_df_facts(pipeline):
    """One action over main_df answering every cleanup assertion."""
    main_df = pipeline["main_df"]
    return main_df.agg(
        F.collect_set("dropBackType").alias("kinds"),
        F.sum(F.when(F.col("foulNFLId1").isNotNull(), 1)
               .otherwise(0)).alias("n_foul"),
        *[F.sum(F.when((F.col("playId") == p) & (F.col("gameId") == g), 1)
                 .otherwise(0)).alias(f"n_outlier_{i}")
          for i, (p, g) in enumerate(nfl.OUTLIER_PLAYS)],
        F.sum(F.when(F.col("gameId") == 2021091204, 1)
               .otherwise(0)).alias("n_game0"),
    ).first()


def test_main_df_cleanup(main_df_facts):
    """Q1: excluded dropbacks, scramble+PA play, penalty play, and the
    two literal outlier plays are gone; TRADITIONAL plays survive, and
    the literal filter does NOT nuke the whole game (the reference's
    OR-union bug, SURVEY §7.3)."""
    f = main_df_facts
    assert set(f.kinds) == {"TRADITIONAL"}
    assert f.n_foul == 0
    assert f.n_outlier_0 == 0 and f.n_outlier_1 == 0
    assert f.n_game0 > 0


def test_play_bounds(outputs):
    """Q2: snap at frame 5, end at frame 45 for every surviving play."""
    ps, pe = outputs["play_start"], outputs["play_end"]
    assert len(ps) == len(pe) > 0
    assert all(r.play_start_frameId == fixtures.SNAP_FRAME for r in ps)
    assert all(r.play_end_frameId == fixtures.END_FRAME for r in pe)


def test_qb_set_point_frames(outputs):
    """Q3: reaccel plays set at frame 24, coast plays at END-1 —
    derived by hand from the speed profile (fixtures docstring)."""
    sp = outputs["qb_set_point"]
    assert sp
    for r in sp:
        assert r.frameId in (24, fixtures.END_FRAME - 1), \
            (r.gameId, r.playId, r.frameId)


def test_pressure_metric_by_hand(outputs):
    """Q4: reached rushers score %PZ = 1 with Pressure_Start > 0;
    stalled rushers score < 1 via the playEnd branch; %PZ/s > 0."""
    rows = outputs["rushers_final"]
    assert rows
    for r in rows:
        assert r.Seconds > 0
        if r.Pressure_Start > 0:
            assert r.Percent_to_Pressure_Zone == 1.0
        else:
            assert 0 < r.Percent_to_Pressure_Zone < 1
        expected = r.Percent_to_Pressure_Zone / r.Seconds
        assert abs(r.Percent_to_Pressure_Zone_per_s - expected) < 1e-9


def test_semi_join_drops_te_only_rushers(outputs):
    """MBE:140-141: rusher 3 (TE-blocked only) must not survive."""
    ids = {r.nflId for r in outputs["rushers_final"]}
    assert ids and not (ids & {2003, 2103})


def test_blocker_counts(outputs):
    """Q5: rusher 2 is double-teamed (Blockers_OL=2), rushers 0/1
    single-blocked; pressure branch fires for rushers 0/1 only."""
    by_tail = {}
    for r in outputs["rushers_final"]:
        by_tail[r.nflId % 100] = r
    assert by_tail[0].Blockers_OL == 1
    assert by_tail[1].Blockers_OL == 1
    assert by_tail[2].Blockers_OL == 2
    assert by_tail[2].Blockers_All == 2
    assert by_tail[0].Pressure_Start > 0
    assert by_tail[2].Pressure_Start == 0


def test_metric_eval_labels_align(outputs):
    """Q6 sanity harness (MBE:161-163): hurried rushers are exactly
    the zone-reachers, so their median %PZ/s must exceed label 0."""
    med = {r.pff_hurry: r.median_pzs for r in outputs["by_hurry"]}
    assert set(med) == {0, 1}
    assert med[1] > med[0]


def test_metric_eval_matches_duckdb(pipeline):
    """Q6 oracle parity (MBE:161-167): every metric_eval table —
    median %PZ/s + count per independent label — matches DuckDB
    computing the same aggregate over the identical input rows.

    Registry decision (round 5): Q6 does NOT get a driver slot — its
    operator content (grouped exact median + count, multi-label) is
    already hash-checked by a5_grouped_median and qpipe_rankings;
    demoting a non-redundant slot for it would weaken net coverage.
    This test closes the correctness loop at equivalent strength."""
    import duckdb

    ev = nfl.metric_eval(pipeline["rushers_final"],
                         pipeline["pass_blockers"])
    label_of = {
        "by_hurry": "pff_hurry", "by_hit": "pff_hit",
        "by_sack": "pff_sack", "by_pass_result": "passResult",
        "by_position": "pff_positionLinedUp",
        "blockers_by_position": "pff_positionLinedUp",
    }
    src = {"blockers_by_position": "pass_blockers"}
    con = duckdb.connect()
    for name, out in ev.items():
        label = label_of[name]
        base = pipeline[src.get(name, "rushers_final")]
        pdf = base.select(label,
                          "Percent_to_Pressure_Zone_per_s").toPandas()
        con.register("t", pdf)
        ref = {r[0]: (r[1], r[2]) for r in con.execute(
            f"""SELECT "{label}",
                       MEDIAN(Percent_to_Pressure_Zone_per_s),
                       COUNT(*)
                FROM t GROUP BY 1""").fetchall()}
        got = {r[label]: (r.median_pzs, r.n) for r in out.collect()}
        assert set(got) == set(ref), name
        for k, (m, n) in got.items():
            assert n == ref[k][1], (name, k)
            assert abs(m - ref[k][0]) < 1e-9, (name, k)
        con.unregister("t")


def test_epa_comparison_shape(outputs):
    """Q9: one row per defteam with PZs/epa medians."""
    rows = outputs["epa_comparison"]
    assert {r.defteam for r in rows} == {"DF0", "DF1"}
    assert all(r.PZs is not None and r.epa is not None for r in rows)


def test_time_to_throw(outputs):
    """Q10: snap frame 5, throw frame 45 → 4.0 seconds."""
    rows = outputs["time_to_throw"]
    assert rows
    for r in rows:
        assert abs(r.seconds_to_throw - 4.0) < 1e-9


def test_rankings_and_ml(pipeline, nfl_tables):
    """Q7+Q8: fit the expected-metric model, attach residuals, build
    the four ranking tables.

    Default model here is linear (a single LSQ job): MLlib tree
    training launches ~60 tiny RDD jobs and local-mode dispatch
    overhead makes that minutes-slow on toy data. Set
    SPARK_GRAFT_FULL_TESTS=1 to exercise the RF path (the production
    model, MC:21/33) — test_rf_model_full below.
    """
    from big_data_bowl___2023_spark.ml import models as M

    final = pipeline["rushers_final"]
    model = M.fit_expected_metric_model(final, "linear", use_cv=False)
    scored = M.attach_expected_metric(final, model,
                                      nfl_tables["players"],
                                      nfl_tables["plays"]).cache()

    rows = scored.select("xPZs", "dPZs", "displayName", "team",
                         "down", "yardsToGo").collect()
    assert rows and all(r.xPZs is not None for r in rows)

    rr = nfl.rusher_rankings(scored, min_attempts=5).collect()
    assert rr and all(r.rush_attempts >= 5 for r in rr)
    tr = nfl.team_rush_rankings(scored).collect()
    assert {r.team for r in tr} == {"DF0", "DF1"}

    blockers = M.blockers_with_dpzs(pipeline["pass_blockers"], scored,
                                    nfl_tables["players"])
    br = nfl.blocker_rankings(blockers, min_snaps=5).collect()
    assert br
    tb = nfl.team_blocker_rankings(blockers).collect()
    assert {r.team for r in tb} == {"OF0", "OF1"}


@pytest.mark.skipif(not __import__("os").environ.get("SPARK_GRAFT_FULL_TESTS"),
                    reason="RF training = ~60 tiny RDD jobs; minutes of "
                           "local dispatch overhead. Set "
                           "SPARK_GRAFT_FULL_TESTS=1 to run.")
def test_rf_model_full(pipeline, nfl_tables):
    """The production RF model (MC:21/33) end-to-end."""
    from big_data_bowl___2023_spark.ml import models as M

    final = pipeline["rushers_final"]
    model = M.fit_expected_metric_model(final, "random_forest",
                                        use_cv=False)
    imps = M.feature_importances(model)
    assert set(imps) == {"Blockers_All", "is_play_action"}
    scored = M.attach_expected_metric(final, model,
                                      nfl_tables["players"],
                                      nfl_tables["plays"])
    assert scored.filter(F.col("xPZs").isNull()).count() == 0
