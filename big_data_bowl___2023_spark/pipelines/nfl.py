"""The reference's composite pipelines Q1–Q10 (SURVEY.md §2.11),
re-expressed as pure DataFrame→DataFrame functions.

Semantics follow Final_Scripts line-for-line (citations inline), with
three deliberate divergences, all documented in SURVEY §7.4:

* windows partition by (gameId, nflId, playId) instead of the
  reference's unpartitioned lag over a global sort (MBE:47-50);
* the outlier filters implement the *intended* per-play conjunction,
  not the buggy OR-union text (DLC:53-54);
* category filters state NULL handling explicitly (DLC:31-35).

Scale shape: ``main_df`` is the single wide frame-grain table
(tracking ⋈ scouting ⋈ plays ⋈ players). It fans out to ~8 consumers
and the metric stage self-joins repeatedly, so lineage is TRUNCATED
(``session.pin(truncate=True)`` — a local checkpoint by default, a
reliable checkpoint under durable mode) at each fan-out point — the
Spark equivalent of
the reference's eager materialization (SURVEY §4.3.3). Plain
``cache()`` is not enough: it reuses physical results but the logical
plan still duplicates per self-join level, and driver-side
analysis/codegen grows exponentially down the pipeline (measured:
the full pipeline materializes in ~35 s with truncation vs hours of
driver CPU without). On a real cluster the same boundaries become
reliable checkpoints or silver-table parquet writes. plays/players
are broadcast; every derived table keyed on (gameId, playId[,nflId])
shuffles on those keys at most once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import joins as jn
from ..session import durable_pins, pin
from ..operators.aggregates import pivot_sum

# Vocabulary the filters depend on (FIXTURES.md §A).
END_EVENTS = ["pass_forward", "qb_sack", "qb_strip_sack",
              "autoevent_passforward", "autoevent_passinterrupted"]
EXCLUDED_DROPBACKS = ["DESIGNED_RUN", "DESIGNED_ROLLOUT_RIGHT",
                      "DESIGNED_ROLLOUT_LEFT", "NA", "UNKNOWN"]
SCRAMBLE_TYPES = ["SCRAMBLE", "SCRAMBLE_ROLLOUT_RIGHT",
                  "SCRAMBLE_ROLLOUT_LEFT"]
RUSHER_POSITIONS = ["DRT", "DLT", "LE", "LILB", "LEO", "REO", "ROLB",
                    "MLB", "RE", "LOLB", "RILB", "RLB", "NLT", "NT",
                    "LLB", "NRT"]
BLOCKER_POSITIONS = ["LT", "LG", "C", "RG", "RT"]
OUTLIER_PLAYS = [(2699, 2021091204), (1191, 2021102400)]
YARDS_TO_SET_POINT = 2.0
FRAME_SECONDS = 0.1   # 10 Hz tracking clock (MBE:99)

_PLAY_KEYS = ["playId", "gameId"]
_PLAYER_PLAY_KEYS = ["gameId", "nflId", "playId"]


# ------------------------------------------------------------------ Q1

def build_main_df(tracking: DataFrame, pff: DataFrame, plays: DataFrame,
                  players: DataFrame) -> DataFrame:
    """Q1 ``build_main_df`` (Data Load and Cleaning.R:14-54).

    Join order: the frame-grain tracking ⋈ scouting shuffle happens on
    the composite key once; plays/players are dimension broadcasts.
    The reference's global 4-key sort (DLC:37) is dropped — ordering
    is a window concern downstream. Callers should truncate lineage on
    the result (8-way fan-out in the metric stage; module docstring).
    """
    df = tracking.join(pff, ["playId", "nflId", "gameId"], "inner")  # DLC:25
    df = df.join(F.broadcast(plays), _PLAY_KEYS, "inner")            # DLC:26
    df = df.join(F.broadcast(players), ["nflId"], "inner")           # DLC:27

    # DLC:31-35 — R `!=` silently drops NAs; made explicit here.
    df = df.filter(F.col("dropBackType").isNotNull()
                   & ~F.col("dropBackType").isin(EXCLUDED_DROPBACKS))

    # DLC:40-47 — scramble+play_action / designed-run plays out.
    excl = (df.filter(
        (F.col("pff_positionLinedUp") == "QB")
        & ((F.col("event") == "run")
           | ((F.col("event") == "play_action")
              & F.col("dropBackType").isin(SCRAMBLE_TYPES))))
        .select(*_PLAY_KEYS).distinct())
    df = jn.anti_join(df, excl, _PLAY_KEYS)

    df = df.filter(F.col("foulNFLId1").isNull())                     # DLC:50

    # DLC:53-54 — intended conjunction semantics (SURVEY §7.3).
    for play_id, game_id in OUTLIER_PLAYS:
        df = df.filter(~((F.col("playId") == play_id)
                         & (F.col("gameId") == game_id)))
    return df


# ------------------------------------------------------------------ Q2

def play_bounds(main_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Q2 ``play_bounds`` (MBE:21-30): snap frame and play-end frame
    per play. Returns (play_start, play_end)."""
    play_end = (main_df.filter(F.col("event").isin(END_EVENTS))
                .select("playId", "gameId", "frameId").distinct()
                .groupBy(*_PLAY_KEYS)
                .agg(F.max("frameId").alias("play_end_frameId")))   # MBE:22-26
    play_start = (main_df.filter(F.col("event") == "ball_snap")
                  .select("playId", "gameId", "frameId").distinct()
                  .withColumnRenamed("frameId", "play_start_frameId"))  # MBE:28-30
    return play_start, play_end


def play_action_flags(pff: DataFrame) -> DataFrame:
    """MBE:18-19: plays with a 'PA' block type → is_play_action = 1."""
    return (pff.filter(F.col("pff_blockType") == "PA")
            .select("gameId", "playId").distinct()
            .withColumn("is_play_action", F.lit(1)))


# ------------------------------------------------------------------ Q3

def qb_set_point(main_df: DataFrame, play_start: DataFrame,
                 play_end: DataFrame) -> DataFrame:
    """Q3 ``qb_set_point`` (MBE:33-58): the frame where the QB stops
    the drop-back — peak-velocity detection via lag/lag-of-lag over
    the partitioned frame window.

    Output: (nflId_QB, playId, gameId, frameId, x_set_point,
    y_set_point), one row per qualifying play.
    """
    qb = main_df.filter((F.col("pff_positionLinedUp") == "QB")
                        & (F.col("dropBackType") == "TRADITIONAL"))  # MBE:34
    qb = qb.join(play_start, _PLAY_KEYS)                             # MBE:37

    drop_start = (qb.filter((F.col("officialPosition") == "QB")
                            & (F.col("s") >= 0.10)
                            & (F.col("frameId") > F.col("play_start_frameId")))
                  .groupBy(*_PLAYER_PLAY_KEYS)
                  .agg(F.min("frameId").alias("dropStartFrameId")))  # MBE:39
    qb = qb.join(drop_start, _PLAYER_PLAY_KEYS)                      # MBE:40
    qb = qb.join(play_end, _PLAY_KEYS)                               # MBE:42

    # MBE:45 — sentinel so the first in-window frame reads +accel.
    qb = qb.withColumn(
        "s", F.when(F.col("event") == "ball_snap", F.lit(-999.0))
              .otherwise(F.col("s")))

    qb = qb.filter((F.col("frameId") >= F.col("dropStartFrameId"))
                   & (F.col("frameId") > F.col("play_start_frameId")))  # MBE:48

    # MBE:49-50 — partitioned window replaces global sort + raw lag
    # (reference lags across play boundaries; SURVEY §7.1).
    w = Window.partitionBy(*_PLAYER_PLAY_KEYS).orderBy("frameId")
    qb = qb.withColumn("a_direction", F.col("s") - F.lag("s", 1).over(w))
    qb = qb.withColumn(
        "s_direction",
        (F.col("a_direction") > F.lag("a_direction", 1).over(w))
        & (F.col("a_direction") > 0))
    # qb fans out into two aggregates of itself (peak, set_point)
    # that join back. pin/truncate (not cache) — caching reuses the
    # physical result but every derived query still re-analyzes the
    # duplicated logical subtree, and the plan grows exponentially
    # down the pipeline (driver-side analysis/codegen dominates).
    # Truncating lineage here is the Spark equivalent of the
    # reference's eager materialization (SURVEY §4.3.3); on a real
    # cluster this is a checkpoint or a silver-table write.
    qb = pin(qb, truncate=True)

    peak = (qb.filter((F.col("a_direction") < 0)
                      & ((F.col("frameId") - F.col("dropStartFrameId")) >= 3)
                      & (F.abs(F.col("a_direction")) >= 0.10))
            .groupBy(*_PLAYER_PLAY_KEYS)
            .agg((F.min("frameId") - 1).alias("set_point_frameId")))  # MBE:52
    qb = qb.join(peak, _PLAYER_PLAY_KEYS)                             # MBE:53

    set_point = (qb.filter(
        ((F.col("set_point_frameId") < F.col("frameId"))
         & F.col("s_direction"))
        | (F.col("frameId") == F.col("play_end_frameId")))
        .groupBy("nflId", "playId", "gameId")
        .agg((F.min("frameId") - 1).alias("frameId")))                # MBE:54-55

    out = (qb.select("nflId", "playId", "gameId", "frameId", "x", "y")
           .join(set_point, ["nflId", "playId", "gameId", "frameId"]))  # MBE:56-57
    return out.toDF("nflId_QB", "playId", "gameId", "frameId",
                    "x_set_point", "y_set_point")                     # MBE:58


# ------------------------------------------------------------------ Q4

def pass_rusher_frames(main_df: DataFrame, qb_sp: DataFrame,
                       play_start: DataFrame, play_end: DataFrame,
                       yards: float = YARDS_TO_SET_POINT) -> DataFrame:
    """Q4 stage 1 (MBE:61-91): rusher frames clipped to snap..throw
    with Chebyshev distance to the set point and frame triggers."""
    r = main_df.filter(
        (F.col("pff_role") == "Pass Rush")
        & F.col("pff_positionLinedUp").isin(RUSHER_POSITIONS))        # MBE:63-64
    r = r.select("nflId", "playId", "gameId", "frameId", "jerseyNumber",
                 "team", "playDirection", "x", "y", "s", "a", "event",
                 "pff_positionLinedUp", "pff_hit", "pff_hurry",
                 "pff_sack", "passResult", "dropBackType", "playResult")

    sp = qb_sp.select("playId", "gameId", "x_set_point", "y_set_point")
    r = r.join(sp, _PLAY_KEYS)                                        # MBE:68
    r = r.join(play_end, _PLAY_KEYS)                                  # MBE:72
    r = r.join(play_start, _PLAY_KEYS)                                # MBE:73
    r = r.filter((F.col("frameId") <= F.col("play_end_frameId"))
                 & (F.col("frameId") >= F.col("play_start_frameId")))  # MBE:74-75

    r = r.withColumn(
        "Set_Point_Max_Delta",
        F.greatest(F.abs(F.col("x") - F.col("x_set_point")),
                   F.abs(F.col("y") - F.col("y_set_point"))))          # MBE:77

    r = r.withColumn(
        "frame_trigger",
        F.when(F.col("frameId") == F.col("play_start_frameId"), "snap")
         .when(F.col("frameId") == F.col("play_end_frameId"), "playEnd")
         .when(F.col("Set_Point_Max_Delta") <= yards, "pressure")
         .otherwise(""))                                              # MBE:81-82
    # r joins an aggregate of itself next (pressure_start) —
    # truncate lineage (see qb_set_point).
    r = pin(r, truncate=True)

    pressure_start = (r.filter(F.col("frame_trigger") == "pressure")
                      .groupBy("playId", "gameId", "nflId")
                      .agg(F.min("frameId").alias("frameId"))
                      .withColumn("Frame_Status",
                                  F.lit("Pressure_Start")))           # MBE:85-87

    r = r.join(pressure_start, ["playId", "gameId", "nflId", "frameId"],
               "left")                                                # MBE:89
    r = r.withColumn(
        "Frame_Status",
        F.when(F.col("frame_trigger") == "playEnd", "playEnd")
         .when(F.col("frame_trigger") == "snap", "snap")
         .otherwise(F.col("Frame_Status")))                           # MBE:91
    return r


def pressure_metric(rusher_frames: DataFrame,
                    yards: float = YARDS_TO_SET_POINT) -> DataFrame:
    """Q4 stage 2 (MBE:93-108): pivot the snap/playEnd/Pressure_Start
    deltas wide and derive %PZ and %PZ/s per rusher-play."""
    # summary feeds three consumers (pivot, Delta_End, labels) that
    # re-join — truncate lineage once (see qb_set_point).
    summary = pin(rusher_frames
                  .filter(F.col("Frame_Status").isNotNull()),
                  truncate=True)                                      # MBE:93

    wide = pivot_sum(
        summary.select("playId", "gameId", "nflId",
                       F.col("Set_Point_Max_Delta").alias("value"),
                       F.col("Frame_Status").alias("variable")),
        ["playId", "gameId", "nflId"], "variable",
        ["snap", "playEnd", "Pressure_Start"], "value")                # MBE:94-96

    delta_end = (summary.filter(F.col("Frame_Status") != "snap")
                 .groupBy("playId", "gameId", "nflId", "play_start_frameId")
                 .agg(F.min("frameId").alias("Delta_End")))            # MBE:97-98
    wide = wide.join(delta_end, ["playId", "gameId", "nflId"])

    wide = wide.withColumn(
        "Seconds",
        (F.col("Delta_End") - F.col("play_start_frameId"))
        * F.lit(FRAME_SECONDS))                                        # MBE:99
    wide = wide.withColumn(
        "Distance",
        F.when(F.col("Pressure_Start") > 0,
               F.col("snap") - F.col("Pressure_Start"))
         .otherwise(F.col("snap") - F.col("playEnd")))                 # MBE:100-101
    # try_divide: R yields Inf on a zero denominator; Spark ANSI would
    # raise — NULL is the engine's documented stand-in (never hit on
    # physical data: snap distance > pressure-zone radius).
    wide = wide.withColumn(
        "Percent_to_Pressure_Zone",
        F.when(F.col("Pressure_Start") > 0, F.lit(1.0))
         .otherwise(F.try_divide(F.col("Distance"),
                                 F.col("snap") - F.lit(yards))))       # MBE:102
    wide = wide.withColumn(
        "Percent_to_Pressure_Zone",
        F.when(F.col("Percent_to_Pressure_Zone") > 1, F.lit(1.0))
         .otherwise(F.col("Percent_to_Pressure_Zone")))                # MBE:103
    wide = wide.withColumn(
        "Percent_to_Pressure_Zone_per_s",
        F.try_divide(F.col("Percent_to_Pressure_Zone"),
                     F.col("Seconds")))                                # MBE:104

    labels = (summary.filter(F.col("event") == "ball_snap")
              .select("playId", "gameId", "nflId", "pff_positionLinedUp",
                      "jerseyNumber", "team", "pff_hurry", "pff_sack",
                      "pff_hit", "passResult", "playResult"))          # MBE:106-108
    return wide.join(labels, ["playId", "gameId", "nflId"])


# ------------------------------------------------------------------ Q5

def pass_blockers(main_df: DataFrame) -> DataFrame:
    """Q5 (MBE:113-118): OL blocker play-grain rows."""
    b = main_df.filter(
        (F.col("pff_role") == "Pass Block")
        & F.col("pff_positionLinedUp").isin(BLOCKER_POSITIONS))
    return b.select("nflId", "playId", "gameId", "playDirection",
                    "jerseyNumber", "team", "pff_positionLinedUp",
                    "pff_beatenByDefender", "pff_hitAllowed",
                    "pff_hurryAllowed", "pff_sackAllowed",
                    "pff_nflIdBlockedPlayer", "pff_blockType",
                    "passResult", "dropBackType").distinct()


def blocker_counts(main_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Q5 (MBE:120-132): blockers per rushed player — OL-only and all.
    Returns (ol, all), both keyed (gameId, playId, nflId=rusher)."""
    def count(filtered: DataFrame, alias: str) -> DataFrame:
        return (filtered
                .select("gameId", "playId", "nflId",
                        "pff_nflIdBlockedPlayer").distinct()
                .groupBy("gameId", "playId", "pff_nflIdBlockedPlayer")
                .agg(F.count(F.lit(1)).alias(alias))
                .filter(F.col("pff_nflIdBlockedPlayer").isNotNull())
                .withColumnRenamed("pff_nflIdBlockedPlayer", "nflId"))

    ol = count(main_df.filter(
        (F.col("pff_role") == "Pass Block")
        & F.col("pff_positionLinedUp").isin(BLOCKER_POSITIONS)),
        "Blockers_OL")                                                # MBE:122-126
    al = count(main_df.filter(F.col("pff_role") == "Pass Block"),
               "Blockers_All")                                        # MBE:129-132
    return ol, al


def finalize_rushers(rushers: DataFrame, blocker_ol: DataFrame,
                     blocker_all: DataFrame, blockers: DataFrame,
                     play_action: DataFrame) -> DataFrame:
    """MBE:134-145: attach blocker counts (left+fill), keep only
    rushers blocked by ≥1 OL (semi-join — the reference's dedup-merge
    idiom), attach the play-action flag."""
    out = jn.left_join_fill(rushers, blocker_ol,
                            ["gameId", "playId", "nflId"],
                            fill={"Blockers_OL": 0})                  # MBE:134,136
    out = jn.left_join_fill(out, blocker_all,
                            ["gameId", "playId", "nflId"],
                            fill={"Blockers_All": 0})                 # MBE:135,137
    blocked_by_ol = (blockers
                     .select("playId", "gameId",
                             F.col("pff_nflIdBlockedPlayer").alias("nflId"))
                     .distinct())
    out = jn.semi_join(out, blocked_by_ol,
                       ["playId", "gameId", "nflId"])                 # MBE:140-141
    out = jn.left_join_fill(out, play_action, ["gameId", "playId"],
                            fill={"is_play_action": 0})               # MBE:144-145
    return out


def blockers_with_metric(blockers: DataFrame,
                         rushers_final: DataFrame) -> DataFrame:
    """MBE:148-149: role-playing-FK join — blocker rows pick up their
    blocked rusher's metric."""
    r = rushers_final.select(
        F.col("playId"), F.col("gameId"),
        F.col("nflId").alias("pff_nflIdBlockedPlayer"),
        "Percent_to_Pressure_Zone_per_s", "Blockers_OL", "Blockers_All")
    return blockers.join(r, ["playId", "gameId", "pff_nflIdBlockedPlayer"])


# ------------------------------------------------------------------ Q6

def metric_eval(rushers_final: DataFrame,
                blockers: DataFrame) -> dict[str, DataFrame]:
    """Q6 (MBE:161-167): median %PZ/s grouped by each independent
    ground-truth label — the reference's sanity harness."""
    def med(df: DataFrame, label: str) -> DataFrame:
        return (df.groupBy(label)
                .agg(F.median("Percent_to_Pressure_Zone_per_s")
                      .alias("median_pzs"),
                     F.count(F.lit(1)).alias("n")))

    return {
        "by_hurry": med(rushers_final, "pff_hurry"),
        "by_hit": med(rushers_final, "pff_hit"),
        "by_sack": med(rushers_final, "pff_sack"),
        "by_pass_result": med(rushers_final, "passResult"),
        "by_position": med(rushers_final, "pff_positionLinedUp"),
        "blockers_by_position": med(blockers, "pff_positionLinedUp"),
    }


# ------------------------------------------------------------------ Q8

def rusher_rankings(rushers_final: DataFrame, metric: str = "dPZs",
                    min_attempts: int = 50) -> DataFrame:
    """Q8 (Model Outputs.R:17-21): player rankings on the residual
    metric, HAVING rush_attempts ≥ threshold."""
    out = (rushers_final.groupBy("displayName", "team")
           .agg(F.round(F.sum(metric), 3).alias("sum_dPZs"),
                F.count(F.lit(1)).alias("rush_attempts"),
                F.round(F.median(metric), 3).alias("median_dPZs"))
           .filter(F.col("rush_attempts") >= min_attempts))
    return out.orderBy(F.desc("median_dPZs"), F.asc("displayName"))


def team_rush_rankings(rushers_final: DataFrame,
                       metric: str = "dPZs") -> DataFrame:
    """MO:23-24."""
    return (rushers_final.groupBy("team")
            .agg(F.sum(metric).alias("sum_dPZs"),
                 F.count(F.lit(1)).alias("rush_attempts"),
                 F.median(metric).alias("median_dPZs"))
            .orderBy(F.desc("sum_dPZs"), F.asc("team")))


def blocker_rankings(blockers_with_dpzs: DataFrame,
                     metric: str = "dPZs",
                     min_snaps: int = 50) -> DataFrame:
    """MO:27-30 (ascending: lower residual = better blocking)."""
    out = (blockers_with_dpzs
           .groupBy("displayName", "team", "pff_positionLinedUp")
           .agg(F.round(F.sum(metric), 3).alias("sum_dPZs"),
                F.count(F.lit(1)).alias("snaps"),
                F.round(F.median(metric), 3).alias("median_dPZs"))
           .filter(F.col("snaps") > min_snaps))
    return out.orderBy(F.asc("median_dPZs"), F.asc("displayName"))


def team_blocker_rankings(blockers_with_dpzs: DataFrame,
                          metric: str = "dPZs") -> DataFrame:
    """MO:33-34."""
    return (blockers_with_dpzs.groupBy("team")
            .agg(F.sum(metric).alias("sum_dPZs"),
                 F.count(F.lit(1)).alias("snaps"),
                 F.median(metric).alias("median_dPZs"))
            .orderBy(F.asc("sum_dPZs"), F.asc("team")))


# ------------------------------------------------------------------ Q9

def epa_comparison(rushers_final: DataFrame,
                   epa_pbp: DataFrame) -> DataFrame:
    """Q9 (EPA_Comparison.R:1-15): per-play mean %PZ/s joined to the
    external play-by-play EPA table, then defteam medians."""
    epa = (epa_pbp.filter((F.col("season_type") == "REG")
                          & F.col("posteam").isNotNull()
                          & (F.col("pass") == 1))                    # EPA:4-5
           .select(F.col("play_id").alias("playId"),
                   F.col("old_game_id").alias("gameId"),
                   "posteam", "defteam", "epa", "wpa",
                   "air_epa", "yac_epa"))                            # EPA:7-8
    per_play = (rushers_final.groupBy(*_PLAY_KEYS)
                .agg(F.avg("Percent_to_Pressure_Zone_per_s")
                      .alias("PZs")))                                # EPA:10
    joined = per_play.join(epa, _PLAY_KEYS)                          # EPA:11
    return (joined.groupBy("defteam")
            .agg(F.median("PZs").alias("PZs"),
                 F.median("epa").alias("epa")))                      # EPA:15


# ----------------------------------------------------------------- Q10

def time_to_throw(main_df: DataFrame) -> DataFrame:
    """Q10 (WIP.R:73-77): snap→throw seconds for clean-pocket
    completions."""
    t = main_df.filter(
        F.col("event").isin(["ball_snap", "pass_forward"])
        & (F.col("pff_positionLinedUp") == "QB")
        & (F.col("passResult") == "C")
        & (F.col("dropBackType") == "TRADITIONAL"))
    out = (t.groupBy("playId", "gameId", "nflId")
           .agg((F.min("frameId") * FRAME_SECONDS).alias("snap"),
                (F.max("frameId") * FRAME_SECONDS).alias("throw"),
                F.max("playResult").alias("yards")))
    return out.withColumn("seconds_to_throw",
                          F.col("throw") - F.col("snap"))


# ------------------------------------------------------- orchestration

def run_relational_pipeline(tracking: DataFrame, pff: DataFrame,
                            plays: DataFrame, players: DataFrame,
                            epa_pbp: DataFrame | None = None,
                            durable: bool | None = None
                            ) -> dict[str, DataFrame]:
    """Everything up to (not including) the ML stage: Q1–Q6, Q9–Q10.
    ``main_df`` is pinned here — the deliberate materialization for
    the 8-way fan-out (SURVEY §4.3.3). ``durable`` threads the
    persistence mode to EVERY pin in the pipeline (here and inside
    qb_set_point / pass_rusher_frames / pressure_metric):
    ``True`` = preemption-safe reliable checkpoints for cluster runs,
    ``False`` = fast local checkpoints, ``None`` (default) = the
    ambient ``session.durable_pins`` / env mode. Output values are
    identical in every mode (tests/test_pin_durability.py)."""
    with durable_pins(durable):
        return _relational_pipeline(tracking, pff, plays, players,
                                    epa_pbp)


def _relational_pipeline(tracking: DataFrame, pff: DataFrame,
                         plays: DataFrame, players: DataFrame,
                         epa_pbp: DataFrame | None
                         ) -> dict[str, DataFrame]:
    main_df = pin(build_main_df(tracking, pff, plays, players),
                  truncate=True)
    play_start, play_end = play_bounds(main_df)
    pa = play_action_flags(pff)
    sp = qb_set_point(main_df, play_start, play_end)
    frames = pass_rusher_frames(main_df, sp, play_start, play_end)
    rushers = pressure_metric(frames)
    blockers = pass_blockers(main_df)
    ol, al = blocker_counts(main_df)
    # rushers_final also fans out (rankings, eval, EPA, ML) — again
    # truncate; it is play-grain (tiny relative to frames).
    final = pin(finalize_rushers(rushers, ol, al, blockers, pa),
                truncate=True)
    bmetric = blockers_with_metric(blockers, final)
    out = {
        "main_df": main_df,
        "play_start": play_start,
        "play_end": play_end,
        "qb_set_point": sp,
        "rusher_frames": frames,
        "rushers_final": final,
        "pass_blockers": bmetric,
        "time_to_throw": time_to_throw(main_df),
    }
    out.update(metric_eval(final, bmetric))
    if epa_pbp is not None:
        out["epa_comparison"] = epa_comparison(final, epa_pbp)
    return out
