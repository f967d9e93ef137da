"""Deterministic NFL-shaped fixture generator (FIXTURES.md §A).

Synthesizes tracking / plays / players / pff_scouting / epa_pbp tables
whose kinematics exercise every branch of the Q1–Q10 pipelines:

* QB speed profile rises from drop start, peaks, decelerates ≥0.10
  (peak-velocity detector MBE:52 fires), and on half the plays
  re-accelerates (the s_direction set-point branch MBE:54) while the
  other half coasts (play-end fallback branch);
* rushers 0-1 reach the 2-yard pressure zone (Pressure_Start branch
  MBE:100), rushers 2-3 stall outside it (playEnd branch);
* rusher 3 is blocked only by a TE (dropped by the OL semi-join
  MBE:140-141); one OL blocks nobody (NULL FK, MBE:125);
* one play per excluded dropBackType, one scramble+play_action play
  (anti-join path DLC:40-47), one penalty play (DLC:50), and the two
  literal outlier (gameId, playId) pairs (DLC:53-54).

Everything is closed-form in (game, play, frame) — no RNG in the
kinematics; the tiny RNG use (labels, EPA noise) is seeded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

GAME_IDS = [2021091204, 2021102400]      # match the outlier filters
SNAP_FRAME = 5
END_FRAME = 45
N_FRAMES = 50
QB_Y = 26.65


def _qb_speed(f: int, reaccel: bool) -> float:
    """Piecewise drop-back speed profile (see module docstring)."""
    if f <= SNAP_FRAME:
        return 0.0
    if f <= 12:                      # rising: a_dir = +0.30
        return 0.3 * (f - SNAP_FRAME)
    if f <= 17:                      # falling: a_dir = -0.35
        return max(2.1 - 0.35 * (f - 12), 0.2)
    if reaccel and 25 <= f <= 27:    # second burst: rising a_dir
        return {25: 0.35, 26: 0.60, 27: 0.95}[f]
    return 0.2                       # coast


def _qb_x(f: int) -> float:
    return 40.0 - 0.35 * min(max(f - SNAP_FRAME, 0), 20)


def generate(n_games: int = 2, plays_per_game: int = 30,
             seed: int = 7) -> dict[str, pd.DataFrame]:
    rng = np.random.default_rng(seed)
    tracking, plays, pff, players_rows, epa = [], [], [], [], []

    for g in range(n_games):
        game_id = GAME_IDS[g] if g < len(GAME_IDS) else 2021110000 + g
        team_off, team_def = f"OF{g}", f"DF{g}"
        qb_id = 1000 + g * 100
        rushers = [2000 + g * 100 + k for k in range(4)]
        ols = [3000 + g * 100 + k for k in range(5)]
        te_id = 4000 + g

        players_rows.append((qb_id, f"Quinn Back{g}", "QB"))
        for k, r in enumerate(rushers):
            players_rows.append((r, f"Rick Rusher{g}{k}", "DE"))
        for k, o in enumerate(ols):
            players_rows.append((o, f"Bob Blocker{g}{k}", "T"))
        players_rows.append((te_id, f"Ted End{g}", "TE"))

        for p in range(plays_per_game):
            play_id = 100 + p * 50
            # Play-type script: indexes 0-5 exercise the cleanup paths.
            special = {0: "DESIGNED_RUN", 1: "DESIGNED_ROLLOUT_RIGHT",
                       2: "DESIGNED_ROLLOUT_LEFT", 3: "NA",
                       4: "UNKNOWN", 5: None}
            if p in special:
                drop_back = special[p]
            elif p == 6:
                drop_back = "SCRAMBLE"      # + play_action event below
            else:
                drop_back = "TRADITIONAL"
            foul = qb_id if p == 7 else None
            # Outlier keys from DLC:53-54 — give them valid TRADITIONAL
            # data so only the literal filter removes them.
            if g == 0 and p == 8:
                play_id = 2699
            if g == 1 and p == 8:
                play_id = 1191
            reaccel = (p % 2 == 0)
            pass_result = ["C", "C", "C", "I", "S"][p % 5]
            plays.append((game_id, play_id, drop_back, pass_result,
                          int(rng.integers(-2, 15)), foul,
                          int(p % 4) + 1, int(rng.integers(1, 15)),
                          f"({p}) pass short to X.Receiver{p}"))

            participants = (
                [(qb_id, "Pass", "QB", team_off)]
                + [(r, "Pass Rush",
                    ["DRT", "DLT", "LE", "RE"][k], team_def)
                   for k, r in enumerate(rushers)]
                + [(o, "Pass Block",
                    ["LT", "LG", "C", "RG", "RT"][k], team_off)
                   for k, o in enumerate(ols)]
                + [(te_id, "Pass Block", "TE", team_off)]
            )
            blocked = {ols[0]: rushers[0], ols[1]: rushers[1],
                       ols[2]: rushers[2], ols[3]: rushers[2],
                       ols[4]: None, te_id: rushers[3]}
            reached = {rushers[0]: True, rushers[1]: True,
                       rushers[2]: False, rushers[3]: False}

            for nfl_id, role, pos, team in participants:
                is_rusher = role == "Pass Rush"
                # Labels align with kinematics so the MBE:161-163
                # sanity medians separate cleanly (FIXTURES.md §A4).
                hurry = int(is_rusher and reached[nfl_id])
                hit = int(is_rusher and reached[nfl_id] and p % 2 == 0)
                sack = int(is_rusher and reached[nfl_id]
                           and pass_result == "S")
                pff.append((game_id, play_id, nfl_id, role, pos,
                            hit, hurry, sack, 0, hit, hurry, sack,
                            blocked.get(nfl_id),
                            "PA" if (p % 4 == 0 and role == "Pass Block"
                                     and pos == "TE") else "SW"))

            # Set point the detector will find: on reaccel plays
            # s_direction first fires at frame 25 → set point 24; on
            # coast plays the play-end fallback gives END_FRAME-1.
            sp_frame = 24 if reaccel else END_FRAME - 1
            sp_x, sp_y = _qb_x(sp_frame), QB_Y

            for nfl_id, role, pos, team in participants:
                k = rushers.index(nfl_id) if role == "Pass Rush" else 0
                for f in range(1, N_FRAMES + 1):
                    event = None
                    if f == SNAP_FRAME:
                        event = "ball_snap"
                    elif f == END_FRAME:
                        event = ("qb_sack" if pass_result == "S"
                                 else "pass_forward")
                    elif f == 8 and p == 6:
                        event = "play_action"
                    elif f == 9 and p == 0:
                        event = "run"
                    if role == "Pass" and pos == "QB":
                        x, y = _qb_x(f), QB_Y
                        s = _qb_speed(f, reaccel)
                    elif role == "Pass Rush":
                        x0, y0 = 46.0 + k, 22.0 + 2 * k
                        frac_cap = 0.95 if reached[nfl_id] else 0.55
                        t = min(max(f - SNAP_FRAME, 0) / 25.0, frac_cap)
                        x = x0 + t * (sp_x - x0)
                        y = y0 + t * (sp_y - y0)
                        s = 1.5 if SNAP_FRAME < f < 30 else 0.3
                    else:   # blockers hold near the line
                        x = 38.0 + (nfl_id % 7) * 0.5
                        y = 24.0 + (nfl_id % 5)
                        s = 0.4
                    tracking.append((game_id, play_id, nfl_id, f,
                                     round(x, 3), round(y, 3),
                                     round(s, 3), 0.5, event,
                                     nfl_id % 100, team, "left"))

            epa.append((play_id, game_id, team_off, team_def,
                        float(rng.normal(0, 1.2)),
                        float(rng.normal(0, 0.05)),
                        float(rng.normal(0, 0.8)),
                        float(rng.normal(0, 0.6)),
                        "REG" if p != 9 else "POST",
                        1 if p != 10 else 0))

    out = {
        "tracking": pd.DataFrame(tracking, columns=[
            "gameId", "playId", "nflId", "frameId", "x", "y", "s", "a",
            "event", "jerseyNumber", "team", "playDirection"]),
        "plays": pd.DataFrame(plays, columns=[
            "gameId", "playId", "dropBackType", "passResult",
            "playResult", "foulNFLId1", "down", "yardsToGo",
            "playDescription"]),
        "players": pd.DataFrame(players_rows, columns=[
            "nflId", "displayName", "officialPosition"]),
        "pff_scouting": pd.DataFrame(pff, columns=[
            "gameId", "playId", "nflId", "pff_role",
            "pff_positionLinedUp", "pff_hit", "pff_hurry", "pff_sack",
            "pff_beatenByDefender", "pff_hitAllowed",
            "pff_hurryAllowed", "pff_sackAllowed",
            "pff_nflIdBlockedPlayer", "pff_blockType"]),
        "epa_pbp": pd.DataFrame(epa, columns=[
            "play_id", "old_game_id", "posteam", "defteam", "epa",
            "wpa", "air_epa", "yac_epa", "season_type", "pass"]),
    }
    return out


def to_spark(spark, frames: dict[str, pd.DataFrame]) -> dict:
    """Create typed Spark DataFrames (schemas from sources.schemas)."""
    from pyspark.sql import types as T

    from ..sources import schemas as S
    out = {}
    for name, pdf in frames.items():
        schema = S.NFL_SCHEMAS[name]
        pdf = pdf.copy()
        for field in schema.fields:
            col = field.name
            # Nullable int columns arrive from pandas as float64 (NaN)
            # or object — normalize to nullable Int64 for Arrow.
            if isinstance(field.dataType, (T.LongType, T.IntegerType)):
                pdf[col] = pd.array(pdf[col], dtype="Int64")
            elif pdf[col].dtype == object:
                pdf[col] = pdf[col].where(pd.notna(pdf[col]), None)
        out[name] = spark.createDataFrame(pdf, schema=schema)
    return out


def write_parquet(frames: dict[str, pd.DataFrame], out_dir: str) -> None:
    import os
    os.makedirs(out_dir, exist_ok=True)
    for name, pdf in frames.items():
        pdf.to_parquet(f"{out_dir}/{name}.parquet", index=False)
