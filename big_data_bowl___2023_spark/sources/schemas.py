"""Explicit StructType schemas for every source table.

The reference infers all schemas at read time (``read.csv``,
Data Load and Cleaning.R:15-22); at 100 TB inference is a full extra
scan and a correctness hazard, so the engine pins schemas explicitly
(SURVEY.md §1.3). Two families:

* NFL-shaped fixture tables consumed by the composite pipelines
  (FIXTURES.md §A) — used by the CSV readers, since CSV carries no
  types.
* The driver star schema (FIXTURES.md §B) — parquet is
  self-describing, but the schemas are pinned here anyway so readers
  can assert drift instead of silently changing plans.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- NFL fixture family (FIXTURES.md §A; reference DLC:15-22) ---------

TRACKING = T.StructType([
    T.StructField("gameId", T.LongType()),
    T.StructField("playId", T.LongType()),
    T.StructField("nflId", T.LongType()),
    T.StructField("frameId", T.IntegerType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("s", T.DoubleType()),
    T.StructField("a", T.DoubleType()),
    T.StructField("event", T.StringType()),
    T.StructField("jerseyNumber", T.IntegerType()),
    T.StructField("team", T.StringType()),
    T.StructField("playDirection", T.StringType()),
])

PLAYS = T.StructType([
    T.StructField("gameId", T.LongType()),
    T.StructField("playId", T.LongType()),
    T.StructField("dropBackType", T.StringType()),
    T.StructField("passResult", T.StringType()),
    T.StructField("playResult", T.IntegerType()),
    T.StructField("foulNFLId1", T.LongType()),
    T.StructField("down", T.IntegerType()),
    T.StructField("yardsToGo", T.IntegerType()),
    T.StructField("playDescription", T.StringType()),
])

PLAYERS = T.StructType([
    T.StructField("nflId", T.LongType()),
    T.StructField("displayName", T.StringType()),
    T.StructField("officialPosition", T.StringType()),
])

PFF_SCOUTING = T.StructType([
    T.StructField("gameId", T.LongType()),
    T.StructField("playId", T.LongType()),
    T.StructField("nflId", T.LongType()),
    T.StructField("pff_role", T.StringType()),
    T.StructField("pff_positionLinedUp", T.StringType()),
    T.StructField("pff_hit", T.IntegerType()),
    T.StructField("pff_hurry", T.IntegerType()),
    T.StructField("pff_sack", T.IntegerType()),
    T.StructField("pff_beatenByDefender", T.IntegerType()),
    T.StructField("pff_hitAllowed", T.IntegerType()),
    T.StructField("pff_hurryAllowed", T.IntegerType()),
    T.StructField("pff_sackAllowed", T.IntegerType()),
    T.StructField("pff_nflIdBlockedPlayer", T.LongType()),
    T.StructField("pff_blockType", T.StringType()),
])

EPA_PBP = T.StructType([
    T.StructField("play_id", T.LongType()),
    T.StructField("old_game_id", T.LongType()),
    T.StructField("posteam", T.StringType()),
    T.StructField("defteam", T.StringType()),
    T.StructField("epa", T.DoubleType()),
    T.StructField("wpa", T.DoubleType()),
    T.StructField("air_epa", T.DoubleType()),
    T.StructField("yac_epa", T.DoubleType()),
    T.StructField("season_type", T.StringType()),
    T.StructField("pass", T.IntegerType()),
])

NFL_SCHEMAS = {
    "tracking": TRACKING,
    "plays": PLAYS,
    "players": PLAYERS,
    "pff_scouting": PFF_SCOUTING,
    "epa_pbp": EPA_PBP,
}

# --- Driver star schema (FIXTURES.md §B; /root/testdata) --------------

STAR_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
