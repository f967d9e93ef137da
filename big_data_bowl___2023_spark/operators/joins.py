"""Joins (SURVEY.md §2.3 J1–J9).

The reference does every join as an in-memory base-R ``merge`` hash
join; here all keys are explicit (natural-join inference is a schema-
change hazard, SURVEY §7.4) and small dimension sides are broadcast so
the frame-grain fact table never shuffles for them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equi_join(left: DataFrame, right: DataFrame, keys: Sequence[str],
              how: str = "inner") -> DataFrame:
    """J1/J2/J4: explicit-key equi-join (DLC:25-27; MBE:37-68). The
    composite frame-grain keys (gameId, playId, nflId) shuffle both
    sides; AQE picks sort-merge vs shuffled-hash and handles skew."""
    return left.join(right, list(keys), how)


def broadcast_dim_join(fact: DataFrame, dim: DataFrame,
                       keys: Sequence[str], how: str = "inner") -> DataFrame:
    """J3: dimension attach (players at DLC:27, MC:36). ``broadcast``
    pins the plan: the fact side streams map-side, zero shuffle — the
    scale-critical choice for a 100 TB fact table vs a ~KB dimension."""
    return fact.join(F.broadcast(dim), list(keys), how)


def left_join_fill(left: DataFrame, right: DataFrame, keys: Sequence[str],
                   fill: dict | None = None) -> DataFrame:
    """J5: left outer + NA fill — the reference's flag-attach pattern
    (MBE:89, 134-135, 144 then NA→0 at MBE:136-137, 145)."""
    out = left.join(right, list(keys), "left")
    return out.na.fill(fill) if fill else out


def role_key_join(left: DataFrame, right: DataFrame,
                  on: Column, how: str = "inner") -> DataFrame:
    """J6: join with renamed keys (``by.x``/``by.y``) — the rusher ⋈
    blocker role-playing FK ``nflId = pff_nflIdBlockedPlayer``
    (MBE:140-141, 148-149; MC:39-40)."""
    return left.join(right, on, how)


def anti_join(left: DataFrame, right: DataFrame,
              keys: Sequence[str]) -> DataFrame:
    """J7/U2: key-wise difference (dplyr anti_join, DLC:47)."""
    return left.join(right, list(keys), "left_anti")


def semi_join(left: DataFrame, right: DataFrame,
              keys: Sequence[str]) -> DataFrame:
    """J8: existence filter. The reference emulates this with
    dedup-then-inner-merge (MBE:140-141); ``left_semi`` expresses the
    intent directly and never duplicates or widens rows."""
    return left.join(right, list(keys), "left_semi")


def self_join_back(detail: DataFrame, derived: DataFrame,
                   keys: Sequence[str], how: str = "inner") -> DataFrame:
    """J9: join a derived aggregate back to its own detail lineage
    (MBE:68, 148-149). Aliases disambiguate the shared lineage."""
    d = detail.alias("detail")
    g = derived.alias("derived")
    cond = [F.col(f"detail.{k}") == F.col(f"derived.{k}") for k in keys]
    joined = d.join(g, cond, how)
    drop = [F.col(f"derived.{k}") for k in keys]
    return joined.drop(*drop)
