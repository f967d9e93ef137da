"""E42 — fuzzy join: exact agreement with a DuckDB cross-join
levenshtein oracle on a dirty-names fixture (all strings above the
completeness bound), typo pairs found, disjoint names not, and the
plan is a q-gram equi-join (no cartesian product)."""

from __future__ import annotations

import duckdb
import pandas as pd

from big_data_bowl___2023_spark.operators.fuzzy import (
    fuzzy_join,
    min_len_exact,
)
from big_data_bowl___2023_spark.plans.explain import assert_no_cartesian

LEFT = [(1, "jonathan"), (2, "katherine"), (3, "alexander"),
        (4, "margaret"), (5, "theodore")]
RIGHT = [(10, "jonathen"),   # 1 sub of jonathan
         (11, "katherine"),  # exact
         (12, "alexandre"),  # within 2 of alexander
         (13, "zzzzzzzz"),   # matches nothing
         (14, "margareth")]  # 1 insert on margaret


def test_fuzzy_join_vs_duckdb_oracle(spark):
    k = 1
    assert all(len(s) >= min_len_exact(2, k) for _, s in LEFT + RIGHT)
    left = spark.createDataFrame(LEFT, ["lid", "lname"])
    right = spark.createDataFrame(RIGHT, ["rid", "rname"])
    out = fuzzy_join(left, right, "lname", "rname", max_distance=k)
    got = {(r.lid, r.rid, r.distance) for r in out.collect()}

    con = duckdb.connect()
    con.register("l", pd.DataFrame(LEFT, columns=["lid", "lname"]))
    con.register("r", pd.DataFrame(RIGHT, columns=["rid", "rname"]))
    oracle = con.sql(f"""
        SELECT lid, rid, levenshtein(lname, rname) AS d
        FROM l, r WHERE levenshtein(lname, rname) <= {k}""").fetchall()
    assert got == {tuple(r) for r in oracle}
    assert (1, 10, 1) in got and (2, 11, 0) in got and (4, 14, 1) in got
    assert not any(rid == 13 for _, rid, _ in got)


def test_blocking_avoids_cartesian_and_widens_with_k(spark):
    left = spark.createDataFrame(LEFT, ["lid", "lname"])
    right = spark.createDataFrame(RIGHT, ["rid", "rname"])
    out1 = fuzzy_join(left, right, "lname", "rname", max_distance=1)
    assert_no_cartesian(out1)
    out2 = fuzzy_join(left, right, "lname", "rname", max_distance=2)
    pairs1 = {(r.lid, r.rid) for r in out1.collect()}
    pairs2 = {(r.lid, r.rid) for r in out2.collect()}
    assert pairs1 < pairs2          # k=2 admits alexander/alexandre
    assert (3, 12) in pairs2 - pairs1
