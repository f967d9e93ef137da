"""E41 — PageRank: identical to a numpy power-iteration reference
(same damping, teleport, dangling handling, iteration count) on a
graph with hubs AND a dangling node; ranks sum to 1; higher in-degree
from important nodes ⇒ higher rank."""

from __future__ import annotations

import pytest

import numpy as np

from big_data_bowl___2023_spark.operators.graph import pagerank

pytestmark = pytest.mark.slow

# 0→1, 0→2, 1→2, 2→0, 3→2 ; node 4 dangling (edge 2→4 gives it mass)
EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (2, 4)]
N = 5
DAMPING, ITERS = 0.85, 20


def _numpy_reference():
    out = {}
    for s, d in EDGES:
        out.setdefault(s, []).append(d)
    r = np.full(N, 1.0 / N)
    for _ in range(ITERS):
        nxt = np.zeros(N)
        dangling = sum(r[v] for v in range(N) if v not in out)
        for s, dsts in out.items():
            for d in dsts:
                nxt[d] += r[s] / len(dsts)
        r = ((1 - DAMPING) / N + DAMPING * dangling / N
             + DAMPING * nxt)
    return r


def test_matches_numpy_power_iteration(spark):
    edges = spark.createDataFrame(EDGES, "src: long, dst: long")
    got = {r.node: r.rank
           for r in pagerank(edges, DAMPING, ITERS).collect()}
    ref = _numpy_reference()
    assert set(got) == set(range(N))
    for v in range(N):
        assert abs(got[v] - ref[v]) < 1e-9, (v, got[v], ref[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # node 2 collects from 0,1,3 -> top rank; dangling sink 4 beats
    # leaf 3 (it receives from the hub)
    assert got[2] == max(got.values())
    assert got[4] > got[3]
