"""Session-level Arrow-kernel default (verdict r11 #4).

``SPARK_GRAFT_KERNEL=arrow`` / ``kernel_scope("arrow")`` flips the
ambient default of every score/screen/assign/verify kernel kwarg in
one place — the hybrid stress leg's first cut accidentally measured
the interpreted SQL fold because per-call kwargs don't compose
across pipelines (BASELINE.md r11 note).

Contracts under test:
* resolution precedence: explicit kwarg > ambient scope > "sql";
* the env var seeds the ambient default in a fresh process;
* the ambient flip actually routes to the Arrow kernel (plan shows
  MapInPandas) and changes no results on the pinned corpus;
* the 50-query registry is pinned to "sql" regardless of ambient —
  the hash-checked surface never floats with the environment;
* scoping is per-context: a scope in one thread doesn't leak.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

from big_data_bowl___2023_spark import registry
from big_data_bowl___2023_spark.session import (
    kernel_default,
    kernel_scope,
    resolve_kernel,
)
from big_data_bowl___2023_spark.similarity import ann, brute_force_topk
from big_data_bowl___2023_spark.sources.io import load_table


def _rows(df):
    return sorted((r["query_id"], r["neighbor_id"], r["cosine"],
                   r["rank"]) for r in df.collect())


def test_resolution_precedence():
    assert kernel_default() == "sql"          # env unset in this run
    assert resolve_kernel(None) == "sql"
    assert resolve_kernel("arrow") == "arrow"
    with kernel_scope("arrow"):
        assert kernel_default() == "arrow"
        assert resolve_kernel(None) == "arrow"
        assert resolve_kernel("sql") == "sql"  # explicit still wins
        with kernel_scope("sql"):              # scopes nest
            assert resolve_kernel(None) == "sql"
        assert resolve_kernel(None) == "arrow"
    assert resolve_kernel(None) == "sql"
    with pytest.raises(ValueError, match="unknown kernel"):
        resolve_kernel("np")
    with pytest.raises(ValueError, match="unknown score kernel"):
        resolve_kernel("np", "score")
    with pytest.raises(ValueError, match="unknown kernel"):
        with kernel_scope("np"):
            pass


def test_env_var_seeds_fresh_process():
    code = ("from big_data_bowl___2023_spark.session import "
            "kernel_default; print(kernel_default())")
    for env_val, want in (("arrow", "arrow"), ("", "sql"),
                          ("ARROW", "arrow"), ("sql", "sql")):
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            text=True, check=True,
            env={"PATH": "/usr/bin:/bin",
                 "SPARK_GRAFT_KERNEL": env_val,
                 "PYTHONPATH": "."},
            cwd="/root/repo")
        assert out.stdout.strip() == want, (env_val, out.stdout)
    # a typo'd env value fails at import — never a silent SQL fold
    # (the regression the env var exists to prevent)
    bad = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "SPARK_GRAFT_KERNEL": "arow",
             "PYTHONPATH": "."},
        cwd="/root/repo")
    assert bad.returncode != 0
    assert "SPARK_GRAFT_KERNEL" in bad.stderr


def test_ambient_flip_routes_to_arrow_and_is_identity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.limit(6)
    baseline = _rows(brute_force_topk(emb, queries, 5))
    with kernel_scope("arrow"):
        df = brute_force_topk(emb, queries, 5)   # no kwarg anywhere
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan              # arrow kernel ran
        assert _rows(df) == baseline              # identity on corpus
    # back outside the scope the default plan is the JVM fold again
    plan = brute_force_topk(emb, queries, 5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan


def test_registry_is_sql_pinned_under_ambient_arrow(spark, sf_dir,
                                                    monkeypatch):
    """The hash-checked surface must not float with the environment:
    every registered query plans under kernel_scope("sql") even when
    the ambient default is arrow (the kernels can differ at an exact
    6-dp rounding boundary)."""
    registry.load_all()
    seen = []
    real = ann.resolve_kernel

    def spy(kernel, what=""):
        k = real(kernel, what)
        seen.append(k)
        return k

    monkeypatch.setattr(ann, "resolve_kernel", spy)
    q = registry.QUERIES["sim_topk_cosine"]
    baseline = _rows(q(spark, sf_dir))
    assert seen and set(seen) == {"sql"}
    seen.clear()
    with kernel_scope("arrow"):
        assert _rows(q(spark, sf_dir)) == baseline
        assert seen and set(seen) == {"sql"}   # pin held under arrow


def test_scope_is_per_thread_context():
    import threading

    results = {}

    def worker():
        results["worker"] = kernel_default()

    with kernel_scope("arrow"):
        t = threading.Thread(target=worker)
        t.start()
        t.join()
        assert kernel_default() == "arrow"
    # a fresh thread starts from the ContextVar DEFAULT (env-seeded),
    # not from the main thread's scope — scopes don't leak across
    # concurrent pipeline threads
    assert results["worker"] == "sql"
