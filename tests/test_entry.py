"""Driver-contract smoke tests: entry() runs, every query runs at
sf0.001, registry invariants hold."""

from __future__ import annotations

import pytest


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns and "count_order" in df.columns


def test_registry_invariants():
    import __spark_entry__ as e
    qs, oracles = e.queries(), e.oracle_sql()
    assert qs, "registry must not be empty"
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    for name in qs:
        assert name.replace("_", "").isalnum()


def test_all_queries_run_smoke(spark, sf_dir):
    """Every registered query must execute and return a stable schema
    at smoke scale (correctness vs the oracle is verify_local's job —
    this catches import/plan errors fast)."""
    import __spark_entry__ as e
    for name, fn in sorted(e.queries().items()):
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()
