"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``big_data_bowl___2023_spark`` (see SURVEY.md
§2 for the operator inventory each query name maps to).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_bowl___2023_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1-shaped pricing summary (SURVEY §2.4 A1–A7) — the multi-
    aggregate grouped summarise that anchors the reference's metric
    evaluation (Model Outputs.R:17-34).
    """
    registry.load_all()
    return registry.QUERIES["q1_pricing_summary"](
        spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys absent here are
    rows-only-checked ops (non-SQL-expressible, e.g. LSH/ML)."""
    return registry.all_oracles()
