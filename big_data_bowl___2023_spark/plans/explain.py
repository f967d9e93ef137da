"""Physical-plan introspection (SURVEY.md §4).

The engine's scale claims — pushdown reaches the scan, dimensions
broadcast, no accidental cartesian products — are assertable facts
about the optimized plan, not hopes. These helpers make them test
assertions so a regression in plan shape fails CI, not production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return jdf.queryExecution().explainString(mode.fromString("formatted"))


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear inside a PushedFilters list — i.e.
    the predicate reached the parquet/CSV reader."""
    plan = formatted_plan(df)
    pushed = [line for line in plan.splitlines()
              if "PushedFilters" in line]
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, (
            f"filter {frag!r} not pushed to scan; pushed lines:\n{joined}")


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= min_count, (
        f"expected >= {min_count} BroadcastHashJoin, found {n}:\n"
        + plan[:2000])


def assert_partition_pruned(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear inside a PartitionFilters list —
    i.e. the scan enumerates only matching partition directories
    (at 100 TB: a per-key query touches one directory, not the whole
    dataset)."""
    plan = formatted_plan(df)
    lines = [line for line in plan.splitlines()
             if "PartitionFilters" in line]
    joined = "\n".join(lines)
    for frag in fragments:
        assert frag in joined, (
            f"partition filter {frag!r} not applied; "
            f"PartitionFilters lines:\n{joined}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, (
        "unexpected CartesianProduct:\n" + plan[:2000])
