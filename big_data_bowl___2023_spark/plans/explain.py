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


def plan_report(df: DataFrame) -> dict:
    """Machine-readable summary of the physical plan — the pre-flight
    review a query gets before running at 100 TB, as data instead of
    eyeballs:

    * ``n_scans`` / ``scans_with_pushed_filters`` — every scan should
      carry its predicates unless it genuinely has none;
    * ``n_exchanges`` — each is a shuffle; the number to justify;
    * ``n_broadcast_joins`` / ``n_sortmerge_joins`` / ``n_bnl_joins``
      — BroadcastNestedLoop shows up when an inequality join missed
      its blocking rewrite (the round-1 scale-killer's signature);
    * ``has_cartesian`` — almost always a bug.

    Counts come from the formatted plan text, which is stable across
    Spark 3.x/4.x for these node names. (Codegen-stage ids are NOT
    reported: under AQE they only exist in the post-execution final
    plan, so a pre-flight report would always read zero.)"""
    plan = formatted_plan(df)
    scan_lines = [line for line in plan.splitlines()
                  if "Scan " in line or line.strip().startswith("Scan")]
    pushed = [line for line in plan.splitlines()
              if "PushedFilters" in line and "PushedFilters: []" not in line]
    return {
        "n_scans": len(scan_lines),
        "scans_with_pushed_filters": len(pushed),
        "n_exchanges": plan.count("Exchange"),
        "n_broadcast_joins": plan.count("BroadcastHashJoin"),
        "n_sortmerge_joins": plan.count("SortMergeJoin"),
        "n_bnl_joins": plan.count("BroadcastNestedLoopJoin"),
        "has_cartesian": "CartesianProduct" in plan,
    }
