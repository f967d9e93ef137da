"""E26 — Z-ordered parquet layout: every z-ordered column's per-file
min/max span must shrink (the property multi-column file skipping
relies on), where single-key clustering leaves the second column at
full span; plus round-trip integrity and an unchanged written schema.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from big_data_bowl___2023_spark.sources.io import (
    load_table,
    write_parquet_clustered,
    write_parquet_zordered,
)


def _avg_span(spark, path: str, col: str, lo: float, hi: float) -> float:
    """Mean per-file (max-min)/global-range for ``col``."""
    per_file = (spark.read.parquet(path)
                .groupBy(F.input_file_name())
                .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
                .collect())
    return sum((r.hi - r.lo) / (hi - lo) for r in per_file) / len(per_file)


def test_zorder_bounds_both_columns(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(F.min("l_partkey"), F.max("l_partkey"),
                   F.min("l_quantity"), F.max("l_quantity")).collect()[0]
    pk_lo, pk_hi, q_lo, q_hi = stats

    with tempfile.TemporaryDirectory() as tmp:
        zpath, cpath = f"{tmp}/z", f"{tmp}/c"
        write_parquet_zordered(li, zpath, ["l_partkey", "l_quantity"],
                               num_files=16)
        write_parquet_clustered(li, cpath, ["l_partkey"], num_files=16)

        z_pk = _avg_span(spark, zpath, "l_partkey", pk_lo, pk_hi)
        z_q = _avg_span(spark, zpath, "l_quantity", q_lo, q_hi)
        c_pk = _avg_span(spark, cpath, "l_partkey", pk_lo, pk_hi)
        c_q = _avg_span(spark, cpath, "l_quantity", q_lo, q_hi)

        # single-key clustering: near-perfect on the key, useless on
        # the other column
        assert c_pk < 0.2
        assert c_q > 0.8
        # z-order: BOTH columns materially bounded per file
        assert z_pk < 0.7
        assert z_q < 0.7

        # integrity: same rows, schema unchanged (no __z leak)
        back = spark.read.parquet(zpath)
        assert back.columns == li.columns
        assert back.count() == li.count()
        assert (back.agg(F.sum(F.col("l_extendedprice")
                               .cast("decimal(18,2)"))).collect()[0][0]
                == li.agg(F.sum(F.col("l_extendedprice")
                                .cast("decimal(18,2)"))).collect()[0][0])


def test_zorder_skips_files_for_predicates_on_either_column(spark, sf_dir):
    """Row-group/file skipping evidence: a tight predicate on either
    z-ordered column must scan fewer files than exist."""
    li = load_table(spark, sf_dir, "lineitem")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/z"
        write_parquet_zordered(li, path, ["l_partkey", "l_quantity"],
                               num_files=16)
        back = spark.read.parquet(path)
        n_files = back.select(F.input_file_name()).distinct().count()

        for col, probe in (("l_partkey", 10), ("l_quantity", 3)):
            touched = (back.filter(F.col(col) == probe)
                       .select(F.input_file_name())
                       .distinct().count())
            assert touched < n_files, (col, touched, n_files)
