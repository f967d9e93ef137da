"""E35/E36 — skew profiler (report vs DuckDB; stats contract on a
hand-skewed fixture) and source breadth (ORC round trip with pushdown,
binaryFile ingestion feeding the multimodal decode path)."""

from __future__ import annotations

import os
import tempfile

import duckdb
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.operators.skew import (
    skew_report,
    skew_stats,
)
from big_data_bowl___2023_spark.sources.io import (
    load_table,
    read_binary_files,
    read_orc,
    write_orc,
)


def test_skew_report_vs_duckdb(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = [(r.l_suppkey, r.n_rows, r.share, r.cum_share, r.rank)
           for r in skew_report(li, ["l_suppkey"], top_n=5).collect()]

    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
            f"'{sf_dir}/lineitem.parquet'")
    oracle = con.sql("""
        WITH c AS (SELECT l_suppkey, COUNT(*) AS n FROM lineitem
                   GROUP BY 1),
        r AS (SELECT l_suppkey, n,
                     ROUND(n / CAST(SUM(n) OVER () AS DOUBLE), 6) AS share,
                     ROW_NUMBER() OVER (ORDER BY n DESC, l_suppkey) AS rk
              FROM c)
        SELECT l_suppkey, n, share,
               ROUND(SUM(share) OVER (ORDER BY rk), 6), rk
        FROM r WHERE rk <= 5 ORDER BY rk""").fetchall()
    assert got == [tuple(r) for r in oracle]


def test_skew_stats_on_hand_skewed_fixture(spark):
    # one key with 900 rows, 100 keys with 1 row each
    df = (spark.range(1000)
          .select(F.when(F.col("id") < 900, F.lit(0))
                  .otherwise(F.col("id")).alias("k")))
    s = skew_stats(df, ["k"])
    assert s["n_keys"] == 101 and s["n_rows"] == 1000
    assert s["max_per_key"] == 900
    assert s["top_share"] == 0.9
    # hottest key ≈ 90x the mean -> suggested salts ~90
    assert 80 <= s["suggested_salts"] <= 100


def test_orc_round_trip_with_pushdown(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory() as tmp:
        write_orc(orders, f"{tmp}/orders_orc")
        back = read_orc(spark, f"{tmp}/orders_orc")
        assert back.count() == orders.count()
        assert (back.agg(F.sum(F.col("o_totalprice")
                               .cast("decimal(18,2)"))).collect()[0][0]
                == orders.agg(F.sum(F.col("o_totalprice")
                                    .cast("decimal(18,2)"))
                              ).collect()[0][0])
        q = back.filter(F.col("o_orderkey") < 100).select("o_orderkey")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "o_orderkey" in plan


def test_binary_file_ingestion(spark):
    with tempfile.TemporaryDirectory() as tmp:
        payloads = {f"img_{i}.bin": bytes([i]) * (10 + i)
                    for i in range(5)}
        for name, blob in payloads.items():
            with open(os.path.join(tmp, name), "wb") as fh:
                fh.write(blob)
        with open(os.path.join(tmp, "ignore.txt"), "w") as fh:
            fh.write("not an asset")

        df = read_binary_files(spark, tmp, glob_filter="*.bin")
        rows = {os.path.basename(r.path): r for r in df.collect()}
        assert set(rows) == set(payloads)
        for name, blob in payloads.items():
            assert bytes(rows[name].content) == blob
            assert rows[name].length == len(blob)
