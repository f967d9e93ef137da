"""SQL entry point (catalog.py): SQL over registered views must be
plan- and result-identical to the DataFrame API, with pushdown intact
through the view."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl___2023_spark import catalog
from big_data_bowl___2023_spark.sources.io import load_table


def test_sql_matches_dataframe_q1(spark, sf_dir):
    """The reference-shaped pricing summary written as plain SQL
    equals the registry's DataFrame implementation row-for-row."""
    from big_data_bowl___2023_spark import registry

    got = catalog.sql(spark, sf_dir, """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                   AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                   * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_charge,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
    ref = registry.all_queries()["q1_pricing_summary"](spark, sf_dir)
    got_rows = [tuple(r) for r in got.collect()]
    ref_rows = sorted([tuple(r) for r in ref.collect()],
                      key=lambda t: (t[0], t[1]))
    assert got_rows == ref_rows


def test_view_keeps_pushdown_and_pruning(spark, sf_dir):
    """Temp views are inlined by Catalyst: a filtered 2-column SQL
    projection reaches the parquet scan with pushed filters and a
    pruned ReadSchema, exactly like the DataFrame plan."""
    catalog.register_star_schema(spark, sf_dir)
    q = spark.sql("""SELECT o_orderkey, o_totalprice FROM orders
                     WHERE o_orderstatus = 'F'""")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(o_orderstatus,F)" in plan
    read = plan.split("ReadSchema")[1][:200]
    assert "o_orderpriority" not in read and "o_custkey" not in read


def test_events_view_is_ts_normalized(spark, sf_dir):
    """The events view must carry the load_table-normalized ts (a
    session TimestampType), not the raw physical encoding — SQL and
    DataFrame users see identical values."""
    catalog.register_star_schema(spark, sf_dir)
    sql_ts = spark.sql(
        "SELECT event_id, ts FROM events ORDER BY event_id LIMIT 5"
    ).collect()
    df_ts = (load_table(spark, sf_dir, "events")
             .select("event_id", "ts")
             .orderBy("event_id").limit(5).collect())
    assert [tuple(r) for r in sql_ts] == [tuple(r) for r in df_ts]


def test_sql_composes_with_operators(spark, sf_dir):
    """A view-born DataFrame drops into engine operators unchanged —
    same logical-plan language."""
    from big_data_bowl___2023_spark.operators.joins import semi_join

    catalog.register_star_schema(spark, sf_dir)
    heavy = spark.sql(
        "SELECT l_orderkey AS o_orderkey FROM lineitem "
        "WHERE l_quantity >= 30")
    orders = load_table(spark, sf_dir, "orders")
    out = semi_join(orders.select("o_orderkey", "o_totalprice"),
                    heavy, ["o_orderkey"])
    n = out.count()
    ref = (load_table(spark, sf_dir, "lineitem")
           .filter(F.col("l_quantity") >= 30)
           .select("l_orderkey").distinct().count())
    assert n == ref
