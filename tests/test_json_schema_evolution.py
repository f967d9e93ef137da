"""E28 — semi-structured JSON columns + schema-evolution reads:
pinned-schema parse vs a DuckDB json_extract oracle, corrupt-payload
quarantine routing, sampled schema inference, and mergeSchema reads
where old files null-fill newly added columns."""

from __future__ import annotations

import tempfile

import duckdb
from pyspark.sql import functions as F

from big_data_bowl___2023_spark.functions.json_ops import (
    infer_props_schema,
    json_path,
    parse_json_column,
)
from big_data_bowl___2023_spark.sources.io import (
    load_table,
    read_parquet_evolved,
)


def test_parse_props_rollup_vs_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    parsed = parse_json_column(ev, "props", "k BIGINT")
    got = {(r.event_type, r.n, r.avg_k) for r in
           (parsed.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg(F.col("props_parsed.k")), 6)
                 .alias("avg_k"))).collect()}

    con = duckdb.connect()
    con.sql(f"CREATE VIEW ev AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'")
    oracle = con.sql("""
        SELECT event_type, COUNT(*) AS n,
               ROUND(AVG(CAST(json_extract(props, '$.k') AS BIGINT)), 6)
                   AS avg_k
        FROM ev GROUP BY event_type""").fetchall()
    assert got == {(t, n, a) for t, n, a in oracle}
    assert len(got) > 0


def test_corrupt_payload_quarantine(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, "not json {"), (3, None), (4, '{"k": 7}')],
        ["id", "props"])
    out = parse_json_column(df, "props", "k BIGINT")
    rows = {r.id: (r.props_parsed, r.props_corrupt)
            for r in out.collect()}
    assert rows[1][0].k == 5 and rows[1][1] is False
    assert rows[2][0] is None and rows[2][1] is True   # garbage: flagged
    assert rows[3][0] is None and rows[3][1] is False  # null: not corrupt
    assert rows[4][0].k == 7 and rows[4][1] is False
    # quarantine routing keeps every input row exactly once
    good = out.filter(~F.col("props_corrupt"))
    bad = out.filter(F.col("props_corrupt"))
    assert good.count() + bad.count() == df.count()


def test_infer_schema_then_parse(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    ddl = infer_props_schema(ev, "props", sample_rows=20)
    assert "k" in ddl
    parsed = parse_json_column(ev, "props", ddl)
    assert parsed.filter(F.col("props_corrupt")).count() == 0
    # single-field path extraction agrees with the struct parse
    both = parsed.select(
        F.col("props_parsed.k").cast("string").alias("a"),
        json_path(F.col("props"), "$.k").alias("b"))
    assert both.filter(F.col("a") != F.col("b")).count() == 0


def test_merge_schema_reads_evolved_files(spark):
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    v2 = spark.createDataFrame([(3, "c", 9.5), (4, "d", 7.0)],
                               ["id", "name", "score"])
    with tempfile.TemporaryDirectory() as tmp:
        v1.write.parquet(f"{tmp}/t/batch=1")
        v2.write.parquet(f"{tmp}/t/batch=2")
        merged = read_parquet_evolved(spark, f"{tmp}/t")
        assert set(merged.columns) >= {"id", "name", "score"}
        rows = {r.id: r.score for r in merged.collect()}
        assert rows[1] is None and rows[2] is None  # old files null-fill
        assert rows[3] == 9.5 and rows[4] == 7.0
        # plain read without mergeSchema would pick ONE footer; the
        # evolved read sees all rows
        assert merged.count() == 4
