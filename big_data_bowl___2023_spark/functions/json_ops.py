"""Semi-structured (JSON string) column handling.

Event and log tables at corpus scale carry a free-form JSON payload
column (``events.props`` here). The scale rules:

* ALWAYS parse with an explicit schema — ``from_json`` with a pinned
  struct is a codegen expression; schema inference over 100 TB is a
  second full scan. ``infer_props_schema`` does the inference ONCE
  over a bounded sample and returns a DDL string to pin in code.
* malformed payloads must not kill the pipeline NOR vanish silently:
  ``parse_json_column`` marks rows whose payload failed to parse
  (PERMISSIVE null-out) so they can be quarantined/audited, the same
  routing contract the validation suite applies to constraint rows.
* path extraction for one-off fields uses ``get_json_object``
  (no struct materialization); repeated access should parse once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def infer_props_schema(df: DataFrame, col: str,
                       sample_rows: int = 100) -> str:
    """DDL schema string from a bounded sample (one tiny job, never a
    full scan): schema_of_json over each sampled payload, widest
    result wins (longest DDL ≈ most fields seen)."""
    sample = [r[0] for r in
              df.select(col).filter(F.col(col).isNotNull())
              .limit(sample_rows).collect()]
    if not sample:
        raise ValueError(f"no non-null {col!r} values to sample")
    # schema_of_json requires a foldable argument — one local job over
    # literal payloads
    exprs = [F.schema_of_json(F.lit(s)).alias(f"s{i}")
             for i, s in enumerate(sample)]
    row = df.sparkSession.range(1).select(*exprs).collect()[0]
    return max(list(row), key=len)


def parse_json_column(df: DataFrame, col: str, schema: str,
                      parsed_col: str = "props_parsed",
                      corrupt_col: str = "props_corrupt") -> DataFrame:
    """Pinned-schema parse + corrupt marker.

    ``from_json`` in PERMISSIVE mode yields an all-null struct for
    garbage — indistinguishable from a legitimately empty payload — so
    the parse carries a ``columnNameOfCorruptRecord`` field: Spark
    stores the raw text there iff the payload failed to parse, and the
    marker is its non-nullness. Corrupt rows can then be routed
    (filter on the marker) instead of silently becoming nulls
    downstream."""
    from pyspark.sql import types as T

    crpt = "_corrupt_record"
    st = T.StructType.fromDDL(schema)  # accepts both "a INT, b ..."
    full = T.StructType(                # and "STRUCT<a: INT, ...>" DDL
        list(st.fields) + [T.StructField(crpt, T.StringType())])
    parsed = F.from_json(F.col(col), full,
                         {"columnNameOfCorruptRecord": crpt})
    keep = [f.name for f in st.fields]
    is_corrupt = F.col(f"__p.{crpt}").isNotNull()
    return (df.withColumn("__p", parsed)
            .withColumn(corrupt_col, is_corrupt)
            .withColumn(parsed_col,
                        F.when(~is_corrupt & F.col(col).isNotNull(),
                               F.struct(*[F.col(f"__p.{f}")
                                          for f in keep])))
            .drop("__p"))


def json_path(col, path: str) -> F.Column:
    """One-field extraction without struct materialization
    (``get_json_object`` — for single-use fields in filters)."""
    return F.get_json_object(col, path)
