"""SQL entry point: register the star schema as temp views.

The engine's operators are DataFrame-first, but Spark SQL over the
same relations is a first-class access path — ad-hoc analysis, BI
handoff, and porting the reference's dplyr chains as plain SQL all go
through ``spark.sql``. Views registered here read via
``sources.io.load_table``, so SQL users get the SAME normalized
relations the DataFrame API sees (notably the type-adaptive
``events.ts`` handling — a raw ``spark.read.parquet`` view would
expose whichever physical timestamp encoding the files carry).

Temp views are metadata only: Catalyst inlines them, so predicate
pushdown, column pruning, and join planning through a view are
identical to the DataFrame plan (asserted in tests). At cluster
scale the same shape becomes persistent catalog tables (Hive
metastore / Unity-style) — the registration seam is this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.io import load_table

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def register_star_schema(spark: SparkSession, sf_dir: str,
                         tables: tuple[str, ...] = TABLES,
                         suffix: str = "") -> list[str]:
    """Create one temp view per table (optionally suffixed, e.g. for
    side-by-side scale factors); returns the view names."""
    names = []
    for t in tables:
        name = f"{t}{suffix}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-call SQL over the star schema: register (idempotent) and
    run. The returned DataFrame composes with every engine operator —
    views and DataFrames are the same logical plan language."""
    register_star_schema(spark, sf_dir)
    return spark.sql(query)
