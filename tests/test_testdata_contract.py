"""Testdata contract: pin the shape of /root/testdata the engine
depends on, so a driver-side regeneration (new encodings, dropped
columns) fails HERE as one named assertion instead of wrecking the
suite downstream. Round 3's events.ts nanos→micros drift motivated
this file (VERDICT r3, next-round #4).

Only load-bearing properties are pinned — table presence, key columns
with the dtypes queries branch on, and events.ts landing as a sane
calendar timestamp after the type-adaptive loader.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_bowl___2023_spark.sources.io import load_table

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# column → acceptable Spark types after load_table (per-table spot
# checks of the dtypes that queries actually branch on).
KEY_DTYPES = {
    "lineitem": {
        "l_orderkey": (T.LongType,),
        "l_quantity": (T.DoubleType,),
        "l_shipdate": (T.TimestampType, T.TimestampNTZType),
    },
    "orders": {
        "o_orderkey": (T.LongType,),
        "o_orderdate": (T.TimestampType, T.TimestampNTZType),
    },
    "events": {
        "event_id": (T.LongType,),
        "ts": (T.TimestampType,),  # loader normalizes nanos AND micros
        "user_id": (T.LongType,),
        "event_type": (T.StringType,),
        "value": (T.DoubleType,),
    },
    "documents": {
        "doc_id": (T.LongType,),
        "text": (T.StringType,),
        "lang": (T.StringType,),
        "source": (T.StringType,),
    },
    "embeddings": {
        "vec_id": (T.LongType,),
        "embedding": (T.ArrayType,),
        "label": (T.IntegerType, T.LongType),
    },
}


@pytest.mark.parametrize("name", TABLES)
def test_table_loads_nonempty(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    assert df.limit(1).count() == 1, f"{name} is empty"


@pytest.mark.parametrize("name", sorted(KEY_DTYPES))
def test_key_dtypes(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    fields = {f.name: f.dataType for f in df.schema.fields}
    for col, allowed in KEY_DTYPES[name].items():
        assert col in fields, f"{name}.{col} missing"
        assert isinstance(fields[col], allowed), (
            f"{name}.{col} is {fields[col]}, expected one of {allowed}")


def test_events_ts_is_calendar_time(spark, sf_dir):
    """The round-3 failure mode: a mis-decoded epoch collapses every
    ts to ~1970 and windows silently merge. Pin year > 2000."""
    ev = load_table(spark, sf_dir, "events")
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).first()
    assert mn.year > 2000, f"events.ts decoded to {mn} — epoch bug"
    assert mx >= mn


def test_embedding_element_numeric(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    elem = emb.schema["embedding"].dataType.elementType
    assert isinstance(elem, (T.FloatType, T.DoubleType)), elem
