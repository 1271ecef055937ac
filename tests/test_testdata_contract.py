"""Testdata contract: every driver table must load through ``load_table``
with the schema the queries and the DuckDB oracle both assume.

Round 3 post-mortem: the driver regenerated /root/testdata with events.ts
as parquet timestamp[us] while the loader was hard-wired to int64-nanos —
13 queries, 6 pytests and the whole bench broke at the DRIVER, while the
committed local records stayed green against the stale data.  This test
makes the next silent regeneration fail locally instead.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    BinaryType,
    NumericType,
    StringType,
    TimestampType,
)

from distributed_graph_db_c_spark.schemas import TABLE_NAMES
from distributed_graph_db_c_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_all_tables_load_and_have_rows(spark):
    for name in TABLE_NAMES:
        df = load_table(spark, SF_DIR, name)
        assert df.limit(1).count() == 1, f"{name} is empty"


def test_events_ts_is_session_tz_timestamp(spark):
    """The post-load contract every events consumer (as-of join, range
    join, sessionization, streaming windows, resample) relies on: ``ts``
    is a plain TimestampType regardless of the parquet physical type
    (int64-nanos, timestamp[us]/NTZ, or timestamp[us] UTC-adjusted)."""
    ev = load_table(spark, SF_DIR, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType), (
        f"events.ts loaded as {ev.schema['ts'].dataType}; "
        "load_table must normalize to TimestampType"
    )
    # And it must actually evaluate (the r03 failure was at analysis time).
    row = ev.select("ts").limit(1).collect()[0]
    assert row["ts"] is not None


def test_key_column_contract(spark):
    """Columns the query suite depends on, by (table, column, type-class)."""
    expect = {
        "lineitem": [("l_orderkey", NumericType), ("l_quantity", NumericType)],
        "orders": [("o_orderkey", NumericType), ("o_totalprice", NumericType)],
        "customer": [("c_custkey", NumericType)],
        "events": [
            ("event_id", NumericType),
            ("user_id", NumericType),
            ("event_type", StringType),
            ("value", NumericType),
        ],
        "documents": [("doc_id", NumericType), ("text", StringType)],
        "embeddings": [("vec_id", NumericType)],
    }
    for table, cols in expect.items():
        schema = load_table(spark, SF_DIR, table).schema
        names = set(schema.fieldNames())
        for col, tclass in cols:
            assert col in names, f"{table}.{col} missing (has {sorted(names)})"
            assert isinstance(schema[col].dataType, tclass), (
                f"{table}.{col} is {schema[col].dataType}, expected {tclass.__name__}"
            )


def test_documents_binary_payload(spark):
    """Multimodal operators require documents.payload (or equivalent binary
    column) — locate at least one binary column if the generator ships one;
    tolerate absence but pin the text column either way."""
    docs = load_table(spark, SF_DIR, "documents")
    assert isinstance(docs.schema["text"].dataType, StringType)
    binary_cols = [
        f.name for f in docs.schema.fields if isinstance(f.dataType, BinaryType)
    ]
    # The multimodal suite reads whichever binary column exists; record the
    # contract that text itself is NOT binary (decode plumbing synthesizes
    # payloads when the generator ships none).
    assert "text" not in binary_cols
