"""The correctness driver owns the SparkSession — the engine must produce
oracle-identical results even when the session arrives with hostile
defaults (non-UTC timezone is the killer: every timestamp gate compares
against DuckDB's naive timestamps).  sources/tables.py pins UTC once per
session before the first events read; this test proves the pin recovers
a session that was switched AWAY from UTC."""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_graph_db_c_spark.sources import tables
from distributed_graph_db_c_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_events_load_repins_non_utc_session(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        spark.conf.unset(tables._PIN_MARKER)  # simulate a fresh session
        ev = load_table(spark, SF_DIR, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        # wall-clock micros must match DuckDB's naive read of the file
        import duckdb

        got = ev.agg(
            # decimal: the int64 sum of ~60k epoch-µs values overflows
            F.sum(F.unix_micros("ts").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n"),
        ).first()
        want = duckdb.sql(
            f"SELECT SUM(epoch_us(ts)) s, COUNT(*) n FROM '{SF_DIR}/events.parquet'"
        ).fetchone()
        assert (got["s"], got["n"]) == (int(want[0]), int(want[1]))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
        spark.conf.set(tables._PIN_MARKER, "true")
