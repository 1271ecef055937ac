"""Parquet table loaders for the driver's TPC-H-ish test schema (TESTDATA.md).

Plain ``spark.read.parquet`` — Catalyst gets predicate pushdown, column
pruning and partition pruning for free because callers compose filters and
projections on the returned DataFrame before any action.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..schemas import TABLE_NAMES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects outright; read the raw int64 and convert to
        # microseconds with INTEGER division (a double division of ~1.7e18
        # ns exceeds the 2^53 mantissa and rounds the tail).  Truncation to
        # µs matches DuckDB's ns->µs read of the same file exactly.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load all test tables; also pins session timezone to UTC so
    date/timestamp semantics agree with the DuckDB oracle."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
