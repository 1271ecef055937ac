"""Parquet table loaders for the driver's TPC-H-ish test schema (TESTDATA.md).

Plain ``spark.read.parquet`` — Catalyst gets predicate pushdown, column
pruning and partition pruning for free because callers compose filters and
projections on the returned DataFrame before any action.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

from ..schemas import TABLE_NAMES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# The pin happens ONCE per session, not on every load: repeated mutation
# of global session config as a load side effect could silently revert a
# caller's deliberate mid-session override (ADVICE r4).  UTC session time
# is a correctness REQUIREMENT for every timestamp oracle (DuckDB
# compares naive timestamps); a caller who overrides it owns the
# divergence.  The once-marker lives ON the session's own conf — a
# driver-side id()-keyed set would treat a NEW session reusing a
# garbage-collected session's address as already pinned and silently
# skip the UTC pin.
_PIN_MARKER = "spark.dgdb.sessionDefaultsPinned"


def _pin_session_defaults(spark: SparkSession) -> None:
    if spark.conf.get(_PIN_MARKER, None) == "true":
        return
    # must be set before the first nanos-parquet read in this session
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set(_PIN_MARKER, "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
        # generations and TIMESTAMP(MICROS) in others, so branch on the
        # OBSERVED post-read type rather than assuming either:
        #  - int64 (nanosAsLong surfaced a NANOS column): convert to µs with
        #    INTEGER division — a double division of ~1.7e18 ns exceeds the
        #    2^53 mantissa and rounds the tail; truncation matches DuckDB's
        #    ns->µs read of the same file exactly.
        #  - TIMESTAMP_NTZ (MICROS, isAdjustedToUTC=false): cast to the
        #    session-tz TimestampType; the session tz is pinned to UTC so
        #    the wall-clock values are preserved and window/interval
        #    semantics agree with DuckDB's naive timestamps.
        #  - TimestampType already: use as-is.
        _pin_session_defaults(spark)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        if isinstance(ts_type, TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast(TimestampType()))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load all test tables; pins session defaults (UTC timezone, nanos
    read mode) once per session so timestamp semantics agree with the
    DuckDB oracle."""
    _pin_session_defaults(spark)
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
