"""resample_ffill (operators/timeseries.py): grid density, fill
semantics, and non-vacuity of the gate fixture."""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_graph_db_c_spark.operators.timeseries import resample_ffill
from distributed_graph_db_c_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
HOUR_US = 3_600_000_000


def test_dense_grid_and_fill_semantics(spark):
    rows = [
        # key 1: obs in hours 0, 3 (two in 3 -> MAX), gap hours 1-2 filled
        (1, 0, 10.0),
        (1, 3 * 3600, 5.0),
        (1, 3 * 3600 + 60, 7.0),
        # key 2: single observation -> single-row grid
        (2, 7200, 1.5),
    ]
    df = spark.createDataFrame(
        rows, "key long, secs long, value double"
    ).select(
        "key",
        F.timestamp_micros(F.col("secs") * 1_000_000).alias("ts"),
        "value",
    )
    got = {
        (r["key"], r["bucket"]): (r["value"], r["n_obs"])
        for r in resample_ffill(df, "key", "ts", "value", HOUR_US).collect()
    }
    assert got == {
        (1, 0): (10.0, 1),
        (1, 1): (10.0, 0),
        (1, 2): (10.0, 0),
        (1, 3): (7.0, 2),
        (2, 2): (1.5, 1),
    }


def test_gate_fixture_not_vacuous(spark):
    """The events table at gate granularity must actually contain gaps —
    otherwise the forward-fill leg of the oracle checks nothing."""
    ev = load_table(spark, SF_DIR, "events")
    out = resample_ffill(ev, "user_id", "ts", "value", 14_400_000_000)
    filled = out.filter(F.col("n_obs") == 0).count()
    assert filled > 0
    # every filled row carries a (forward-filled) value: grids start at
    # the first observation, so no leading nulls exist
    assert out.filter(F.col("value").isNull()).count() == 0


def test_interpolate_linear_exact_values(spark):
    """Constructed gap: obs at buckets 0 (v=10) and 4 (v=18); buckets
    1-3 must interpolate to 12, 14, 16 exactly (fractions are powers of
    two scaled — exact in doubles)."""
    from distributed_graph_db_c_spark.operators.timeseries import resample_interpolate

    HOUR_US = 3_600_000_000
    df = spark.createDataFrame(
        [(1, 0, 10.0), (1, 4 * 3600, 18.0), (2, 2 * 3600, 5.0)],
        "key long, sec long, value double",
    ).select(
        "key",
        F.timestamp_micros((F.col("sec") * 1_000_000).cast("long")).alias("ts"),
        "value",
    )
    got = {
        (r["key"], r["bucket"]): (r["value"], r["n_obs"])
        for r in resample_interpolate(df, "key", "ts", "value", HOUR_US).collect()
    }
    assert got == {
        (1, 0): (10.0, 1),
        (1, 1): (12.0, 0),
        (1, 2): (14.0, 0),
        (1, 3): (16.0, 0),
        (1, 4): (18.0, 1),
        (2, 2): (5.0, 1),  # singleton key: grid is one observed bucket
    }


def test_interpolate_gate_fixture_not_vacuous(spark):
    """The 4h-grid gate must exercise real interior gaps AND produce no
    nulls (grid spans first..last obs, so both neighbors always exist)."""
    from distributed_graph_db_c_spark.operators.timeseries import resample_interpolate

    ev = load_table(spark, SF_DIR, "events")
    out = resample_interpolate(ev, "user_id", "ts", "value", 14_400_000_000)
    assert out.filter(F.col("n_obs") == 0).count() > 0
    assert out.filter(F.col("value").isNull()).count() == 0
