"""Unit tests for the custom temporal join operators (operators/joins.py):
as-of join (union-and-window) and range join (bucketized band join).
Expected values computed by hand / brute force over tiny synthetic frames.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from distributed_graph_db_c_spark.operators.joins import asof_join, range_join


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_picks_latest_strictly_prior(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), 100, 10.0), (1, _ts(10), 101, 20.0), (2, _ts(5), 102, 99.0)],
        "user_id int, ts timestamp, event_id int, value double",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), 200),   # after left@0 -> 10.0
            (1, _ts(10), 201),  # tie on ts with left@10; 101 < 201 -> 20.0
            (1, _ts(20), 202),  # after both -> 20.0
            (2, _ts(0), 203),   # before the only user-2 left row -> null
            (3, _ts(0), 204),   # no user-3 left rows -> null
        ],
        "user_id int, ts timestamp, event_id int",
    )
    out = asof_join(left, right, on="user_id", value_cols=["value"])
    got = {r["event_id"]: r["value_asof"] for r in out.collect()}
    assert got == {200: 10.0, 201: 20.0, 202: 20.0, 203: None, 204: None}


def test_asof_join_tie_uses_seq_order(spark):
    # Right row at the exact ts of a left row with a SMALLER seq sees it;
    # with a larger seq it does not.
    left = spark.createDataFrame(
        [(1, _ts(10), 500, 7.0)], "user_id int, ts timestamp, event_id int, value double"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 499), (1, _ts(10), 501)],
        "user_id int, ts timestamp, event_id int",
    )
    got = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(left, right, on="user_id", value_cols=["value"]).collect()
    }
    assert got == {499: None, 501: 7.0}


def test_range_join_band_and_bucket_edges(spark):
    # Band = 60 s. Pairs chosen to straddle bucket boundaries: probe at
    # 0:59 and build at 1:01 sit in different buckets but within the band.
    probe = spark.createDataFrame(
        [(1, _ts(0, 59), 1), (1, _ts(5), 2), (2, _ts(0), 3)],
        "user_id int, ts timestamp, event_id int",
    )
    build = spark.createDataFrame(
        [(1, _ts(1, 1), 10), (1, _ts(1, 59), 11), (1, _ts(3), 12), (2, _ts(1), 13)],
        "user_id int, ts timestamp, event_id int",
    )
    out = range_join(probe, build, on="user_id", band_seconds=60)
    pairs = {(r["probe_id"], r["build_id"]): r["dt_micros"] for r in out.collect()}
    assert pairs == {
        (1, 10): 2_000_000,     # 0:59 -> 1:01
        (1, 11): 60_000_000,    # 0:59 -> 1:59, exactly at the band edge
        (3, 13): 60_000_000,    # 0:00 -> 1:00
    }


def test_range_join_no_duplicate_pairs(spark):
    # The 3-bucket replication must not double-count a pair.
    probe = spark.createDataFrame(
        [(1, _ts(1), 1)], "user_id int, ts timestamp, event_id int"
    )
    build = spark.createDataFrame(
        [(1, _ts(1, 30), 2)], "user_id int, ts timestamp, event_id int"
    )
    out = range_join(probe, build, on="user_id", band_seconds=300)
    assert out.count() == 1


def test_asof_join_exact_tie_left_counts_as_prior(spark):
    # A left row whose (ts, seq) EXACTLY equals the right row's is matched
    # deterministically (the window sorts left before right on full ties) —
    # previously this depended on shuffle order.
    left = spark.createDataFrame(
        [(1, _ts(10), 500, 7.0)], "user_id int, ts timestamp, event_id int, value double"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 500)], "user_id int, ts timestamp, event_id int"
    )
    for _ in range(3):  # repeated runs: same answer every time
        got = {
            r["event_id"]: r["value_asof"]
            for r in asof_join(left, right, on="user_id", value_cols=["value"]).collect()
        }
        assert got == {500: 7.0}


def test_asof_join_strict_excludes_exact_tie(spark):
    # strict=True is strictly-before: the exactly-tying left row is NOT a
    # match (the tie semantics the asof_join_events oracle states); an
    # earlier left row still is.
    left = spark.createDataFrame(
        [(1, _ts(9), 400, 5.0), (1, _ts(10), 500, 7.0)],
        "user_id int, ts timestamp, event_id int, value double",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 500)], "user_id int, ts timestamp, event_id int"
    )
    got = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(
            left, right, on="user_id", value_cols=["value"], strict=True
        ).collect()
    }
    assert got == {500: 5.0}
