"""Bucketed join: identical results to the plain join, zero Exchange in
the physical plan (the write-time shuffle replaces every query-time one)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from distributed_graph_db_c_spark.operators.bucketing import bucketed_join, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(o, "t_orders_b", "o_orderkey", n_buckets=8)
    write_bucketed(li, "t_lineitem_b", "o_orderkey", n_buckets=8)
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        bucketed_join(spark, lt, rt, on="o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    want = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bucketed_join_plan_has_no_exchange(spark, bucketed_tables):
    # at sf0.001 Catalyst (rightly) broadcasts the small side, which
    # bypasses bucketing; disable auto-broadcast to get the plan both
    # sides compile to at 100 TB, where neither fact fits in memory
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            bucketed_join(spark, lt, rt, on="o_orderkey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_bucketed_scan_prunes_and_selects_buckets(spark, bucketed_tables):
    lt, _ = bucketed_tables
    # single-key lookup on the bucket column: Spark prunes to 1 of 8 buckets.
    # the autoBucketedScan heuristic turns OFF bucketed reading for a bare
    # filter (no join/agg wants the distribution), which also forfeits
    # pruning — pin it off to force the bucketed scan.  (plan toString()
    # truncates the FileScan line; formatted mode doesn't.)
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        df = spark.table(lt).filter(F.col("o_orderkey") == 42)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set(key, prev)
    assert "SelectedBucketsCount: 1 out of 8" in plan
