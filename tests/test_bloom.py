"""Bloom-filter join pruning (operators/bloom.py): no false negatives
ever, measurable pruning, and a result identical to the plain join."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from distributed_graph_db_c_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_params,
    bloom_pruned_join,
)
from distributed_graph_db_c_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    dim = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_orderpriority")
    )
    return li, dim


def test_no_false_negatives(spark, tables):
    """Every inserted key must pass the probe — the property that makes
    the bloom result-invisible under a verifying join."""
    _, dim = tables
    n = dim.count()
    m, k = bloom_params(n, 0.01)
    bitmap = bloom_build(dim.select("o_orderkey"), "o_orderkey", m, k)
    misses = dim.filter(
        ~bloom_might_contain(F.col("o_orderkey"), bitmap, m, k)
    ).count()
    assert misses == 0


def test_fpp_in_ballpark(spark, tables):
    """Non-member keys pass at roughly the configured rate (<= 5x target
    leaves room for sf0.001 sampling noise on a 1% design point)."""
    li, dim = tables
    n = dim.count()
    m, k = bloom_params(n, 0.01)
    bitmap = bloom_build(dim.select("o_orderkey"), "o_orderkey", m, k)
    nonmembers = (
        li.select("l_orderkey").distinct().join(
            dim, li.l_orderkey == dim.o_orderkey, "left_anti"
        )
    )
    total = nonmembers.count()
    passed = nonmembers.filter(
        bloom_might_contain(F.col("l_orderkey"), bitmap, m, k)
    ).count()
    assert passed / total <= 0.05, f"fp rate {passed}/{total}"


def test_pruned_join_equals_plain(spark, tables):
    li, dim = tables
    got = sorted(
        tuple(r)
        for r in bloom_pruned_join(li, dim, "l_orderkey", "o_orderkey")
        .select("l_orderkey", "l_linenumber", "o_orderpriority")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in li.join(dim, li.l_orderkey == dim.o_orderkey)
        .select("l_orderkey", "l_linenumber", "o_orderpriority")
        .collect()
    )
    assert got == want


def test_pruning_is_effective(spark, tables):
    """The point of the operator: most non-matching fact rows are dropped
    BEFORE the join (map-side), at this dim selectivity >= 60% of them."""
    li, dim = tables
    n = dim.count()
    m, k = bloom_params(n, 0.01)
    bitmap = bloom_build(dim.select("o_orderkey"), "o_orderkey", m, k)
    kept = li.filter(bloom_might_contain(F.col("l_orderkey"), bitmap, m, k)).count()
    assert kept < 0.4 * li.count(), f"kept {kept} of {li.count()}"
