"""Sketch aggregates: no DuckDB hash-oracle exists (engine-specific
estimates), so accuracy and mergeability are pinned here instead
(SURVEY.md §5: every rows-only gate entry gets a property test)."""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_graph_db_c_spark.registry import REGISTRY, _ensure_loaded
from distributed_graph_db_c_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def _run(spark, name):
    _ensure_loaded()
    return REGISTRY[name].run(spark, SF_DIR)


def test_hll_estimate_within_error_bound(spark):
    got = {
        r["l_returnflag"]: r["approx_parts"]
        for r in _run(spark, "sketch_hll_distinct_parts").collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r["l_returnflag"]: r["exact"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact"))
        .collect()
    }
    assert set(got) == set(exact)
    for flag, e in exact.items():
        assert abs(got[flag] - e) / e < 0.05, (flag, got[flag], e)


def test_hll_union_of_group_sketches_stays_in_error_bound(spark):
    # mergeability IS the scale property: tier-2 rollups consume tier-1
    # sketches without rescanning.  Union is not bit-identical to a
    # single-pass sketch (sparse->dense mode transitions differ), so the
    # contract is: the merged estimate keeps the HLL error bound vs exact.
    merged = _run(spark, "sketch_hll_mergeable_union").collect()[0]["approx_parts_global"]
    li = load_table(spark, SF_DIR, "lineitem")
    exact = li.agg(F.countDistinct("l_partkey").alias("e")).collect()[0]["e"]
    assert abs(merged - exact) / exact < 0.05, (merged, exact)


def test_percentile_approx_within_rank_error(spark):
    rows = _run(spark, "sketch_quantiles_totalprice").collect()
    o = load_table(spark, SF_DIR, "orders")
    for row in rows:
        prio = row["o_orderpriority"]
        vals = sorted(
            r["o_totalprice"]
            for r in o.filter(F.col("o_orderpriority") == prio).collect()
        )
        n = len(vals)
        for q, got in zip([0.25, 0.5, 0.75, 0.95], [row["p25"], row["p50"], row["p75"], row["p95"]]):
            # GK sketch: result's rank within n/accuracy of target rank
            import bisect

            rank = bisect.bisect_left(vals, got)
            assert abs(rank - q * n) <= n / 10000 + 2, (prio, q, rank, n)


def test_approx_count_distinct_rsd(spark):
    rows = _run(spark, "sketch_approx_count_distinct").collect()
    o = load_table(spark, SF_DIR, "orders")
    exact = {
        r["o_orderstatus"]: r["e"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("e"))
        .collect()
    }
    for row in rows:
        e = exact[row["o_orderstatus"]]
        assert abs(row["approx_customers"] - e) / e < 0.06


def test_hll_register_merge_is_exact_and_partition_invariant(spark):
    """The algebra that makes the sketch a first-class value: the
    sketch of A ∪ B has BIT-IDENTICAL registers to the max-merge of
    independent sketches of A and B, and repartitioning never changes
    the merged registers (register max is order/placement-invariant)."""
    from distributed_graph_db_c_spark.operators.hll import (
        hll_sketch,
        merge_registers,
    )

    a = spark.range(0, 5_000).select(F.col("id").alias("k"))
    b = spark.range(3_000, 9_000).select(F.col("id").alias("k"))
    u = a.unionByName(b)
    ra = merge_registers(hll_sketch(a, "k"))
    rb = merge_registers(hll_sketch(b, "k"))
    ru = merge_registers(hll_sketch(u, "k"))
    import numpy as np

    merged = np.maximum(
        np.frombuffer(ra, dtype=np.uint8), np.frombuffer(rb, dtype=np.uint8)
    ).tobytes()
    assert merged == ru
    ru5 = merge_registers(hll_sketch(u.repartition(5), "k"))
    ru32 = merge_registers(hll_sketch(u.repartition(32), "k"))
    assert ru5 == ru32 == ru


def test_hll_estimates_within_error_bounds(spark):
    """p=12 -> sigma ~ 1.04/sqrt(4096) ~ 1.6%; pin 5 sigma for the
    direct estimates.  Intersection stacks three estimator errors on a
    difference, so its bound is on the UNION scale: |err| <= 5 sigma of
    the union cardinality."""
    from distributed_graph_db_c_spark.operators.hll import (
        hll_estimate,
        hll_intersect_estimate,
        hll_sketch,
        hll_union_estimate,
        merge_registers,
    )

    n_a, n_b, lo_b = 20_000, 20_000, 12_000  # true overlap 8,000
    a = spark.range(0, n_a).select(F.col("id").alias("k"))
    b = spark.range(lo_b, lo_b + n_b).select(F.col("id").alias("k"))
    ra = merge_registers(hll_sketch(a, "k"))
    rb = merge_registers(hll_sketch(b, "k"))
    sigma = 1.04 / (4096 ** 0.5)
    true_union = lo_b + n_b
    assert abs(hll_estimate(ra) - n_a) <= 5 * sigma * n_a
    assert abs(hll_estimate(rb) - n_b) <= 5 * sigma * n_b
    assert abs(hll_union_estimate(ra, rb) - true_union) <= 5 * sigma * true_union
    true_inter = n_a - lo_b
    assert abs(hll_intersect_estimate(ra, rb) - true_inter) <= 5 * sigma * true_union


def test_hll_small_range_linear_counting(spark):
    """Tiny cardinalities route through the linear-counting correction:
    30 distinct keys must estimate within +/-2 of 30 at p=12."""
    from distributed_graph_db_c_spark.operators.hll import (
        hll_estimate,
        hll_sketch,
        merge_registers,
    )

    df = spark.range(0, 30).select(F.col("id").alias("k"))
    est = hll_estimate(merge_registers(hll_sketch(df, "k")))
    assert abs(est - 30) <= 2
