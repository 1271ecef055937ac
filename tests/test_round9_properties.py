"""Round-9 operator property pins: the de-vacuumed EXCEPT gate, the
covariance significand guard, incremental-dedup gate hygiene, the
IVF-backed kNN gather twin, second-order transitions, tokenizer-scale
OOV, and per-group quantile sketches."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


def test_except_nations_nonvacuous(spark):
    """The r8 verdict's 'what's wrong' item 1: the original EXCEPT gate
    subtracted ALL supplier nations and returned 0 rows at every SF
    (full overlap), so it proved only that both engines return empty.
    The reworked gate subtracts EUROPEAN-supplier nations only; this
    pin states (a) the original full-overlap form IS empty — why the
    rework was needed — and (b) the reworked gate is provably nonempty
    and disjoint from the subtracted side."""
    from distributed_graph_db_c_spark.queries.relational import rel_except_nations
    from distributed_graph_db_c_spark.sources.tables import load_table

    c = load_table(spark, SF01_DIR, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    s_all = load_table(spark, SF01_DIR, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    assert c.subtract(s_all).count() == 0  # (a) the vacuous original

    got = rel_except_nations(spark, SF01_DIR)
    rows = {r["nationkey"] for r in got.collect()}
    assert rows, "reworked EXCEPT gate must be nonempty"
    # (b) disjoint from European supplier nations, subset of customer nations
    n = load_table(spark, SF01_DIR, "nation")
    r = load_table(spark, SF01_DIR, "region").filter(F.col("r_name") == "EUROPE")
    euro = {
        row["s_nationkey"]
        for row in load_table(spark, SF01_DIR, "supplier")
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_nationkey")
        .collect()
    }
    cust = {row["nationkey"] for row in c.distinct().collect()}
    assert rows == cust - euro


def test_covariance_rejects_wide_significands(spark):
    """The r9 advisory's pca.py item: the adaptive block floors at one
    row, but a single product of two >26-significant-bit quantized
    values is already inexact in float64 — shrinking can't save it, so
    covariance_moments must refuse loudly.  Double-typed components at
    |x| ~ 3000 carry full-width significands after quantization (unlike
    the float32 cast in the r8 large-magnitude test, whose 24-bit
    significands keep products exact at any magnitude — that test still
    passes, pinning that the guard keys on significance, not size)."""
    from distributed_graph_db_c_spark.operators.pca import (
        covariance_merge,
        covariance_moments,
    )

    rng = np.random.default_rng(11)
    dim = 4
    data = [
        (int(i), [float(x) for x in rng.standard_normal(dim) * 3000.0])
        for i in range(32)
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="significant bits"):
        covariance_merge(covariance_moments(df, dim=dim), dim=dim)


def test_incremental_gate_leaves_no_claim_marker(spark):
    """The r9 advisory's dedup.py item: a FAILED index build leaves its
    claim marker by design (durable indexes must fail loudly until
    repaired), but the dedup_incremental_pairs gate uses a random
    throwaway prefix — an orphaned marker would litter the shared
    warehouse forever.  The gate's cleanup must drop marker AND tables
    on every exit path."""
    import glob
    import os

    from distributed_graph_db_c_spark.queries.dedup import dedup_incremental_pairs

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    before = set(glob.glob(os.path.join(warehouse, "_incgate_*")))
    dedup_incremental_pairs(spark, SF_DIR).collect()
    after = set(glob.glob(os.path.join(warehouse, "_incgate_*")))
    assert after <= before, f"stray incremental-gate claim markers: {after - before}"
    assert not [t.name for t in spark.catalog.listTables() if t.name.startswith("incgate_")]
