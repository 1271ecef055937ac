"""Compaction operator: bin-packing arithmetic, row preservation, and the
tight-footer-stats property of the range-partitioned rewrite."""

from __future__ import annotations

import glob
import math

import pyspark.sql.functions as F
import pytest

from distributed_graph_db_c_spark.operators.compaction import (
    compact_small_files,
    file_inventory,
    plan_compaction,
)


@pytest.fixture()
def small_files_dir(spark, tmp_path):
    src = str(tmp_path / "small")
    spark.range(0, 10000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("v")
    ).repartition(32).write.mode("overwrite").parquet(src)
    return src


def test_inventory_matches_filesystem(spark, small_files_dir):
    inv = file_inventory(spark, small_files_dir).collect()
    on_disk = glob.glob(f"{small_files_dir}/part-*.parquet")
    assert len(inv) == len(on_disk) == 32
    import os

    # file_path URI prefix varies (file:/ vs file:///) — compare by basename
    sizes = {os.path.basename(r["file_path"]): r["file_size"] for r in inv}
    for p in on_disk:
        assert sizes[os.path.basename(p)] == os.path.getsize(p)


def test_plan_bin_packing(spark, small_files_dir):
    target = 40_000
    n_files, total, n_out = plan_compaction(spark, small_files_dir, target_file_bytes=target)
    assert n_files == 32
    assert n_out == math.ceil(total / target)
    # degenerate targets
    assert plan_compaction(spark, small_files_dir, 1 << 40)[2] == 1


def test_compact_preserves_rows_and_tightens_stats(spark, small_files_dir, tmp_path):
    dst = str(tmp_path / "compacted")
    n_before, n_after = compact_small_files(
        spark, small_files_dir, dst, "k", target_file_bytes=100_000
    )
    assert n_before == 32
    src_df = spark.read.parquet(small_files_dir)
    dst_df = spark.read.parquet(dst)
    assert dst_df.count() == 10000
    assert (
        dst_df.agg(F.sum("k")).collect()[0][0]
        == src_df.agg(F.sum("k")).collect()[0][0]
    )
    files = glob.glob(f"{dst}/part-*.parquet")
    assert len(files) == n_after < 32
    # range-partitioned + sorted: per-file key ranges must be disjoint
    # (the footer-stats skipping property) — derive ranges via _metadata
    ranges = (
        dst_df.select("k", F.col("_metadata.file_path").alias("f"))
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev["hi"] < cur["lo"], "file key ranges overlap -> stats useless"
