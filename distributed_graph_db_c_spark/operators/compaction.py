"""Small-files compaction — the table-maintenance operator every large
parquet lake needs: many tiny files (streaming micro-batches, over-
parallel writes) turn scans into file-listing + task-scheduling overhead
and starve row-group statistics.  Compaction rewrites a directory into
``ceil(total_bytes / target_file_bytes)`` files, range-partitioned and
sorted on a key so the rewritten files ALSO carry tight min/max footer
stats (the same skipping property the Z-order and partitioned-sink
operators pin).

File inventory comes from the ``_metadata`` hidden column (Spark >= 3.2:
per-row file_path/file_size from the scan itself) — no driver-side
filesystem walking, works on any Hadoop-compatible store; the distinct
(path, size) set is as bounded as the file count being compacted.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def file_inventory(spark: SparkSession, path: str) -> DataFrame:
    """(file_path, file_size) per data file under ``path``."""
    return (
        spark.read.parquet(path)
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("file_size"),
        )
        .distinct()
    )


def plan_compaction(
    spark: SparkSession, path: str, target_file_bytes: int
) -> tuple[int, int, int]:
    """(n_files, total_bytes, n_output_files) for compacting ``path``."""
    rows = file_inventory(spark, path).collect()  # bounded: one row per file
    total = sum(r["file_size"] for r in rows)
    n_out = max(1, math.ceil(total / target_file_bytes))
    return len(rows), total, n_out


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    sort_key: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Rewrite ``src_path`` into ``dst_path`` as ``ceil(total/target)``
    range-partitioned files sorted on ``sort_key`` (tight footer stats).
    Returns (n_files_before, n_files_after planned).  The write is to a
    NEW directory — swap-in is the caller's transaction (the catalog's
    dynamic-overwrite pattern), so readers never see a half-compacted
    table."""
    n_before, _total, n_out = plan_compaction(spark, src_path, target_file_bytes)
    df = spark.read.parquet(src_path)
    (
        df.repartitionByRange(n_out, F.col(sort_key))
        .sortWithinPartitions(sort_key)
        .write.mode("overwrite")
        .parquet(dst_path)
    )
    return n_before, n_out


def compact_in_place(
    spark: SparkSession,
    path: str,
    sort_key: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Compact ``path`` onto itself through ``sinks.replace_table`` —
    the staged write scans the old files, the swap is two renames, and a
    racing reader sees the old file set or the new one, never a mix.
    Returns (n_files_before, n_output_files planned)."""
    from ..sinks import replace_table

    n_before, _total, n_out = plan_compaction(spark, path, target_file_bytes)
    compacted = (
        spark.read.parquet(path)
        .repartitionByRange(n_out, F.col(sort_key))
        .sortWithinPartitions(sort_key)
    )
    replace_table(compacted, path)
    return n_before, n_out
