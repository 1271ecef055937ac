"""Incremental heavy-hitters over a stream — summary-per-micro-batch.

The streaming form of ``operators/frequency.py``: each micro-batch
reduces to its own Misra–Gries summary (<= capacity rows) persisted
under ``state_dir/batch=<id>``.  Writing BY batch id makes replay
IDEMPOTENT under foreachBatch's at-least-once contract — a re-run of
batch N overwrites batch N's summary rather than double-counting, the
same discipline as the MERGE-keyed upsert gate.  The corpus-level
sketch is reconstructed on read by ``merge_summaries`` (sum counts,
sum per-batch error, re-truncate) — mergeability is exactly what makes
the sketch streamable: no raw row is ever revisited, state is
O(batches x capacity), and compacting old batch summaries into one is
itself just another merge.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.frequency import misra_gries

SUMMARY_DDL = "item string, est_count long, err_ub long, batch long"


def incremental_freq_items(
    state_dir: str, col: str, capacity: int
) -> Callable[[DataFrame, int], None]:
    """foreachBatch handler: persist this micro-batch's Misra–Gries
    summary of ``col`` under ``state_dir/batch=<batch_id>``."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        summary = misra_gries(batch_df, col, capacity).withColumn(
            "batch", F.lit(int(batch_id)).cast("long")
        )
        summary.write.mode("overwrite").parquet(f"{state_dir}/batch={batch_id}")

    return handle


def read_merged_freq_items(spark, state_dir: str, capacity: int) -> DataFrame:
    """Merge every persisted batch summary into one corpus-level
    summary ``(item, est_count, err_ub)``.  The batch id is read from
    the ``batch`` column the handler PERSISTED in every row —
    ``recursiveFileLookup`` disables directory-name partition
    inference, so the merge survives any future file move, compaction,
    or path rewrite that the dir-name-regex alternative would not."""
    from ..operators.frequency import merge_summaries

    with_batch = (
        spark.read.schema("item string, est_count long, err_ub long, batch long")
        .option("recursiveFileLookup", "true")
        .parquet(state_dir)
    )
    return merge_summaries(with_batch, capacity, group_col="batch")
