"""Streaming source/sink plumbing: stage a batch table as a multi-file
parquet directory (one file per intended micro-batch) and run a streaming
query to completion with the availableNow trigger.

The reference's transport is a SysV message queue drained by a blocking
``msgrcv`` loop (`secondary_server.c:636`, `primary_server.c:193`); the
Spark-native equivalent is a file-stream source — `maxFilesPerTrigger=1`
makes each staged file one micro-batch, and availableNow drains the
backlog then stops, which is what a deterministic test/oracle run needs.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

# Scratch lives inside the repo (gitignored) — nothing outside /root/repo
# is ever written.
SCRATCH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch")


def scratch_dir(label: str) -> str:
    d = os.path.join(SCRATCH_ROOT, f"{label}-{uuid.uuid4().hex[:8]}")
    os.makedirs(d, exist_ok=True)
    return d


def stage_stream_dir(frames: list[DataFrame], out_dir: str, start: int = 0) -> str:
    """Write each DataFrame as one single-file parquet batch under
    ``out_dir`` with strictly increasing mtimes, so a file-stream source
    with maxFilesPerTrigger=1 replays them in order.

    ``start`` offsets the batch index (round 14): staging a SECOND
    tranche into the same directory with ``start=<prior count>`` gives
    the new files later names and mtimes, so an availableNow rerun of
    the same checkpoint picks up exactly the new batches — the
    stop/maintain/resume pattern the mid-stream compaction and retrain
    pins drive."""
    os.makedirs(out_dir, exist_ok=True)
    for i, df in enumerate(frames, start=start):
        tmp = os.path.join(out_dir, f"_stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        final = os.path.join(out_dir, f"batch{i:04d}.parquet")
        shutil.move(os.path.join(tmp, part), final)
        shutil.rmtree(tmp)
        os.utime(final, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return out_dir


def read_file_stream(
    spark: SparkSession, path: str, schema, files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )


def run_available_now(
    out: DataFrame,
    checkpoint: str,
    foreach_batch=None,
    query_name: str | None = None,
    output_mode: str = "update",
) -> None:
    """Drain the stream with trigger(availableNow): process every staged
    file honouring maxFilesPerTrigger, then stop.  Either into foreachBatch
    or an in-memory sink named ``query_name``.

    Stateful operators pin their state-store partition count to
    ``spark.sql.shuffle.partitions`` AT QUERY START, and every micro-batch
    commits every state-store instance's checkpoint delta — at gate scale
    that per-trigger I/O (32 instances x N batches of ~empty deltas)
    dominates wall time, not the plan.  The gates' state is tiny, so the
    stream runs with a reduced count (restored after): same results — the
    oracle hash is partition-count-invariant — a fraction of the dead
    trigger time.  A real 100 TB deployment would size this UP instead;
    it is the same knob, set per workload.

    Returns the final state-store telemetry (max rows / bytes across the
    run's progress events, summed over state operators) so scale probes
    can MEASURE state growth instead of arguing it; callers that only
    want the results ignore the return value."""
    spark = out.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        w = out.writeStream.option("checkpointLocation", checkpoint)
        if foreach_batch is not None:
            w = w.foreachBatch(foreach_batch)
        else:
            w = w.format("memory").queryName(query_name).outputMode(output_mode)
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
        state_rows = state_bytes = 0
        for p in q.recentProgress:
            ops = p.get("stateOperators") or []
            state_rows = max(state_rows, sum(o.get("numRowsTotal", 0) for o in ops))
            state_bytes = max(
                state_bytes, sum(o.get("memoryUsedBytes", 0) for o in ops)
            )
        return {"state_rows": state_rows, "state_bytes": state_bytes}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def cleanup(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)
