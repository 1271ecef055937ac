"""Measure the MAINTAINED IVF ingest stream's economics (round 15 —
the IVF twin of tools/bench_maintained_stream.py, paired with the new
oracle gate stream_continuous_ivf_ingest_maintained).

What the LSH twin measured (BENCH_SF1.md r14) was a drift term in the
SIZING: frozen planes operate past their basis, bucket occupancy grows
quadratically into the screen cost, and the retrain is cheaper than
not acting within the very stream that flags it.  The IVF index has no
sizing drift of that kind on a STATIONARY stream — the quantizer's
n_cells is fixed and md5-seeded centroids from a third of an iid
corpus partition it about as well as centroids from all of it — which
is exactly why stream_continuous_ivf_ingest's 10x point is already
1.38x with no maintenance at all.  This harness measures that claim
instead of assuming it:

- per-phase ingest times (bootstrap, append, optional retrain, append)
  for the maintained (ivf_retrain_swap between batches 2 and 3, the
  act the audit's retrain_due cues — the composition of the new gate)
  and no-maintenance shapes;
- the final index's CELL-OCCUPANCY SKEW (max/mean rows per cell) both
  ways — the quantity that would grow under real distribution shift
  and turn pruned probes super-linear on the hot cells;
- pruned-query latency and recall@k against the probe-all result of
  the SAME index (probe-all is exact by construction — every vector
  is somewhere in exactly one cell).

Expected honest reading on this synthetic corpus: the retrain is one
bounded corpus pass that buys little here (stationary data), and the
numbers quantify WHY not-acting is already near-flat for IVF —
contrast LSH, where not-acting is the super-linear term.  The drift
arm's value for IVF is distribution shift, which a fixed test corpus
cannot exhibit; the gate pins that the maintenance composition is
CORRECT, this harness pins what it COSTS.

Usage:
    python tools/bench_maintained_ivf.py [sf_dir ...]
defaults to /root/testdata/sf0.1 and .scratch/sf1 (run make_sf1 first).
Prints one JSON line per sf_dir.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from distributed_graph_db_c_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
)

N_CELLS = 24  # mirrors the driver gates' _IVF_INGEST_CELLS
NPROBE = 8
TOP_K = 10
N_QUERIES = 16


def run_stream(spark, sf_dir: str, maintained: bool) -> dict:
    from distributed_graph_db_c_spark.operators.similarity import (
        _ivf_snapshot,
        ivf_batch_query_persisted,
        ivf_resolve,
        ivf_retrain_swap,
    )
    from distributed_graph_db_c_spark.sources.tables import load_table
    from distributed_graph_db_c_spark.streaming.dedup import continuous_ivf_ingest
    from distributed_graph_db_c_spark.streaming.sources import cleanup, scratch_dir

    emb = load_table(spark, sf_dir, "embeddings")
    scratch = scratch_dir("bivfmaint")
    path = f"{scratch}/idx"
    phases: dict[str, float] = {}
    try:
        batches = [
            emb.filter(F.pmod("vec_id", F.lit(3)) == i).localCheckpoint(eager=True)
            for i in range(3)
        ]
        handler = continuous_ivf_ingest(path, n_cells=N_CELLS)
        t_all = time.perf_counter()
        for i in (0, 1):
            t0 = time.perf_counter()
            handler(batches[i], i)
            phases[f"batch{i}"] = round(time.perf_counter() - t0, 3)
        if not handler.audits[-1]["retrain_due"]:
            raise RuntimeError("equal thirds must flip the drift arm")
        if maintained:
            t0 = time.perf_counter()
            gen = ivf_retrain_swap(
                spark, path, batches[0].unionByName(batches[1]), n_cells=N_CELLS
            )
            assert gen == 2, gen
            phases["retrain"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        handler(batches[2], 2)
        phases["batch2"] = round(time.perf_counter() - t0, 3)
        ingest_total = round(time.perf_counter() - t_all, 3)

        # cell-occupancy skew of the final contents (the quantity real
        # distribution shift would inflate): max/mean rows per cell
        content = ivf_resolve(spark, path)
        lists, _ids, _ = _ivf_snapshot(spark, content)
        occ = lists.groupBy("cell").count()
        row = occ.agg(
            F.max("count").alias("mx"), F.avg("count").alias("mean")
        ).head()
        skew = round(float(row["mx"]) / float(row["mean"]), 3)

        qrows = (
            emb.filter(F.col("vec_id") < N_QUERIES)
            .select(F.col("vec_id").alias("qid"), "embedding")
            .collect()
        )
        queries = [(r["qid"], list(r["embedding"])) for r in qrows]
        t0 = time.perf_counter()
        pruned = ivf_batch_query_persisted(
            spark, path, queries, top_k=TOP_K, nprobe=NPROBE
        ).collect()
        t_query = round(time.perf_counter() - t0, 3)
        # probe-all over the SAME index is exact: recall@k of the
        # pruned probes against it needs no separate brute-force pass
        exact = ivf_batch_query_persisted(
            spark, path, queries, top_k=TOP_K, nprobe=N_CELLS
        ).collect()
        got = {(r["qid"], r["vec_id"]) for r in pruned}
        want = {(r["qid"], r["vec_id"]) for r in exact}
        recall = round(len(got & want) / len(want), 4) if want else 1.0
        return {
            "ingest_total_sec": ingest_total,
            "phases": phases,
            "cell_skew_max_over_mean": skew,
            "query_batch_sec": t_query,
            f"recall_at_{TOP_K}_nprobe{NPROBE}": recall,
        }
    finally:
        cleanup(scratch)


def main() -> None:
    sf_dirs = sys.argv[1:] or [SF01, SF1]
    spark = get_spark("bench-maintained-ivf")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        out = {"sf_dir": sf_dir}
        # maintained first so JIT/codegen warmup penalizes it, not the
        # control (conservative for the claim being measured)
        out["maintained"] = run_stream(spark, sf_dir, maintained=True)
        out["no_maintenance"] = run_stream(spark, sf_dir, maintained=False)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
