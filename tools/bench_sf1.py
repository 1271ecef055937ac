"""Scale-validation spot-run: the heaviest batch queries at the synthetic
sf1 (10x sf0.1, built by tools/make_sf1.py), timed the same way bench.py
times sf0.1 (min of N full passes).  Emits one JSON line; the committed
record is BENCH_SF1.md.

A near-linear wall-clock ratio (~10x on a fixed local[32] box) validates
the bucketed candidate-generation designs; a super-linear ratio flags a
quadratic term no plan inspection caught.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_graph_db_c_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from distributed_graph_db_c_spark.session import get_spark  # noqa: E402

SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
)

QUERIES = [
    "dedup_embedding_cosine_pairs",
    "dedup_minhash_groups",
    "dedup_minhash_pairs",
    "skew_salted_join_revenue",
    "rel_q1_pricing_summary",
    # round-5 scale-sensitive additions: prefix-filtered containment,
    # hashed substring windows, and the two pointer-doubling kernels
    "dedup_containment_pairs",
    "dedup_substring_windows",
    "graph_toposort_levels",
    "graph_chain_roots",
]

N_PASSES = 2


def main() -> None:
    _ensure_loaded()
    spark = get_spark("bench-sf1")
    times: dict[str, list[float]] = {q: [] for q in QUERIES}
    rows: dict[str, int] = {}
    for _ in range(N_PASSES):
        for q in QUERIES:
            t0 = time.monotonic()
            rows[q] = len(REGISTRY[q].run(spark, SF1_DIR).collect())
            times[q].append(time.monotonic() - t0)
    best = {q: round(min(ts), 3) for q, ts in times.items()}
    print(
        json.dumps(
            {
                "metric": "sf1_spot_suite_sec",
                "value": round(sum(best.values()), 3),
                "unit": "sec",
                "queries": best,
                "rows": rows,
                "sf": 1.0,
                "passes": N_PASSES,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
