"""Bounded session-aging experiment (r6 verdict item 6).

BENCH_SF1.md (round 6) measured checkpoint-heavy iterative queries at
1.5-1.7x their fresh-session minimums late in a long session, refuted
the Python-side gc.collect() hypothesis, and left the cause at
"JVM-session-level (heap/codegen-cache) speculation".  This probe names
the cause by instrumenting the JVM directly and testing the candidate
mechanisms one at a time, cheapest first:

1. FRESH: min-of-3 for the probe queries in a young session.
2. CHURN: one pass of a diverse ~40-query workload (the aging stimulus
   the full bench applies), with JVM telemetry before/after — heap used
   (post System.gc so it measures LIVE bytes, not garbage), cumulative
   GC time, and the driver block manager's persisted-RDD inventory
   (localCheckpoint blocks are cached RDDs: every iterative round
   leaves one until the ContextCleaner collects its JVM reference).
3. AGED: min-of-3 again — reproduces (or not) the 1.5-1.7x.
4. MITIGATIONS, re-measuring min-of-3 after each:
   a. jvm System.gc() — if aging is dead-but-uncollected JVM state
      (checkpoint RDD refs pending ContextCleaner), this alone heals;
   b. explicit unpersist of every lingering persistent RDD — if (a)
      does not heal but this does, the blocks were still REFERENCED
      (a leak on our side, actionable);
   c. spark.catalog.clearCache() — relation-cache growth.

Telemetry is printed as one JSON line; the conclusion goes to
BENCH_SF1.md.  Runtime is bounded: one churn pass + 4x min-of-3 probe
measurements (~10 min at sf0.1 on local[32]).

Usage: python tools/aging_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_graph_db_c_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from distributed_graph_db_c_spark.session import get_spark  # noqa: E402

# The two queries BENCH_SF1.md round 6 measured aging on (pointer
# doubling: ~17 localCheckpoints each), plus one non-iterative control
# that should NOT age if the cause is checkpoint-block accumulation.
PROBES = ["graph_toposort_levels", "graph_chain_roots"]
CONTROL = ["rel_q1_pricing_summary"]

# Diverse churn: the heavy batch families the full bench cycles through.
CHURN = [
    "rel_q3_shipping_priority", "rel_q5_local_supplier_volume",
    "rel_q8_market_share", "rel_q13_order_count_distribution",
    "rel_q17_small_quantity_revenue", "rel_q18_large_volume_customer",
    "rel_window_running_total", "rel_events_sessionization",
    "rel_pivot_monthly_revenue", "rel_ntile_deciles", "rel_events_funnel",
    "rel_median_per_group", "rel_profile_orders", "rel_price_histogram",
    "text_quality_score", "text_repetition_stats", "text_tfidf_topk",
    "text_char_ngram_entropy", "text_sentence_stats", "text_clean_normalize",
    "dedup_minhash_pairs", "dedup_minhash_groups",
    "dedup_embedding_cosine_pairs", "sim_topk_bruteforce",
    "sim_ann_batch_topk", "graph_bfs_order_chain",
    "graph_connected_components_nations", "graph_pagerank_nations",
    "graph_sssp_order_chain", "graph_kcore_copurchase",
    "ts_rolling_7d_revenue", "ts_interpolate_linear", "ts_zscore_outliers",
    "sample_stratified_mix", "pipeline_training_prep",
    "storage_incremental_rollup", "storage_upsert_partitioned",
    "sketch_freq_items_brand", "skew_salted_join_revenue",
]


def _force(spark, name: str, sf_dir: str) -> float:
    t0 = time.monotonic()
    REGISTRY[name].run(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.monotonic() - t0


def _min3(spark, names: list[str], sf_dir: str) -> dict[str, float]:
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(3):
        for n in names:
            times[n].append(_force(spark, n, sf_dir))
    return {n: round(min(ts), 3) for n, ts in times.items()}


def _telemetry(spark) -> dict:
    jvm = spark._jvm
    rt = jvm.java.lang.Runtime.getRuntime()
    jvm.java.lang.System.gc()
    time.sleep(1.0)
    heap_live = rt.totalMemory() - rt.freeMemory()
    gc_ms = 0
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    for i in range(beans.size()):
        gc_ms += beans.get(i).getCollectionTime()
    jsc = spark.sparkContext._jsc.sc()
    rdds = jsc.getRDDStorageInfo()
    n_cached = len(rdds)
    cached_bytes = sum(r.memSize() + r.diskSize() for r in rdds)
    persistent = spark.sparkContext._jsc.getPersistentRDDs()
    return {
        "heap_live_mb": round(heap_live / 1e6, 1),
        "gc_cum_ms": int(gc_ms),
        "cached_rdds": n_cached,
        "cached_bytes_mb": round(cached_bytes / 1e6, 1),
        "persistent_rdd_refs": persistent.size(),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    _ensure_loaded()
    spark = get_spark("aging-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "session_aging_probe", "sf_dir": sf_dir}

    # warm the probe plans once (Janino compile absorbed, as bench.py does)
    for n in PROBES + CONTROL:
        _force(spark, n, "/root/testdata/sf0.001")

    out["telemetry_young"] = _telemetry(spark)
    out["fresh"] = _min3(spark, PROBES + CONTROL, sf_dir)

    t0 = time.monotonic()
    churn_errors = {}
    for n in CHURN:
        try:
            _force(spark, n, sf_dir)
        except Exception as exc:  # noqa: BLE001
            churn_errors[n] = f"{type(exc).__name__}: {exc}"[:120]
    out["churn_sec"] = round(time.monotonic() - t0, 1)
    if churn_errors:
        out["churn_errors"] = churn_errors
    out["telemetry_aged"] = _telemetry(spark)
    out["aged"] = _min3(spark, PROBES + CONTROL, sf_dir)

    # mitigation ladder, cheapest first
    spark._jvm.java.lang.System.gc()
    time.sleep(2.0)
    out["after_jvm_gc"] = _min3(spark, PROBES + CONTROL, sf_dir)
    out["telemetry_after_gc"] = _telemetry(spark)

    persistent = spark.sparkContext._jsc.getPersistentRDDs()
    n_unpersisted = 0
    for rdd in list(persistent.values()):  # py4j JavaMap -> dict view
        rdd.unpersist(False)
        n_unpersisted += 1
    out["unpersisted_refs"] = n_unpersisted
    out["after_unpersist"] = _min3(spark, PROBES + CONTROL, sf_dir)

    spark.catalog.clearCache()
    out["after_clear_cache"] = _min3(spark, PROBES + CONTROL, sf_dir)
    out["telemetry_final"] = _telemetry(spark)

    out["aging_ratio"] = {
        n: round(out["aged"][n] / out["fresh"][n], 2) for n in out["fresh"]
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
