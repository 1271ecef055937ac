"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (count() alone can let
Catalyst prune the compute we mean to measure).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_graph_db_c_spark.registry import REGISTRY, _ensure_loaded
from distributed_graph_db_c_spark.session import get_spark

HEADLINE = [
    "rel_q1_pricing_summary",
    "rel_q3_shipping_priority",
    "rel_q5_local_supplier_volume",
    "rel_q18_large_volume_customer",
    "rel_window_running_total",
    "rel_events_sessionization",
    "rel_q17_small_quantity_revenue",
    "rel_q8_market_share",
    "rel_q13_order_count_distribution",
    "graph_bfs_order_chain",
    "graph_connected_components_nations",
    "graph_pagerank_nations",
    "text_quality_score",
    "dedup_minhash_pairs",
    "sim_topk_bruteforce",
    "mm_binary_features",
    "asof_join_events",
    "range_join_events",
    "stream_tumbling_hour",
    "sketch_hll_distinct_parts",
    "pipeline_training_prep",
    # round 3: the two new scale-path similarity/dedup operators
    "dedup_embedding_cosine_pairs",
    "sim_ann_batch_topk",
    # round 4: time the remaining round-3 operators that never had a
    # bench row (VERDICT r03 item 7)
    "ts_resample_ffill_4h",
    "graph_sssp_order_chain",
    "rel_bloom_pruned_join",
    "dedup_minhash_groups",
    "skew_salted_join_revenue",
    # round 4 operators: corpus hygiene, real decode, maintenance,
    # streaming late-data
    "text_repetition_stats",
    "text_pii_scrub",
    "text_decontaminate_overlap",
    "text_fuzzy_join_edit1",
    "text_tfidf_topk",
    "sample_stratified_mix",
    "mm_wav_decode_features",
    "mm_bmp_decode_stats",
    "source_orc_roundtrip",
    "storage_compact_roundtrip",
    "storage_incremental_rollup",
    "storage_upsert_partitioned",
    "stream_watermark_late_drop",
    "stream_stream_interval_join",
    # round 5 operators
    "mm_png_decode_stats",
    "ts_rolling_7d_revenue",
    "ts_zscore_outliers",
    "sim_centroid_by_label",
    "rel_median_per_group",
    "rel_events_funnel",
    "storage_scd_latest_version",
    "storage_scd2_history",
    "pipeline_sequence_packing",
    # round 5 second wave
    "rel_pivot_monthly_revenue",
    "rel_ntile_deciles",
    "ts_interpolate_linear",
    "storage_snapshot_diff",
    "graph_toposort_levels",
    "text_char_ngram_entropy",
    "dedup_containment_pairs",
    "stream_foreachbatch_upsert",
    # round 5 third wave
    "storage_time_travel",
    "sim_quantize_int8",
    "text_sentence_stats",
    "dedup_substring_windows",
    "graph_chain_roots",
    "storage_dpp_pruned_join",
    "source_binaryfile_ingest",
    "stream_checkpoint_recovery",
    "graph_copurchase_pairs",
    "storage_schema_evolution",
    "ts_ewma8_value",
    "rel_corr_quantity_price",
    "rel_string_agg_ordered",
    "rel_weighted_median_udaf",
    "mm_ahash_dedup_pairs",
    # round 6 operators
    "mm_ahash_pairs_from_hashes",
    "storage_merge_cdc_batch",
    "text_clean_normalize",
    "pipeline_domain_mixture",
    "rel_price_histogram",
    # round 6 second wave
    "sketch_freq_items_brand",
    "rel_array_hof",
    "rel_mode_order_priority",
    "rel_skyline_parts",
    "rel_profile_orders",
    "pipeline_topk_per_domain",
    "storage_zonemap_stats",
    "storage_constraint_audit",
    "storage_table_checksum",
    "storage_zonemap_incremental",
    "sim_ann_ivf_persisted",
    "sample_weighted_pps",
    "rel_cumulative_distinct_users",
    "graph_kcore_copurchase",
    "dedup_embedding_groups",
    "mm_ahash_groups_from_hashes",
    "stream_freq_items_incremental",
    # round 7: the dedup-grade embedding operating point (threshold 0.8)
    # beside the 0.45 recall stress gates
    "dedup_embedding_pairs_grade",
    "dedup_embedding_groups_grade",
    # round 7 second wave: BM25 retrieval + quality-weighted keep rule
    "text_bm25_topk",
    "dedup_minhash_survivors_quality",
    "sample_reservoir_per_group",
    "mm_wav_spectral",
    "sketch_hll_corpus_overlap",
    # round 8: the banked round-7 candidates, wired as oracle gates
    "source_xml_roundtrip",
    "dedup_incremental_pairs",
    # round 8 second wave: cohort analytics, one-pass moment matrix,
    # corpus n-gram stats
    "rel_events_cohort_retention",
    "rel_corr_matrix",
    "text_ngram_topk",
    # round 8 third wave: PCA lifecycle + telemetry TWA
    "sim_covariance_matrix",
    "sim_pca_project",
    "ts_time_weighted_avg",
    # round 8 fourth wave: attribution + vocabulary coverage + skew
    "rel_events_attribution",
    "text_oov_rate",
    "skew_key_profile",
    "stream_attribution_last_touch",
    "sim_knn_gather_mean",
    "rel_events_transition_matrix",
    "sim_knn_gather_mean_ann",
    # round 9: the banked round-8 candidates, wired as oracle gates
    "sim_knn_gather_mean_ivf",
    "rel_events_transition_bigram",
    "text_oov_rate_tokenizer",
    "sketch_quantiles_doclen_by_lang",
    "sim_kmeans_clusters",
    "dedup_semantic_survivors",
    "sample_cluster_balanced",
    # round 10: the banked round-9 candidates, wired as oracle gates
    "sim_ivf_index_append",
    "sketch_quantiles_rollup_lang_source",
    "sim_ivf_retrain_swap",
    "dedup_semantic_decontaminate",
    "dedup_decontaminate_incremental",
    "dedup_decontaminate_by_source",
    "sketch_token_quantiles_rollup",
    "sim_ivf_time_travel",
    "pipeline_token_budget_select",
    "text_tokenizer_whitespace_edge",
    "dedup_index_time_travel",
    "dedup_index_append",
    "dedup_decontaminate_append",
    "dedup_index_vacuum",
    # round 13: segment compaction without retrain
    "dedup_index_compact",
    # streaming gates run real micro-batch streams — keep them last
    "stream_continuous_index_dedup",
    # round 13, late: the LSH index's streaming lifecycle composition
    "stream_continuous_embedding_dedup",
    # round 14: the ANN index's streaming ingestion loop, oracle-gated
    "stream_continuous_ivf_ingest",
    # round 15: the maintained (stop -> retrain -> resume) twin of the
    # embedding stream — the drift arm's acting half, oracle-gated
    "stream_continuous_embedding_dedup_maintained",
    # round 15: the IVF twin — retrain-mid-stream for the second
    # drift-prone index at oracle-gate strength
    "stream_continuous_ivf_ingest_maintained",
    # round 15: the compact half of the maintenance matrix at
    # oracle-gate strength (fold mid-stream, resume on gen 2)
    "stream_continuous_index_dedup_compacted",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    _ensure_loaded()
    spark = get_spark("dgdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup (untimed): run every headline query once at the smallest SF.
    # Whole-stage-codegen classes are cached by generated source, so this
    # absorbs Janino compilation (~10 s for the 64-aggregate minhash plan),
    # JVM JIT, and file-listing init; the timed runs below then measure
    # steady-state execution, which is what a throughput comparison means.
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            REGISTRY[name].run(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    # Single-run timings on this box swing ±40% with background machine
    # load (observed 20-39 s suite totals for identical code), which
    # masquerades as regressions.  Run the whole suite N times (full-suite
    # passes, so a load spike hits one pass, not one query) and report the
    # per-query MIN — the best observed run is the least-noise estimator
    # of the plan's actual cost; medians ride along for dispersion.
    # Failure isolation (round-3 post-mortem): one broken query must not
    # zero the whole suite's evidence — r03 died at query 6 of 23 with
    # rc=1 and produced NO timings.  Catch per query, record the error,
    # skip it on later passes, and ALWAYS emit the suite JSON.
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    errors: dict[str, str] = {}
    for _ in range(n_passes):
        for name in HEADLINE:
            if name in errors:
                continue
            spec = REGISTRY[name]
            t0 = time.perf_counter()
            try:
                spec.run(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 — report, don't die
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                continue
            runs[name].append(time.perf_counter() - t0)

    timings = {name: round(min(ts), 3) for name, ts in runs.items() if ts}
    medians = {
        name: round(sorted(ts)[len(ts) // 2], 3) for name, ts in runs.items() if ts
    }
    total = round(sum(timings.values()), 3)
    # Batch vs streaming split (VERDICT r04 item 3): streaming gates spend
    # their wall time on micro-batch trigger cadence + checkpoint I/O, not
    # plan cost, and more land every round — kept out of the batch total
    # so that number stays comparable round-over-round.
    is_stream = lambda n: n.startswith("stream_")  # noqa: E731
    batch = {n: t for n, t in timings.items() if not is_stream(n)}
    streaming = {n: t for n, t in timings.items() if is_stream(n)}
    print(
        json.dumps(
            {
                "metric": "headline_suite_total_sec",
                "value": total,
                "unit": "sec",
                "value_batch_sec": round(sum(batch.values()), 3),
                "value_streaming_sec": round(sum(streaming.values()), 3),
                "queries": timings,
                "queries_batch": batch,
                "queries_streaming": streaming,
                "queries_median": medians,
                "errors": errors,
                # round 16 (VERDICT r15 item 2 — additions only): echo the
                # EFFECTIVE master and parallelism so the scaling harness
                # can verify $SPARK_GRAFT_CPUS took effect instead of
                # inferring it from timing ratios that are noise-bound at
                # this SF (suspect_cpus_ignored in PERF_r15).
                "master": spark.sparkContext.master,
                "cpus_effective": spark.sparkContext.defaultParallelism,
                "shuffle_partitions": int(
                    spark.conf.get("spark.sql.shuffle.partitions")
                ),
                "bench_runs": n_passes,
                "note": "per-query min over full-suite passes; single runs vary +/-40% with machine load; batch total is the round-over-round comparable",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
