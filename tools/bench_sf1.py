"""Scale-validation run: the batch suite at the synthetic sf1 (10x
sf0.1, built by tools/make_sf1.py), timed the same way bench.py times
sf0.1 (min of N full passes).  Emits one JSON line; the committed record
is BENCH_SF1.md.

A near-linear wall-clock ratio (~10x on a fixed local[32] box) validates
the bucketed candidate-generation designs; a super-linear ratio flags a
quadratic term no plan inspection caught (round 5: this run — not plan
audit — found the fixed-bucket LSH quadratic).

Round 6 (verdict r05 items 1/5/8): coverage extended from 9 queries to
the full heavy-batch suite including the storage commit gates, and a
MEASURED recall section for the embedding near-dup pairs replaces the
round-5 footnote: the sign-flip fixture preserves within-copy geometry
exactly, so 10x the sf0.1 exact pair set IS ground truth at sf1, and
candidate recall is |found ∩ truth| / |truth| (precision is exact by
construction — every extra pair was re-scored >= threshold).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_graph_db_c_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from distributed_graph_db_c_spark.session import get_spark  # noqa: E402

SF01_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
)
KEY_OFF = 1_000_000_000  # must match tools/make_sf1.py
N_COPIES = 10

QUERIES = [
    # round-5 suite (the original 9)
    "dedup_embedding_cosine_pairs",
    "dedup_minhash_groups",
    "dedup_minhash_pairs",
    "skew_salted_join_revenue",
    "rel_q1_pricing_summary",
    "dedup_containment_pairs",
    "dedup_substring_windows",
    "graph_toposort_levels",
    "graph_chain_roots",
    # round-6 extension: every remaining heavy batch family (verdict #1)
    "rel_pivot_monthly_revenue",
    "rel_ntile_deciles",
    "rel_events_funnel",
    "rel_corr_quantity_price",
    "rel_string_agg_ordered",
    "rel_median_per_group",
    "rel_weighted_median_udaf",
    "rel_price_histogram",
    "storage_scd_latest_version",
    "storage_scd2_history",
    "storage_snapshot_diff",
    "storage_time_travel",
    "storage_compact_roundtrip",  # commit layer at 10x file counts (verdict #8)
    "storage_upsert_partitioned",  # commit layer at 10x file counts (verdict #8)
    "storage_merge_cdc_batch",
    "pipeline_sequence_packing",
    "pipeline_domain_mixture",
    "text_char_ngram_entropy",
    "text_sentence_stats",
    "text_clean_normalize",
    "sim_quantize_int8",
    "graph_copurchase_pairs",
    "ts_ewma8_value",
    "ts_zscore_outliers",
    "ts_interpolate_linear",
    "ts_rolling_7d_revenue",
    "mm_ahash_pairs_from_hashes",
    # round-6 second wave
    "sketch_freq_items_brand",
    "rel_array_hof",
    "rel_mode_order_priority",
    "rel_skyline_parts",
    "rel_profile_orders",
    "pipeline_topk_per_domain",
    "storage_zonemap_stats",
    "storage_constraint_audit",
    "storage_table_checksum",
    "graph_kcore_copurchase",
    "dedup_embedding_groups",
    # round-7: the dedup-grade embedding operating point (threshold 0.8
    # + planted near-dups) beside the 0.45 stress gates above
    "dedup_embedding_pairs_grade",
    "dedup_embedding_groups_grade",
    # round-7 second wave
    "text_bm25_topk",
    "dedup_minhash_survivors_quality",
    "sample_reservoir_per_group",
    "mm_wav_spectral",
    "sketch_hll_corpus_overlap",
    # round-8 gates: every new operator gets its 10x point in the same
    # round it ships
    "source_xml_roundtrip",
    "dedup_incremental_pairs",
    "rel_events_cohort_retention",
    "rel_corr_matrix",
    "text_ngram_topk",
    "sim_covariance_matrix",
    "sim_pca_project",
    "ts_time_weighted_avg",
    "rel_events_attribution",
    "text_oov_rate",
    "skew_key_profile",
    "sim_knn_gather_mean",
    "rel_events_transition_matrix",
    "sim_knn_gather_mean_ann",
    # round-9 gates: same-round 10x points
    "sim_knn_gather_mean_ivf",
    "rel_events_transition_bigram",
    "text_oov_rate_tokenizer",
    "sketch_quantiles_doclen_by_lang",
    "sim_kmeans_clusters",
    "dedup_semantic_survivors",
    "sample_cluster_balanced",
    # round-10 gates: same-round 10x points
    "sim_ivf_index_append",
    "sketch_quantiles_rollup_lang_source",
    "sim_ivf_retrain_swap",
    "dedup_semantic_decontaminate",
    "dedup_decontaminate_incremental",
    # round-11 gates: same-round 10x points
    "dedup_decontaminate_by_source",
    "sketch_token_quantiles_rollup",
    "sim_ivf_time_travel",
    "pipeline_token_budget_select",
    # round-12 gates: same-round 10x points
    "text_tokenizer_whitespace_edge",
    "dedup_index_time_travel",
    "dedup_index_append",
    "dedup_decontaminate_append",
    "dedup_index_vacuum",
]

# Round-7 extension (r6 verdict item 5): the 12 streaming gates at 10x
# key cardinality.  Their wall time is trigger cadence + checkpoint IO +
# STATE-STORE maintenance — the third term is what 10x data stresses
# (stateful gates' state rows scale with distinct keys: users, sessions,
# dedup fingerprints), and it had never been measured at sf1.  Timed the
# same min-of-passes way; reported in a separate "streaming" section so
# the batch comparable stays clean.
STREAM_QUERIES = [
    "stream_tumbling_hour",
    "stream_static_join_enrich",
    "stream_sliding_30m",
    "stream_session_window",
    "stream_stateful_user_totals",
    "stream_dedup_exact",
    "stream_watermark_late_drop",
    "stream_stream_interval_join",
    "stream_foreachbatch_upsert",
    "stream_checkpoint_recovery",
    "stream_dedup_minhash_incremental",
    "stream_freq_items_incremental",
    "stream_attribution_last_touch",  # round 8
    "stream_continuous_index_dedup",  # round 12, late: durable-index form
    "stream_continuous_embedding_dedup",  # round 13, late: LSH-index form
    "stream_continuous_ivf_ingest",  # round 14: ANN ingest loop
    # round 15: the maintenance matrix at oracle strength
    "stream_continuous_embedding_dedup_maintained",
    "stream_continuous_ivf_ingest_maintained",
    "stream_continuous_index_dedup_compacted",
]

N_PASSES = 2


def measure_embedding_pair_recall(spark) -> dict:
    """Measured candidate recall of dedup_embedding_cosine_pairs at sf1.

    Ground truth: the exact (brute-force) pair set of the sf0.1 corpus at
    the gate threshold, replicated across the 10 sign-flip copies — exact
    because cos(s*v, s*w) == cos(v, w) makes every within-copy pair's
    cosine identical to its sf0.1 original.  Cross-copy extras the LSH
    path finds are NOT errors (precision is exact — each was re-scored),
    they are true pairs outside the within-copy truth set; reported
    separately."""
    import pyspark.sql.functions as F

    from distributed_graph_db_c_spark.operators.similarity import (
        cosine_pairs,
        lsh_params_for,
    )
    from distributed_graph_db_c_spark.sources.tables import load_table

    emb01 = load_table(spark, SF01_DIR, "embeddings")
    n01 = emb01.count()
    exact01 = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs(emb01, threshold=0.45).collect()
    }
    truth = {
        (a + i * KEY_OFF, b + i * KEY_OFF)
        for (a, b) in exact01
        for i in range(N_COPIES)
    }
    found = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["dedup_embedding_cosine_pairs"].run(spark, SF1_DIR).collect()
    }
    hit = len(found & truth)
    # min_multiprobe=4 mirrors the gate query's explicit multiprobe floor
    n_planes, n_tables, multiprobe, predicted = lsh_params_for(
        n01 * N_COPIES, 0.45, min_multiprobe=4
    )
    return {
        "truth_pairs": len(truth),
        "found_in_truth": hit,
        "recall_measured": round(hit / len(truth), 4) if truth else None,
        "recall_predicted": round(predicted, 4),
        "extra_true_pairs_cross_copy": len(found - truth),
        "params": {
            "n_planes": n_planes,
            "n_tables": n_tables,
            "multiprobe": multiprobe,
        },
    }


def main() -> None:
    only = [a for a in sys.argv[1:] if a != "--streaming"]
    with_streaming = "--streaming" in sys.argv[1:] or not sys.argv[1:]
    queries = [q for q in QUERIES if not only or q in only]
    stream_queries = [q for q in STREAM_QUERIES if not only or q in only]
    if not with_streaming and not only:
        stream_queries = []
    _ensure_loaded()
    spark = get_spark("bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, list[float]] = {q: [] for q in queries}
    rows: dict[str, int] = {}
    errors: dict[str, str] = {}
    from pyspark.sql import Observation
    import pyspark.sql.functions as F

    for _ in range(N_PASSES):
        for q in queries:
            try:
                t0 = time.monotonic()
                # noop sink, same forcing as bench.py: a .collect() of a
                # megarow output (interpolate emits 2.6M rows at sf1)
                # measures single-threaded py4j transfer, not the engine.
                # Row counts ride the SAME write via an Observation — a
                # separate df.count() would re-execute the whole plan,
                # silently doubling the tool's wall-clock per pass.
                df = REGISTRY[q].run(spark, SF1_DIR)
                if q not in rows:
                    obs = Observation()
                    df.observe(obs, F.count(F.lit(1)).alias("n")).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    times[q].append(time.monotonic() - t0)
                    rows[q] = int(obs.get["n"])
                else:
                    df.write.format("noop").mode("overwrite").save()
                    times[q].append(time.monotonic() - t0)
            except Exception as exc:  # record, keep measuring the rest
                errors[q] = f"{type(exc).__name__}: {exc}"[:300]
            # NOTE on long sessions (measured round 6): the heavy
            # iterative queries run 1.5-1.7x their fresh-session minimums
            # late in a full-suite pass.  A per-query gc.collect() (the
            # bloom checkpoint-reclamation recipe) was tried and MEASURED
            # INEFFECTIVE — the aging is JVM-session-level (heap/GC and
            # codegen-cache growth), not Python-held checkpoint blocks —
            # so the tool does not pretend to mitigate it; the committed
            # record keeps per-query minimums across observed runs, which
            # estimates plan cost independent of session age.
    best = {q: round(min(ts), 3) for q, ts in times.items() if ts}
    # Streaming section: each gate runs a real micro-batch stream inside
    # .run() and returns an eager localCheckpoint — the timing wraps the
    # run, the noop write is a no-cost flush of the checkpointed frame.
    stream_times: dict[str, list[float]] = {q: [] for q in stream_queries}
    for _ in range(N_PASSES):
        for q in stream_queries:
            if q in errors:
                continue
            try:
                t0 = time.monotonic()
                df = REGISTRY[q].run(spark, SF1_DIR)
                df.write.format("noop").mode("overwrite").save()
                stream_times[q].append(time.monotonic() - t0)
                if q not in rows:
                    rows[q] = df.count()  # checkpointed frame: cheap
            except Exception as exc:
                errors[q] = f"{type(exc).__name__}: {exc}"[:300]
    stream_best = {
        q: round(min(ts), 3) for q, ts in stream_times.items() if ts
    }
    out = {
        "metric": "sf1_batch_suite_sec",
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "queries": best,
        "streaming_value_sec": round(sum(stream_best.values()), 3),
        "queries_streaming": stream_best,
        "rows": rows,
        "errors": errors,
        "sf": 1.0,
        "passes": N_PASSES,
    }
    if not only:
        out["embedding_pair_recall"] = measure_embedding_pair_recall(spark)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
