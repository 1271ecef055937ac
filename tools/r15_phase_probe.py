"""Round-15 optimization probe: phase-level wall timings for the
heaviest bench queries (guide §1 — measure first, isolate phases).

Times each expensive gate's constituent operator calls DIRECTLY (the
foreachBatch handlers are plain callables, so per-batch handler cost can
be measured without the streaming machinery; gate-total minus handler
sum = stream trigger/checkpoint overhead).  Prints one JSON line per
probe so before/after diffs are greppable.

Usage:
    python tools/r15_phase_probe.py [probe ...]
Probes: emb_stream, minhash_stream, ivf_stream, semantic, decon_append,
        counts
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from distributed_graph_db_c_spark.session import get_spark
from distributed_graph_db_c_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn, out):
    t0 = time.perf_counter()
    r = fn()
    dt = time.perf_counter() - t0
    out[label] = round(dt, 3)
    return r


def probe_emb_stream(spark):
    """continuous_embedding_dedup handler, batch by batch, no stream."""
    from distributed_graph_db_c_spark.operators.bucketing import index_drop_all
    from distributed_graph_db_c_spark.operators.similarity import _lsh_index_claim
    from distributed_graph_db_c_spark.sinks import _hadoop_fs
    from distributed_graph_db_c_spark.streaming.dedup import (
        continuous_embedding_dedup,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    prefix = f"probeemb_{uuid.uuid4().hex[:8]}"
    pairs_dir = f"/tmp/probe_pairs_{uuid.uuid4().hex[:8]}"
    out = {}
    handler = continuous_embedding_dedup(prefix, pairs_dir)
    try:
        batches = [
            emb.filter(F.pmod("vec_id", F.lit(3)) == i).localCheckpoint(eager=True)
            for i in range(3)
        ]
        for i, b in enumerate(batches):
            t(f"batch{i}", lambda b=b, i=i: handler(b, i), out)
    finally:
        index_drop_all(spark, prefix, ("_buckets", "_vectors", "_meta"))
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = _hadoop_fs(spark, warehouse)
        fs.delete(jpath(_lsh_index_claim(warehouse, prefix)), False)
        import shutil

        shutil.rmtree(pairs_dir, ignore_errors=True)
    print(json.dumps({"probe": "emb_stream", **out}))


def probe_emb_phases(spark):
    """The embedding handler's phases, timed individually."""
    from distributed_graph_db_c_spark.operators.bucketing import index_drop_all
    from distributed_graph_db_c_spark.operators.similarity import (
        N_PLANES,
        _lsh_index_claim,
        cosine_lsh_pairs,
        decontaminate_incremental,
        lsh_index_append,
        lsh_index_build,
    )
    from distributed_graph_db_c_spark.sinks import _hadoop_fs

    emb = load_table(spark, SF_DIR, "embeddings")
    prefix = f"probeph_{uuid.uuid4().hex[:8]}"
    out = {}
    try:
        b0, b1 = [
            emb.filter(F.pmod("vec_id", F.lit(3)) == i).localCheckpoint(eager=True)
            for i in range(2)
        ]
        t("b0_count", lambda: (b0.count(), b0.select("vec_id").distinct().count()), out)
        t(
            "b0_within_pairs",
            lambda: cosine_lsh_pairs(
                b0, 0.45, 64, multiprobe=N_PLANES
            ).write.format("noop").mode("overwrite").save(),
            out,
        )
        t(
            "b0_index_build",
            lambda: lsh_index_build(
                b0, prefix, threshold=0.45, dim=64, multiprobe=N_PLANES
            ),
            out,
        )
        t("b1_count", lambda: (b1.count(), b1.select("vec_id").distinct().count()), out)
        t(
            "b1_screen",
            lambda: decontaminate_incremental(b1, prefix).count(),
            out,
        )
        t(
            "b1_within_pairs",
            lambda: cosine_lsh_pairs(
                b1, 0.45, 64, multiprobe=N_PLANES
            ).write.format("noop").mode("overwrite").save(),
            out,
        )
        t("b1_append", lambda: lsh_index_append(b1, prefix), out)
    finally:
        index_drop_all(spark, prefix, ("_buckets", "_vectors", "_meta"))
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = _hadoop_fs(spark, warehouse)
        fs.delete(jpath(_lsh_index_claim(warehouse, prefix)), False)
    print(json.dumps({"probe": "emb_phases", **out}))


def probe_minhash_stream(spark):
    from distributed_graph_db_c_spark.operators.bucketing import index_drop_all
    from distributed_graph_db_c_spark.operators.dedup import _index_claim
    from distributed_graph_db_c_spark.sinks import _hadoop_fs
    from distributed_graph_db_c_spark.streaming.dedup import continuous_index_dedup

    docs = load_table(spark, SF_DIR, "documents")
    prefix = f"probemh_{uuid.uuid4().hex[:8]}"
    pairs_dir = f"/tmp/probe_mh_{uuid.uuid4().hex[:8]}"
    out = {}
    handler = continuous_index_dedup(prefix, pairs_dir)
    try:
        batches = [
            docs.filter(F.pmod("doc_id", F.lit(3)) == i).localCheckpoint(eager=True)
            for i in range(3)
        ]
        for i, b in enumerate(batches):
            t(f"batch{i}", lambda b=b, i=i: handler(b, i), out)
    finally:
        index_drop_all(spark, prefix, ("_bands", "_shingles"))
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = _hadoop_fs(spark, warehouse)
        fs.delete(jpath(_index_claim(warehouse, prefix)), False)
        import shutil

        shutil.rmtree(pairs_dir, ignore_errors=True)
    print(json.dumps({"probe": "minhash_stream", **out}))


def probe_semantic(spark):
    from distributed_graph_db_c_spark.functions.vectors import cosine_seq, norm2_seq
    from distributed_graph_db_c_spark.operators.kmeans import kmeans_assign, kmeans_fit
    from distributed_graph_db_c_spark.operators.traversal import pairs_to_canonical
    from distributed_graph_db_c_spark.queries.dedup import (
        _GRADE_THRESHOLD,
        _grade_corpus,
    )

    out = {}
    corpus = _grade_corpus(spark, SF_DIR).persist()
    try:
        k = max(8, t("count", lambda: corpus.count(), out) // 256)
        unit = corpus.withColumn("_n", norm2_seq(F.col("v"))).select(
            "vec_id", F.transform("v", lambda x: x / F.col("_n")).alias("nv")
        )
        cents, iters, _in = t(
            "kmeans_fit", lambda: kmeans_fit(unit, k=k, vec_col="nv", dim=64), out
        )
        out["kmeans_iters"] = iters
        asg = t(
            "assign",
            lambda: kmeans_assign(unit, cents, vec_col="nv").localCheckpoint(
                eager=True
            ),
            out,
        )
        withc = corpus.join(asg, "vec_id")
        a = withc.select(
            F.col("vec_id").alias("id_a"), F.col("v").alias("_va"), "cluster"
        )
        b = withc.select(
            F.col("vec_id").alias("id_b"), F.col("v").alias("_vb"), "cluster"
        )
        pairs = t(
            "pair_join",
            lambda: (
                a.join(b, "cluster")
                .filter(F.col("id_a") < F.col("id_b"))
                .select(
                    "id_a",
                    "id_b",
                    cosine_seq(F.col("_va"), F.col("_vb")).alias("cosine"),
                )
                .filter(F.col("cosine") >= _GRADE_THRESHOLD)
                .localCheckpoint(eager=True)
            ),
            out,
        )
        t(
            "cc_tail",
            lambda: pairs_to_canonical(pairs, corpus, ("id_a", "id_b"), "vec_id")
            .write.format("noop")
            .mode("overwrite")
            .save(),
            out,
        )
    finally:
        corpus.unpersist()
    print(json.dumps({"probe": "semantic", **out}))


def probe_counts(spark):
    """Job-overhead floor: how much does one count/agg job cost here?"""
    emb = load_table(spark, SF_DIR, "embeddings").localCheckpoint(eager=True)
    out = {}
    t("count1", lambda: emb.count(), out)
    t("count2", lambda: emb.count(), out)
    t("distinct_count", lambda: emb.select("vec_id").distinct().count(), out)
    t(
        "fused_agg",
        lambda: emb.agg(
            F.count("*").alias("n"), F.count_distinct("vec_id").alias("d")
        ).head(),
        out,
    )
    print(json.dumps({"probe": "counts", **out}))


PROBES = {
    "emb_stream": probe_emb_stream,
    "emb_phases": probe_emb_phases,
    "minhash_stream": probe_minhash_stream,
    "semantic": probe_semantic,
    "counts": probe_counts,
}


def main():
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or list(PROBES)
    spark = get_spark("r15-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for name in which:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        PROBES[name](spark)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
