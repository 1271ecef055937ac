"""Round-16 optimization probe: phase-level wall timings for this
round's targets (guide §1 — measure first, isolate phases).

Beyond the r15 probe, this one opens up the per-micro-batch APPEND
commit path (VERDICT r15 item 1: 2x saveAsTable + catalog + sidecar +
ledger per batch) so the commit overhead is measured separately from
the LSH/minhash compute, and adds the ledger-fuse A/B (item 3) and the
stream-machinery floor (item 8).

Usage:
    python tools/r16_phase_probe.py [probe ...]
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


def probe_append_phases(spark):
    """The embedding-index append path, phase by phase: validation agg,
    bucket-table write, vector-table write, marker publish, ledger agg.
    Run against a 2-batch index so the write sizes match the stream
    gate's."""
    from distributed_graph_db_c_spark.operators.bucketing import (
        index_drop_all,
        index_gen_prefix,
        index_publish_segment,
        index_seg_prefix,
        index_segments,
        write_bucketed,
    )
    from distributed_graph_db_c_spark.operators.similarity import (
        _lsh_index_claim,
        lsh_index_build,
        with_lsh_buckets,
    )
    from distributed_graph_db_c_spark.functions.vectors import norm2_seq
    from distributed_graph_db_c_spark.sinks import _hadoop_fs

    emb = load_table(spark, SF_DIR, "embeddings")
    prefix = f"probeap_{uuid.uuid4().hex[:8]}"
    out = {}
    try:
        b0, b1 = [
            emb.filter(F.pmod("vec_id", F.lit(3)) == i).localCheckpoint(eager=True)
            for i in range(2)
        ]
        t(
            "build_b0",
            lambda: lsh_index_build(b0, prefix, threshold=0.45, dim=64, multiprobe=4),
            out,
        )
        # manual replay of lsh_index_append(b1) with per-phase timing
        gp = index_gen_prefix(prefix, 1)
        meta = spark.table(f"{gp}_meta").head()
        n_planes, n_tables, dim = (
            int(meta["n_planes"]), int(meta["n_tables"]), int(meta["dim"]),
        )
        t(
            "validate_agg",
            lambda: b1.agg(
                F.count(F.lit(1)),
                F.count_distinct("vec_id"),
                F.max(F.col("vec_id").isNull().cast("int")),
                F.sum(F.when(F.size("embedding") != dim, 1).otherwise(0)),
            ).head(),
            out,
        )
        t(
            "dupcheck_semi",
            lambda: b1.select(F.col("vec_id").alias("id"))
            .join(spark.table(f"{gp}_vectors").select("id"), "id", "left_semi")
            .count(),
            out,
        )
        sp = index_seg_prefix(prefix, 1, 1)
        bt = with_lsh_buckets(
            b1, dim, n_planes=n_planes, n_tables=n_tables
        ).select(
            F.col("vec_id").alias("id"),
            F.posexplode("buckets").alias("table", "bucket"),
        )
        bkeyed = bt.select(
            "id", F.xxhash64(F.col("table"), F.col("bucket")).alias("bkey")
        )
        t(
            "write_buckets_table",
            lambda: write_bucketed(bkeyed, f"{sp}_buckets", key="bkey", n_buckets=16),
            out,
        )
        vecs = b1.select(
            F.col("vec_id").alias("id"),
            norm2_seq(F.col("embedding")).alias("nrm"),
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        t(
            "write_vectors_table",
            lambda: write_bucketed(vecs, f"{sp}_vectors", key="id", n_buckets=16),
            out,
        )
        t(
            "publish_marker",
            lambda: index_publish_segment(spark, prefix, 1, 1, "probe"),
            out,
        )
        segs = index_segments(spark, prefix, 1)
        # ledger A/B: tagged-union single job vs per-part count()
        import functools as _ft
        from pyspark.sql import DataFrame as _DF

        parts = [f"{gp}_vectors"] + [
            f"{index_seg_prefix(prefix, 1, s)}_vectors" for s in segs
        ]
        for rep in range(3):
            t(
                f"ledger_union_{rep}",
                lambda: _ft.reduce(
                    _DF.unionByName,
                    [
                        spark.table(p).select(F.lit(i).alias("_pi"))
                        for i, p in enumerate(parts)
                    ],
                )
                .groupBy("_pi")
                .agg(F.count(F.lit(1)))
                .collect(),
                out,
            )
            t(
                f"ledger_perpart_{rep}",
                lambda: [spark.table(p).count() for p in parts],
                out,
            )
    finally:
        index_drop_all(spark, prefix, ("_buckets", "_vectors", "_meta"))
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = _hadoop_fs(spark, warehouse)
        fs.delete(jpath(_lsh_index_claim(warehouse, prefix)), False)
    print(json.dumps({"probe": "append_phases", **out}))


def probe_emb_handler_phases(spark):
    """The embedding stream handler's NON-bootstrap batch, phase by
    phase — isolates bucketing-pass sharing potential (VERDICT item 6):
    the screen, the within-batch pairs, and the append each call
    with_lsh_buckets over the same pinned batch."""
    from distributed_graph_db_c_spark.operators.bucketing import (
        count_and_distinct,
        index_drop_all,
    )
    from distributed_graph_db_c_spark.operators.similarity import (
        N_PLANES,
        _lsh_index_claim,
        cosine_lsh_pairs,
        decontaminate_incremental,
        lsh_index_append,
        lsh_index_build,
        with_lsh_buckets,
    )
    from distributed_graph_db_c_spark.sinks import _hadoop_fs

    emb = load_table(spark, SF_DIR, "embeddings")
    prefix = f"probehp_{uuid.uuid4().hex[:8]}"
    out = {}
    try:
        b0, b1 = [
            emb.filter(F.pmod("vec_id", F.lit(3)) == i).localCheckpoint(eager=True)
            for i in range(2)
        ]
        lsh_index_build(b0, prefix, threshold=0.45, dim=64, multiprobe=N_PLANES)
        n_batch, _ = t("count_and_distinct", lambda: count_and_distinct(b1, "vec_id"), out)
        t(
            "classify_semi",
            lambda: b1.select(F.col("vec_id").alias("id"))
            .join(
                spark.table(
                    f"{prefix}__g00000001_vectors"
                ).select("id"),
                "id",
                "left_semi",
            )
            .count(),
            out,
        )
        t(
            "bucket_pass_alone",
            lambda: with_lsh_buckets(b1, 64, n_planes=N_PLANES, n_tables=8)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            out,
        )
        t(
            "screen",
            lambda: decontaminate_incremental(b1, prefix),
            out,
        )
        t(
            "within_pairs",
            lambda: cosine_lsh_pairs(
                b1, 0.45, 64, multiprobe=N_PLANES, n_rows=n_batch
            )
            .write.format("noop")
            .mode("overwrite")
            .save(),
            out,
        )
        t(
            "append",
            lambda: lsh_index_append(b1, prefix, check_duplicate_ids=False),
            out,
        )
    finally:
        index_drop_all(spark, prefix, ("_buckets", "_vectors", "_meta"))
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = _hadoop_fs(spark, warehouse)
        fs.delete(jpath(_lsh_index_claim(warehouse, prefix)), False)
    print(json.dumps({"probe": "emb_handler_phases", **out}))


def probe_stream_floor(spark):
    """Stream-machinery floor: an availableNow drain of 3 batches into a
    foreachBatch that does NOTHING — trigger + checkpoint bookkeeping
    only (VERDICT item 8's 'machinery floor' question)."""
    from distributed_graph_db_c_spark.streaming.sources import (
        cleanup,
        read_file_stream,
        run_available_now,
        scratch_dir,
        stage_stream_dir,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    scratch = scratch_dir("floorprobe")
    out = {}
    try:
        batches = [emb.filter(F.pmod("vec_id", F.lit(3)) == i) for i in range(3)]
        t("stage", lambda: stage_stream_dir(batches, f"{scratch}/in"), out)
        sev = read_file_stream(spark, f"{scratch}/in", emb.schema)

        def noop_handler(batch, batch_id):
            pass

        t(
            "drain_noop3",
            lambda: run_available_now(
                sev, f"{scratch}/ckpt", foreach_batch=noop_handler
            ),
            out,
        )

        def count_handler(batch, batch_id):
            batch.localCheckpoint(eager=True)

        t(
            "drain_ckpt3",
            lambda: run_available_now(
                sev, f"{scratch}/ckpt2", foreach_batch=count_handler
            ),
            out,
        )
    finally:
        cleanup(scratch)
    print(json.dumps({"probe": "stream_floor", **out}))


def probe_minhash_append_phases(spark):
    """minhash_index_append's commit path at stream-gate batch size."""
    from distributed_graph_db_c_spark.operators.bucketing import (
        index_drop_all,
        index_gen_prefix,
        index_seg_prefix,
        index_segments,
    )
    from distributed_graph_db_c_spark.operators.dedup import (
        _index_claim,
        minhash_index_append,
        minhash_index_build,
        minhash_signatures,
        shingle_hash_sets,
    )
    from distributed_graph_db_c_spark.sinks import _hadoop_fs

    docs = load_table(spark, SF_DIR, "documents")
    prefix = f"probemha_{uuid.uuid4().hex[:8]}"
    out = {}
    try:
        b0, b1 = [
            docs.filter(F.pmod("doc_id", F.lit(3)) == i).localCheckpoint(eager=True)
            for i in range(2)
        ]
        t("build_b0", lambda: minhash_index_build(b0, prefix), out)
        hs = t(
            "hs_pass",
            lambda: shingle_hash_sets(b1, 3, "doc_id", "text").localCheckpoint(
                eager=True
            ),
            out,
        )
        sig = t(
            "sig_pass",
            lambda: minhash_signatures(b1, hs_df=hs).localCheckpoint(eager=True),
            out,
        )
        t("hs_count", lambda: hs.count(), out)
        t(
            "append_total",
            lambda: minhash_index_append(
                b1, prefix, hs_df=hs, sig_df=sig, check_duplicate_ids=False
            ),
            out,
        )
        gp = index_gen_prefix(prefix, 1)
        segs = index_segments(spark, prefix, 1)
        import functools as _ft
        from pyspark.sql import DataFrame as _DF

        parts = [f"{gp}_shingles"] + [
            f"{index_seg_prefix(prefix, 1, s)}_shingles" for s in segs
        ]
        for rep in range(3):
            t(
                f"ledger_union_{rep}",
                lambda: _ft.reduce(
                    _DF.unionByName,
                    [
                        spark.table(p).select(F.lit(i).alias("_pi"))
                        for i, p in enumerate(parts)
                    ],
                )
                .groupBy("_pi")
                .agg(F.count(F.lit(1)))
                .collect(),
                out,
            )
            t(
                f"ledger_perpart_{rep}",
                lambda: [spark.table(p).count() for p in parts],
                out,
            )
    finally:
        index_drop_all(spark, prefix, ("_bands", "_shingles"))
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = _hadoop_fs(spark, warehouse)
        fs.delete(jpath(_index_claim(warehouse, prefix)), False)
    print(json.dumps({"probe": "minhash_append_phases", **out}))


def probe_interval_join(spark):
    """stream_stream_interval_join / attribution: is the cost trigger
    cadence or plan?  Times the gate end-to-end, then the same drain
    with a noop handler over the same staged files."""
    from distributed_graph_db_c_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    out = {}
    for name in ("stream_stream_interval_join", "stream_attribution_last_touch"):
        t(
            name,
            lambda n=name: REGISTRY[n]
            .run(spark, SF_DIR)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            out,
        )
    print(json.dumps({"probe": "interval_join", **out}))


PROBES = {
    "append_phases": probe_append_phases,
    "emb_handler_phases": probe_emb_handler_phases,
    "stream_floor": probe_stream_floor,
    "minhash_append_phases": probe_minhash_append_phases,
    "interval_join": probe_interval_join,
}


def main():
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or list(PROBES)
    spark = get_spark("r16-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for name in which:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        PROBES[name](spark)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
