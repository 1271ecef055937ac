"""Round-16 optimization equivalence pins: the shared-bucketing-pass
and precounted-validation params added to the LSH/minhash/IVF append
family (guide §1.2/§4) must be RESULT-INVARIANT — same pairs, same
audits, same refusals — with and without the sharing."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
import pytest

from distributed_graph_db_c_spark.operators.bucketing import index_drop_all
from distributed_graph_db_c_spark.operators.similarity import (
    N_PLANES,
    _lsh_index_claim,
    cosine_lsh_pairs,
    decontaminate_incremental,
    lsh_index_append,
    lsh_index_build,
    lsh_params_for,
    with_lsh_buckets,
)
from distributed_graph_db_c_spark.sinks import _hadoop_fs
from distributed_graph_db_c_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").localCheckpoint(eager=True)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_cosine_lsh_pairs_buckets_df_is_result_invariant(spark, emb):
    n = emb.count()
    n_planes, n_tables, _probe, _ = lsh_params_for(
        n, 0.45, min_multiprobe=N_PLANES
    )
    shared = with_lsh_buckets(
        emb, 64, n_planes=n_planes, n_tables=n_tables
    ).localCheckpoint(eager=True)
    base = cosine_lsh_pairs(emb, 0.45, 64, multiprobe=N_PLANES, n_rows=n)
    via = cosine_lsh_pairs(
        emb, 0.45, 64, multiprobe=N_PLANES, n_rows=n, buckets_df=shared
    )
    assert _rows(base) == _rows(via)


def test_lsh_append_precounted_and_buckets_df_invariant(spark, emb):
    halves = [
        emb.filter(F.pmod("vec_id", F.lit(2)) == i).localCheckpoint(eager=True)
        for i in range(2)
    ]
    eva = emb.filter(F.pmod("vec_id", F.lit(7)) == 0)
    audits, screens = [], []
    for use_sharing in (False, True):
        prefix = f"r16t_{uuid.uuid4().hex[:8]}"
        try:
            lsh_index_build(
                halves[0], prefix, threshold=0.45, dim=64, multiprobe=N_PLANES
            )
            if use_sharing:
                meta = spark.table(f"{prefix}__g00000001_meta").head()
                shared = with_lsh_buckets(
                    halves[1], 64,
                    n_planes=int(meta["n_planes"]),
                    n_tables=int(meta["n_tables"]),
                ).localCheckpoint(eager=True)
                row = halves[1].agg(
                    F.count(F.lit(1)),
                    F.count_distinct("vec_id"),
                    F.max(F.col("vec_id").isNull().cast("int")),
                    F.sum(F.when(F.size("embedding") != 64, 1).otherwise(0)),
                ).head()
                audit = lsh_index_append(
                    halves[1], prefix, buckets_df=shared,
                    precounted=(
                        int(row[0]), int(row[1]) + int(row[2] or 0),
                        int(row[3] or 0), 64,
                    ),
                )
            else:
                audit = lsh_index_append(halves[1], prefix)
            audits.append(audit)
            screens.append(_rows(decontaminate_incremental(eva, prefix)))
        finally:
            index_drop_all(spark, prefix, ("_buckets", "_vectors", "_meta"))
            wh = spark.conf.get("spark.sql.warehouse.dir")
            fs, jpath = _hadoop_fs(spark, wh)
            fs.delete(jpath(_lsh_index_claim(wh, prefix)), False)
    assert audits[0] == audits[1]
    assert screens[0] == screens[1]


def test_lsh_append_precounted_dim_mismatch_falls_back(spark, emb):
    """A precounted tuple measured against the WRONG dim must be ignored
    (the append re-aggregates), so a bogus width count can never skip
    the width refusal."""
    halves = [
        emb.filter(F.pmod("vec_id", F.lit(2)) == i).localCheckpoint(eager=True)
        for i in range(2)
    ]
    prefix = f"r16t_{uuid.uuid4().hex[:8]}"
    try:
        lsh_index_build(
            halves[0], prefix, threshold=0.45, dim=64, multiprobe=N_PLANES
        )
        # dim_counted=32 != recorded 64 -> fall back to own aggregation,
        # which still passes (vectors are width 64); the bogus n_bad=999
        # in the tuple must NOT trigger a refusal
        audit = lsh_index_append(
            halves[1], prefix,
            precounted=(halves[1].count(), halves[1].count(), 999, 32),
        )
        assert audit["segment"] == 1
    finally:
        index_drop_all(spark, prefix, ("_buckets", "_vectors", "_meta"))
        wh = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = _hadoop_fs(spark, wh)
        fs.delete(jpath(_lsh_index_claim(wh, prefix)), False)


def test_minhash_append_hs_rows_invariant(spark):
    from distributed_graph_db_c_spark.operators.dedup import (
        _index_claim,
        minhash_index_append,
        minhash_index_build,
        minhash_index_status,
        shingle_hash_sets,
    )

    docs = load_table(spark, SF_DIR, "documents").localCheckpoint(eager=True)
    halves = [docs.filter(F.pmod("doc_id", F.lit(2)) == i) for i in range(2)]
    audits, statuses = [], []
    for pass_rows in (False, True):
        prefix = f"r16m_{uuid.uuid4().hex[:8]}"
        try:
            minhash_index_build(halves[0], prefix)
            hs = shingle_hash_sets(halves[1], 3, "doc_id", "text").localCheckpoint(
                eager=True
            )
            kw = dict(hs_df=hs)
            if pass_rows:
                kw["hs_rows"] = hs.count()
            audits.append(minhash_index_append(halves[1], prefix, **kw))
            statuses.append(minhash_index_status(spark, prefix))
        finally:
            index_drop_all(spark, prefix, ("_bands", "_shingles"))
            wh = spark.conf.get("spark.sql.warehouse.dir")
            fs, jpath = _hadoop_fs(spark, wh)
            fs.delete(jpath(_index_claim(wh, prefix)), False)
    assert audits[0] == audits[1]
    assert statuses[0] == statuses[1]
