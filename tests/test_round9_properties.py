"""Round-9 operator property pins: the de-vacuumed EXCEPT gate, the
covariance significand guard, incremental-dedup gate hygiene, the
IVF-backed kNN gather twin, second-order transitions, tokenizer-scale
OOV, and per-group quantile sketches."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


def test_except_nations_nonvacuous(spark):
    """The r8 verdict's 'what's wrong' item 1: the original EXCEPT gate
    subtracted ALL supplier nations and returned 0 rows at every SF
    (full overlap), so it proved only that both engines return empty.
    The reworked gate subtracts EUROPEAN-supplier nations only; this
    pin states (a) the original full-overlap form IS empty — why the
    rework was needed — and (b) the reworked gate is provably nonempty
    and disjoint from the subtracted side."""
    from distributed_graph_db_c_spark.queries.relational import rel_except_nations
    from distributed_graph_db_c_spark.sources.tables import load_table

    c = load_table(spark, SF01_DIR, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    s_all = load_table(spark, SF01_DIR, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    assert c.subtract(s_all).count() == 0  # (a) the vacuous original

    got = rel_except_nations(spark, SF01_DIR)
    rows = {r["nationkey"] for r in got.collect()}
    assert rows, "reworked EXCEPT gate must be nonempty"
    # (b) disjoint from European supplier nations, subset of customer nations
    n = load_table(spark, SF01_DIR, "nation")
    r = load_table(spark, SF01_DIR, "region").filter(F.col("r_name") == "EUROPE")
    euro = {
        row["s_nationkey"]
        for row in load_table(spark, SF01_DIR, "supplier")
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_nationkey")
        .collect()
    }
    cust = {row["nationkey"] for row in c.distinct().collect()}
    assert rows == cust - euro


def test_covariance_rejects_wide_significands(spark):
    """The r9 advisory's pca.py item: the adaptive block floors at one
    row, but a single product of two >26-significant-bit quantized
    values is already inexact in float64 — shrinking can't save it, so
    covariance_moments must refuse loudly.  Double-typed components at
    |x| ~ 3000 carry full-width significands after quantization (unlike
    the float32 cast in the r8 large-magnitude test, whose 24-bit
    significands keep products exact at any magnitude — that test still
    passes, pinning that the guard keys on significance, not size)."""
    from distributed_graph_db_c_spark.operators.pca import (
        covariance_merge,
        covariance_moments,
    )

    rng = np.random.default_rng(11)
    dim = 4
    data = [
        (int(i), [float(x) for x in rng.standard_normal(dim) * 3000.0])
        for i in range(32)
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="significant bits"):
        covariance_merge(covariance_moments(df, dim=dim), dim=dim)


def test_incremental_gate_leaves_no_claim_marker(spark):
    """The r9 advisory's dedup.py item: a FAILED index build leaves its
    claim marker by design (durable indexes must fail loudly until
    repaired), but the dedup_incremental_pairs gate uses a random
    throwaway prefix — an orphaned marker would litter the shared
    warehouse forever.  The gate's cleanup must drop marker AND tables
    on every exit path."""
    import glob
    import os

    from distributed_graph_db_c_spark.queries.dedup import dedup_incremental_pairs

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    before = set(glob.glob(os.path.join(warehouse, "_incgate_*")))
    dedup_incremental_pairs(spark, SF_DIR).collect()
    after = set(glob.glob(os.path.join(warehouse, "_incgate_*")))
    assert after <= before, f"stray incremental-gate claim markers: {after - before}"
    assert not [t.name for t in spark.catalog.listTables() if t.name.startswith("incgate_")]


# -- IVF-backed kNN gather (round 9) -----------------------------------------


def _load_embeddings_numpy(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy()
    E = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    return ids, E


def test_ivf_rankings_have_margin():
    """The IVF oracle's explicit corpus-contingency: Spark ranks cells
    and assignments via numpy (normalize-then-matmul) while the DuckDB
    oracle folds dot/(norm*norm) — different last-ulp rounding (~1e-15
    relative).  The oracle is exact only while no assignment and no
    probe-boundary ranking sits inside that noise; this pin measures
    the minimum gaps (observed >= 1.8e-6 at every SF) and fails loudly
    if a corpus change pushes a ranking within 1e-9 — diagnose THERE,
    not in the gate."""
    import hashlib

    from distributed_graph_db_c_spark.queries.similarity import (
        _KNN_IVF_CELLS,
        _KNN_IVF_NPROBE,
        _KNN_Q,
    )

    for sf in (SF_DIR, SF01_DIR):
        ids, E = _load_embeddings_numpy(sf)
        h = np.array(
            [hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids]
        )
        cidx = np.lexsort((ids, h))[:_KNN_IVF_CELLS]
        C = E[cidx]
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
        S = En @ Cn.T
        Ss = np.sort(S, axis=1)
        assert (Ss[:, -1] - Ss[:, -2]).min() > 1e-9, f"assignment margin at {sf}"
        Q = np.sort(S[ids < _KNN_Q], axis=1)[:, ::-1]
        assert (
            Q[:, _KNN_IVF_NPROBE - 1] - Q[:, _KNN_IVF_NPROBE]
        ).min() > 1e-9, f"probe boundary margin at {sf}"


def test_knn_gather_ivf_recall_prune_determinism(spark):
    """Three pins on the round-9 IVF gather twin: (a) measured
    recall@10 vs the exact top-10 at the (24, 8) operating point —
    mean >= 0.5, min >= 0.2 (the honest cost of reading 1/3 of the
    cells on an unclustered corpus); (b) DISK pruning is real: a
    2-query batch's scan plan carries a cell INSET partition filter
    covering at most 16 of the 24 cell directories; (c) the gate is
    deterministic across runs (fresh index build included)."""
    import re

    import pyspark.sql.functions as F2

    from distributed_graph_db_c_spark.functions.vectors import cosine_seq
    from distributed_graph_db_c_spark.operators.similarity import (
        ivf_batch_query_persisted,
        ivf_build,
    )
    from distributed_graph_db_c_spark.queries.similarity import (
        sim_knn_gather_mean_ivf,
    )
    from distributed_graph_db_c_spark.sources.tables import load_table
    from distributed_graph_db_c_spark.streaming.sources import cleanup, scratch_dir

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F2.col("vec_id") < 20).select(
        F2.col("vec_id").alias("qid"), F2.col("embedding").alias("qvec")
    )
    scored = (
        emb.crossJoin(F2.broadcast(q))
        .filter(F2.col("vec_id") != F2.col("qid"))
        .select(
            "qid",
            "vec_id",
            cosine_seq(F2.col("embedding"), F2.col("qvec")).alias("c"),
        )
    )
    item = F2.struct((-F2.col("c")).alias("n"), F2.col("vec_id").alias("v"))
    top = (
        scored.groupBy("qid")
        .agg(F2.slice(F2.array_sort(F2.collect_list(item)), 1, 10).alias("t"))
        .collect()
    )
    truth = {r["qid"]: {x["v"] for x in r["t"]} for r in top}
    queries = [(r["qid"], list(r["qvec"])) for r in q.collect()]
    s = scratch_dir("ivfpin")
    try:
        ivf_build(emb, f"{s}/idx", n_cells=24)
        nn = ivf_batch_query_persisted(spark, f"{s}/idx", queries, top_k=10, nprobe=8)
        got: dict[int, set] = {}
        for r in nn.collect():
            got.setdefault(r["qid"], set()).add(r["vec_id"])
        recalls = [len(got[qid] & tv) / 10 for qid, tv in truth.items()]
        assert sum(recalls) / len(recalls) >= 0.5, recalls
        assert min(recalls) >= 0.2, recalls
        # (b) partition pruning: 2 queries x 8 probes <= 16 < 24 cells
        nn2 = ivf_batch_query_persisted(
            spark, f"{s}/idx", queries[:2], top_k=10, nprobe=8
        )
        plan = nn2._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[.*?INSET ([0-9, ]+)", plan)
        assert m, "lists scan lost its cell INSET partition filter"
        assert len(m.group(1).split(",")) <= 16
    finally:
        cleanup(s)
    # (c) end-to-end determinism, fresh index each run
    a = sorted(map(tuple, sim_knn_gather_mean_ivf(spark, SF_DIR).collect()))
    b = sorted(map(tuple, sim_knn_gather_mean_ivf(spark, SF_DIR).collect()))
    assert a == b


# -- per-group quantile sketches (round 9) ------------------------------------


def test_quantiles_exact_regime_matches_rank(spark):
    """In the exact regime (group rows < accuracy) the per-lang GK gate
    must return, for each p, the smallest element whose 1-based rank
    >= ceil(p*n) — the semantics DuckDB's quantile_disc shares (the
    oracle's contingency).  Verified against sorted numpy ranks per
    language, and pinned PARTITIONING-INVARIANT: the sketch's partial
    merges must not change results between 2 and 32 input partitions."""
    import math

    from distributed_graph_db_c_spark.queries.sketches import (
        sketch_quantiles_doclen_by_lang,
    )
    from distributed_graph_db_c_spark.sources.tables import load_table

    got = {r["lang"]: r for r in sketch_quantiles_doclen_by_lang(spark, SF01_DIR).collect()}
    pdf = load_table(spark, SF01_DIR, "documents").select("lang", "n_chars").toPandas()
    for lang, grp in pdf.groupby("lang"):
        sv = sorted(grp["n_chars"])
        for p, col in ((0.25, "chars_p25"), (0.5, "chars_p50"), (0.75, "chars_p75"), (0.95, "chars_p95")):
            assert got[lang][col] == sv[max(0, math.ceil(p * len(sv)) - 1)], (lang, col)
        assert got[lang]["n_docs"] == len(sv)

    from distributed_graph_db_c_spark.sources.tables import load_table as _lt

    base = _lt(spark, SF01_DIR, "documents")
    import pyspark.sql.functions as F2

    def run(df):
        q = df.groupBy("lang").agg(
            F2.percentile_approx("n_chars", [0.25, 0.5, 0.75, 0.95], 10000).alias("cq")
        )
        return sorted(map(tuple, q.select("lang", F2.explode("cq")).collect()))

    assert run(base.repartition(2)) == run(base.repartition(32))


def test_quantiles_lossy_rank_error_bound(spark):
    """The lossy regime's contract: with accuracy A, the returned value's
    true rank is within n/A of the target rank (GK guarantee).  30k rows
    through accuracy=100 must land within 1.5 * n/A (slack for the
    merge path's bound constant)."""
    import pyspark.sql.functions as F2

    n = 30_000
    df = spark.range(n).select((F2.col("id") * 7919 % n).alias("x"))
    est = df.agg(F2.percentile_approx("x", 0.5, 100)).head()[0]
    # x is a permutation of 0..n-1, so rank(v) == v+1
    assert abs((est + 1) - 0.5 * n) <= 1.5 * n / 100


# -- second-order transitions (round 9) ---------------------------------------


def test_transition_bigram_conserves_and_row_stochastic(spark):
    """The bigram matrix must conserve mass — total transitions equal
    sum over users of max(0, events-2) — and each (from_a, from_b) row
    must sum its counts to n_from with milli-probabilities summing to
    <= 1000 (integer floor) and > 1000 - n_states."""
    import pyspark.sql.functions as F2

    from distributed_graph_db_c_spark.queries.relational import (
        rel_events_transition_bigram,
    )
    from distributed_graph_db_c_spark.sources.tables import load_table

    m = rel_events_transition_bigram(spark, SF_DIR).collect()
    total = sum(r["n"] for r in m)
    per_user = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F2.count("*").alias("c"))
        .collect()
    )
    assert total == sum(max(0, r["c"] - 2) for r in per_user)
    rows: dict[tuple, list] = {}
    for r in m:
        rows.setdefault((r["from_a"], r["from_b"]), []).append(r)
    for key, rs in rows.items():
        n_from = rs[0]["n_from"]
        assert all(r["n_from"] == n_from for r in rs)
        assert sum(r["n"] for r in rs) == n_from
        pm = sum(r["p_milli"] for r in rs)
        assert 1000 - len(rs) < pm <= 1000, (key, pm)


# -- tokenizer-scale OOV (round 9) ---------------------------------------------


def test_oov_tokenizer_matches_naive_and_aug_is_inert(spark):
    """Differential pin: the broadcast-join OOV gate must equal a naive
    Python set computation (train-split vocab, eval-split scoring), and
    the 100k synthetic vocab entries must be provably inert — every
    real token is whitespace-split so none can contain the space the
    synthetic entries embed."""
    from distributed_graph_db_c_spark.queries.text import text_oov_rate_tokenizer
    from distributed_graph_db_c_spark.sources.tables import load_table

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_milli"])
        for r in text_oov_rate_tokenizer(spark, SF_DIR).collect()
    }
    pdf = load_table(spark, SF_DIR, "documents").select("doc_id", "text").toPandas()
    vocab: set[str] = set()
    evals = {}
    for _, row in pdf.iterrows():
        toks = [t for t in row["text"].lower().split() if t]
        if row["doc_id"] % 2 == 0:
            vocab.update(toks)
        else:
            evals[row["doc_id"]] = toks
    assert not any(" " in t for ts in evals.values() for t in ts)
    exp = {
        d: (len(ts), sum(t not in vocab for t in ts))
        for d, ts in evals.items()
        if ts
    }
    assert set(got) == set(exp)
    for d, (nt, no) in exp.items():
        assert got[d] == (nt, no, (1000 * no) // nt), d


# -- capability-probed compressed codecs (round 9) ----------------------------


def test_codec_gates_always_registered_and_fail_loudly(spark):
    """Round-12 registration contract (supersedes the round-9
    capability-conditional one): the JPEG/FLAC gates are ALWAYS
    registered — the native baseline-JPEG / verbatim-FLAC codec pairs
    carry them in every environment — and malformed compressed blobs
    still fail LOUDLY (NotImplementedError), never an empty-but-green
    result, with or without Pillow/soundfile."""
    from distributed_graph_db_c_spark.operators.multimodal import (
        decode_audio,
        decode_image,
    )
    from distributed_graph_db_c_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    assert "mm_jpeg_decode_stats" in REGISTRY
    assert "mm_flac_decode_features" in REGISTRY
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # garbage JPEG
    with pytest.raises(NotImplementedError):
        decode_audio(b"fLaC" + b"\x00" * 32)  # garbage FLAC


def test_jpeg_decode_stats_pins(spark):
    """JPEG gate pins — UNCONDITIONAL since round 12 (the native codec
    pair carries the gate everywhere; the skipif died with the
    capability gate): decoded dims match the synthesized gradient
    exactly; per-image mean pixel value is within JPEG-lossy tolerance
    (+-3) of the source gradient's."""
    from distributed_graph_db_c_spark.queries.multimodal import (
        mm_jpeg_decode_stats,
    )

    got = {r["doc_id"]: r for r in mm_jpeg_decode_stats(spark, SF_DIR).collect()}
    assert got
    for doc_id, r in got.items():
        w = 16 + doc_id % 13
        h = 16 + doc_id % 11
        assert (r["width"], r["height"]) == (w, h), doc_id
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        rr = np.clip(40 + x * 2 + doc_id % 64, 0, 255)
        gg = np.clip(60 + y * 3 + (2 * doc_id) % 64, 0, 255)
        bb = np.clip(80 + x + y + (3 * doc_id) % 64, 0, 255)
        src_mean = float(
            np.stack(np.broadcast_arrays(rr, gg, bb), axis=-1).mean()
        )
        got_mean = r["px_sum"] / (w * h * 3)
        assert abs(got_mean - src_mean) <= 3.0, (doc_id, got_mean, src_mean)
    # determinism of the whole encode->decode->stats path
    again = {r["doc_id"]: r for r in mm_jpeg_decode_stats(spark, SF_DIR).collect()}
    assert {k: tuple(v) for k, v in got.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_flac_decode_matches_wav_scaled(spark):
    """FLAC-vs-WAV differential — UNCONDITIONAL since round 12 (the
    native verbatim-FLAC codec carries the gate everywhere): FLAC is
    lossless and carries the same square wave as the WAV gate, so every
    feature must match the WAV gate's under the int32 convention's
    exact 2^16 scaling: n/rate equal, max_abs and wsum x 65536, rms_sq
    x 65536^2 — integers, no tolerance."""
    from distributed_graph_db_c_spark.queries.multimodal import (
        mm_flac_decode_features,
        mm_wav_decode_features,
    )

    flac = {r["doc_id"]: r for r in mm_flac_decode_features(spark, SF_DIR).collect()}
    wav = {r["doc_id"]: r for r in mm_wav_decode_features(spark, SF_DIR).collect()}
    assert set(flac) == set(wav) and flac
    # (the round-12 first RUN of this differential caught the column
    # names drifting — the dormant capability-skipped version referred
    # to a "max_abs" column audio_decode_features never had: exactly
    # the declared-not-evidenced rot the verdicts tracked)
    for d, fr in flac.items():
        wr = wav[d]
        assert fr["n_samples"] == wr["n_samples"]
        assert fr["sample_rate"] == wr["sample_rate"]
        assert fr["peak"] == wr["peak"] * 65536
        assert fr["wsum"] == wr["wsum"] * 65536
        assert fr["rms_sq"] == wr["rms_sq"] * 65536 * 65536


# -- exact-integer k-means (round 9) -------------------------------------------


def _python_kmeans(sf_dir, k=8, max_iters=8):
    """Pure-Python replica of operators/kmeans.py's integer arithmetic —
    the differential oracle for an op SQL can't express."""
    import hashlib

    ids, E = _load_embeddings_numpy(sf_dir)
    W = np.floor(E * float(1 << 20) + 0.5).astype(np.int64)
    order = sorted(range(len(ids)), key=lambda i: (hashlib.md5(str(int(ids[i])).encode()).hexdigest(), ids[i]))
    cents = [ [int(v) for v in W[i]] for i in order[:k] ]
    last_inertia = None
    for _ in range(max_iters):
        C = np.asarray(cents, dtype=np.int64)
        d2 = ((W[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        am = np.argmin(d2, axis=1)
        inertia = int(d2[np.arange(len(am)), am].sum())
        new_cents = list(cents)
        for cl in range(k):
            mask = am == cl
            n = int(mask.sum())
            if n > 0:
                s = W[mask].sum(axis=0)
                new_cents[cl] = [(2 * int(sv) + n) // (2 * n) for sv in s]
        if new_cents == cents and last_inertia == inertia:
            break
        cents, last_inertia = new_cents, inertia
    fit_inertia = int(last_inertia if last_inertia is not None else inertia)
    C = np.asarray(cents, dtype=np.int64)
    d2 = ((W[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    am = np.argmin(d2, axis=1)
    summary = {}
    for cl in np.unique(am):
        mask = am == cl
        summary[int(cl)] = (
            int(mask.sum()),
            int(ids[mask].sum()),
            int(d2[mask, cl].sum()),
        )
    return cents, summary, fit_inertia


def test_kmeans_matches_python_replica_and_partitioning(spark):
    """Two pins on the exact-integer k-means: (a) the distributed fixed
    point equals a pure-Python replica of the same integer arithmetic —
    centroids, cluster sizes, exact membership checksums, integer
    inertia, all equal, no tolerance; (b) the whole computation is
    PARTITIONING-INVARIANT: 3 vs 17 input partitions produce identical
    results (the property the arbitrary-precision integer merge buys —
    a float implementation fails this)."""
    from distributed_graph_db_c_spark.operators.kmeans import (
        kmeans_fit,
        kmeans_summary,
    )
    from distributed_graph_db_c_spark.sources.tables import load_table

    exp_cents, exp_summary, exp_fit_inertia = _python_kmeans(SF_DIR)
    emb = load_table(spark, SF_DIR, "embeddings")
    results = []
    for parts in (3, 17):
        df = emb.repartition(parts)
        cents, iters, inertia = kmeans_fit(df, k=8)
        got = {
            int(r["cluster"]): (r["n_vecs"], r["id_checksum"], int(r["inertia_q"]))
            for r in kmeans_summary(df, cents).collect()
        }
        results.append((cents, got, inertia))
    assert results[0] == results[1], "k-means is partitioning-dependent"
    cents, got, inertia = results[0]
    assert cents == exp_cents
    assert got == exp_summary
    # fit-returned inertia is ASSIGNMENT-TIME (under the pre-update
    # centroids of the last Lloyd step) — compare to the replica's, not
    # to the summary's final-centroid recomputation
    assert inertia == exp_fit_inertia


def test_kmeans_rejects_zero_iters(spark):
    """kmeans_fit(max_iters=0) used to die with NameError on an unbound
    `inertia` (r10 advisory); it now refuses loudly — the returned
    (centroids, iters, inertia) triple is only meaningful after at
    least one assignment pass."""
    from distributed_graph_db_c_spark.operators.kmeans import kmeans_fit
    from distributed_graph_db_c_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError, match="max_iters"):
        kmeans_fit(emb, k=4, max_iters=0)


def test_kmeans_moments_inertia_survives_int64_overflow():
    """The fit path's per-cluster inertia accumulates row-wise into
    Python ints (r10 advisory): per-row d2 < 2^50, so a numpy int64
    block sum wraps once ~8k max-magnitude rows share a cluster in one
    Arrow batch.  Feed the summarize kernel a synthetic batch whose
    true inertia exceeds int64 and assert the exact value comes back
    through the string transfer."""
    import pandas as pd

    from distributed_graph_db_c_spark.operators.kmeans import _moments

    d2 = (1 << 50) - 1
    n_rows = 10_000  # n_rows * d2 ~ 2^63.3 > int64 max
    pdf = pd.DataFrame(
        {
            "vec_id": range(n_rows),
            "w": [[0, 0] for _ in range(n_rows)],
            "cluster": [0] * n_rows,
            "d2": np.full(n_rows, d2, dtype=np.int64),
        }
    )
    # drive the mapInPandas kernel directly (same code path, no Spark)
    class _FakeDF:
        def mapInPandas(self, fn, schema):
            rows = list(fn(iter([pdf])))[0].to_dict("records")

            class _Collected:
                def collect(self_inner):
                    return rows

            return _Collected()

    rows = _moments(_FakeDF(), dim=2)
    expected = n_rows * d2
    assert expected > np.iinfo(np.int64).max
    assert int(rows[0]["inertia"]) == expected


def test_kmeans_gate_shape(spark):
    """Gate-level sanity: every vector lands in exactly one cluster
    (sizes sum to the corpus), the membership checksum partitions the
    id space, and a repeated run is identical (fresh init included)."""
    import pyspark.sql.functions as F2

    from distributed_graph_db_c_spark.queries.similarity import sim_kmeans_clusters
    from distributed_graph_db_c_spark.sources.tables import load_table

    a = sorted(map(tuple, sim_kmeans_clusters(spark, SF_DIR).collect()))
    b = sorted(map(tuple, sim_kmeans_clusters(spark, SF_DIR).collect()))
    assert a == b
    emb = load_table(spark, SF_DIR, "embeddings")
    n, id_sum = emb.agg(F2.count("*"), F2.sum("vec_id")).first()
    assert sum(r[1] for r in a) == n
    assert sum(r[2] for r in a) == id_sum


# -- SemDeDup cluster-then-dedup (round 9) -------------------------------------


def _semantic_replica(sf_dir, k=8, threshold=0.8):
    """Pure-Python replica of dedup_semantic_survivors: same corpus
    planting, same LEFT-FOLD norms (not numpy sums — the quantization
    must see identical doubles), same integer k-means, same within-
    cluster exact pairs, same min-label components."""
    import hashlib

    ids, E = _load_embeddings_numpy(sf_dir)
    idx = {int(i): j for j, i in enumerate(ids)}
    corpus = {int(i): [float(x) for x in E[j]] for j, i in enumerate(ids)}
    for i in sorted(idx):
        if i % 7 == 0 and i + 1 in idx:
            corpus[i + 1_000_000] = [
                2.0 * a + b for a, b in zip(corpus[i], corpus[i + 1])
            ]

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    import math

    unit = {
        i: [x / math.sqrt(fold_dot(v, v)) for x in v] for i, v in corpus.items()
    }
    W = {i: [int(np.floor(x * (1 << 20) + 0.5)) for x in u] for i, u in unit.items()}
    order = sorted(W, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = [list(W[i]) for i in order[:k]]
    last_inertia = None
    for _ in range(8):
        am, inertia = {}, 0
        for i, w in W.items():
            best, bd = 0, None
            for c, cw in enumerate(cents):
                d = sum((a - b) ** 2 for a, b in zip(w, cw))
                if bd is None or d < bd:
                    best, bd = c, d
            am[i] = best
            inertia += bd
        new = [list(c) for c in cents]
        for c in range(k):
            members = [i for i, a in am.items() if a == c]
            n = len(members)
            if n:
                sums = [sum(W[i][d] for i in members) for d in range(64)]
                new[c] = [(2 * s + n) // (2 * n) for s in sums]
        if new == cents and last_inertia == inertia:
            break
        cents, last_inertia = new, inertia
    # final assignment under the FINAL centroids (kmeans_assign's view —
    # the in-loop `am` is one update behind when max_iters exhausts)
    am = {}
    for i, w in W.items():
        best, bd = 0, None
        for c, cw in enumerate(cents):
            d = sum((a - b) ** 2 for a, b in zip(w, cw))
            if bd is None or d < bd:
                best, bd = c, d
        am[i] = best
    # within-cluster exact pairs on ORIGINAL vectors
    pairs = []
    all_pairs = []
    items = sorted(corpus)
    for x in range(len(items)):
        for y in range(x + 1, len(items)):
            i, j = items[x], items[y]
            c = fold_dot(corpus[i], corpus[j]) / (
                math.sqrt(fold_dot(corpus[i], corpus[i]))
                * math.sqrt(fold_dot(corpus[j], corpus[j]))
            )
            if c >= threshold:
                all_pairs.append((i, j))
                if am[i] == am[j]:
                    pairs.append((i, j))
    # min-label components over within-cluster pairs
    canon = {i: i for i in corpus}
    changed = True
    while changed:
        changed = False
        for a, b in pairs:
            m = min(canon[a], canon[b])
            for v in (a, b):
                if canon[v] != m:
                    canon[v] = m
                    changed = True
    return canon, pairs, all_pairs


def test_semantic_survivors_matches_replica(spark):
    """Full differential for the SemDeDup gate: the distributed
    (normalize -> integer k-means -> within-cluster exact pairs ->
    min-label CC) pipeline must equal the pure-Python replica of the
    identical arithmetic — every (vec_id, canonical_id) row, no
    tolerance.  Also pins the honest boundary-recall trade: >= 90% of
    the exact 0.8-pairs are co-clustered at sf0.001 (measured 0.958),
    and every emitted pair is a true pair (precision exact)."""
    from distributed_graph_db_c_spark.queries.dedup import dedup_semantic_survivors

    canon, within, all_pairs = _semantic_replica(SF_DIR)
    assert len(within) / len(all_pairs) >= 0.9, (len(within), len(all_pairs))
    got = {
        r["vec_id"]: r["canonical_id"]
        for r in dedup_semantic_survivors(spark, SF_DIR).collect()
    }
    assert got == canon
    again = {
        r["vec_id"]: r["canonical_id"]
        for r in dedup_semantic_survivors(spark, SF_DIR).collect()
    }
    assert again == canon


def test_semantic_adaptive_k_operating_point():
    """The docstring's boundary-recall figures (0.958/0.889/0.794) were
    measured at k=8; this pins that the SHIPPED adaptive rule
    k = max(8, corpus_count // 256) actually floors to 8 at all three
    correctness SFs (r10 advisory: the documented operating point must
    match the code).  A testdata regeneration that grows the corpus
    past 2304 rows shifts k and re-flags the figures here."""
    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        n_emb = duckdb.sql(
            f"SELECT count(*) FROM '/root/testdata/sf{sf}/embeddings.parquet'"
        ).fetchone()[0]
        n_plants = duckdb.sql(
            f"""SELECT count(*) FROM '/root/testdata/sf{sf}/embeddings.parquet' a
                WHERE a.vec_id % 7 = 0 AND EXISTS (
                  SELECT 1 FROM '/root/testdata/sf{sf}/embeddings.parquet' b
                  WHERE b.vec_id = a.vec_id + 1)"""
        ).fetchone()[0]
        corpus = n_emb + n_plants
        assert max(8, corpus // 256) == 8, (
            f"sf{sf}: corpus {corpus} -> adaptive k "
            f"{max(8, corpus // 256)} != 8; re-measure the docstring's "
            "boundary-recall figures at the new operating point"
        )


def test_cluster_balanced_sample_matches_replica(spark):
    """Differential for the balanced-sampling composition: per cluster,
    the 32 smallest-md5 members of the replica's k-means assignment —
    counts, quotas, and exact sample checksums must match, and the
    quota must bind (min(n_candidates, 32)) with equal quotas across
    all clusters large enough."""
    import hashlib

    from distributed_graph_db_c_spark.queries.similarity import (
        sample_cluster_balanced,
    )

    cents, _summary, _fi = _python_kmeans(SF_DIR)
    ids, E = _load_embeddings_numpy(SF_DIR)
    W = np.floor(E * float(1 << 20) + 0.5).astype(np.int64)
    C = np.asarray(cents, dtype=np.int64)
    d2 = ((W[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    am = np.argmin(d2, axis=1)
    exp = {}
    for cl in np.unique(am):
        members = sorted(
            (int(i) for i in ids[am == cl]),
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )
        take = members[:32]
        exp[int(cl)] = (int((am == cl).sum()), len(take), sum(take))
    got = {
        r["cluster"]: (r["n_candidates"], r["n_sampled"], r["sample_checksum"])
        for r in sample_cluster_balanced(spark, SF_DIR).collect()
    }
    assert got == exp
    for n_cand, n_samp, _ck in got.values():
        assert n_samp == min(n_cand, 32)
