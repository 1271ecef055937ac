"""Correctness gates for the hash-based dedup/similarity paths that have
no DuckDB oracle (xxhash64/LSH): they are checked against the exact
operators on the same data."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from distributed_graph_db_c_spark.operators.dedup import (
    jaccard_pairs,
    minhash_candidate_pairs,
    minhash_dedup_pairs,
    simhash64,
    simhash_candidate_pairs,
)
from distributed_graph_db_c_spark.operators.similarity import (
    ann_topk,
    brute_force_topk,
)
from distributed_graph_db_c_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def test_minhash_matches_exact_jaccard(spark, docs):
    """LSH(16x4)+verify must reproduce the exact-Jaccard pair set at 0.8:
    verification makes precision exact, so only recall is at stake — and
    at J>=0.8 the 16-band collision probability is 1-(1-0.8^4)^16 > 0.999."""
    exact = {(r["doc_a"], r["doc_b"]) for r in jaccard_pairs(docs, 0.8).collect()}
    mh = {(r["doc_a"], r["doc_b"]) for r in minhash_dedup_pairs(docs, 0.8).collect()}
    assert exact, "fixture should contain planted near-dups"
    assert mh == exact


def test_minhash_candidates_superset_of_dupes(spark, docs):
    exact = {(r["doc_a"], r["doc_b"]) for r in jaccard_pairs(docs, 0.8).collect()}
    cand = {(r["doc_a"], r["doc_b"]) for r in minhash_candidate_pairs(docs).collect()}
    assert exact <= cand


def test_simhash_deterministic_and_discriminative(spark, docs):
    """Same text -> same sketch (run twice, bit-equal); near-dup docs sit
    at smaller Hamming distance than random pairs on average."""
    h1 = {r["id"]: r["simhash"] for r in simhash64(docs).collect()}
    h2 = {r["id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert h1 == h2
    near = jaccard_pairs(docs, 0.8).collect()

    def ham(a, b):
        return bin((h1[a] ^ h1[b]) & (2**64 - 1)).count("1")

    near_d = [ham(r["doc_a"], r["doc_b"]) for r in near]
    ids = sorted(h1)[:40]
    far_d = [ham(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    assert sum(near_d) / len(near_d) < sum(far_d) / len(far_d) / 2


def test_simhash_candidate_pairs_find_neardups(spark, docs):
    """Every planted Jaccard>=0.95 near-dup pair should land within
    Hamming<=6 of each other (high-similarity docs share almost all
    tokens)."""
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             simhash_candidate_pairs(docs, max_hamming=6).collect()}
    strong = [(r["doc_a"], r["doc_b"]) for r in jaccard_pairs(docs, 0.95).collect()]
    assert strong, "fixture should contain very-near dups"
    found = sum(1 for p in strong if p in pairs)
    assert found / len(strong) >= 0.8


def test_ann_recall_vs_bruteforce(spark, embeddings):
    """Multi-table LSH top-10 should recover >=50% of the exact top-10 on
    this (unplanted, near-orthogonal) embedding set — the structural gate
    is candidates flow through buckets and scoring is exact."""
    exact = [r["vec_id"] for r in brute_force_topk(embeddings, 0, 10).collect()]
    approx = [r["vec_id"] for r in ann_topk(embeddings, 0, 64, 10).collect()]
    assert len(approx) == 10
    assert len(set(exact) & set(approx)) >= 5


def test_ivf_topk_recall(spark):
    """IVF ANN (deterministic sample quantizer, nprobe=4/16) must recover
    a majority of the exact top-10 — everything is deterministic (data,
    quantizer, tie order), so this is a fixed value, not a flaky bound
    (0.7 at sf0.001 as of round 1)."""
    from distributed_graph_db_c_spark.operators.similarity import brute_force_topk, ivf_topk
    from distributed_graph_db_c_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    ivf = {r["vec_id"] for r in ivf_topk(emb, query_id=0, top_k=10).collect()}
    bf = {r["vec_id"] for r in brute_force_topk(emb, query_id=0, top_k=10).collect()}
    assert len(ivf & bf) / 10 >= 0.5


def test_hash_sample_stable_under_repartitioning(spark, docs):
    """Membership is a function of the key alone: same sample under any
    partitioning (the property seeded RNG sampling does NOT have)."""
    from distributed_graph_db_c_spark.operators.sampling import hash_sample, hash_split

    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", "1a").collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(17, "lang"), "doc_id", "1a").collect()
    }
    assert a == b and 0 < len(a) < docs.count()
    # splits partition the corpus: every doc in exactly one split
    sp = hash_split(docs, "doc_id").groupBy("split").count().collect()
    assert sum(r["count"] for r in sp) == docs.count()
    assert {r["split"] for r in sp} == {"train", "val", "test"}


def test_hash_split_unordered_boundaries(spark):
    """Boundary dicts are evaluated in ascending hex order regardless of
    dict insertion order — an unordered caller dict must produce the same
    assignment as the canonically-ordered one."""
    from distributed_graph_db_c_spark.operators.sampling import hash_split

    docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    ordered = {"train": "cc", "val": "e6", "test": "zz"}
    shuffled = {"test": "zz", "val": "e6", "train": "cc"}
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", ordered).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", shuffled).collect()}
    assert a == b
    assert set(a.values()) == {"train", "val", "test"}


def test_ann_multiprobe_total_recall_at_gate_scale(spark, embeddings):
    """The exact _TOPK_SQL oracle on sim_ann_multiprobe_topk is valid ONLY
    while multiprobe recall is 1.0 on this corpus (the oracle is
    corpus-contingent).  Pin total recall here so a future corpus/seed/
    scale change is diagnosed as recall loss, not an oracle bug."""
    from distributed_graph_db_c_spark.operators.similarity import N_PLANES

    exact = [r["vec_id"] for r in brute_force_topk(embeddings, 0, 10).collect()]
    multi = [
        r["vec_id"]
        for r in ann_topk(embeddings, 0, 64, 10, multiprobe=N_PLANES).collect()
    ]
    assert multi == exact, "multiprobe recall < 1.0: fix recall or drop the exact oracle"


def test_ivf_total_recall_at_gate_params(spark, embeddings):
    """The exact _TOPK_SQL oracle on sim_ann_ivf_topk is valid ONLY while
    IVF at (n_cells=24, nprobe=16) has recall 1.0 on this corpus (the
    oracle is corpus-contingent; the near-orthogonal synthetic embeddings
    are IVF's worst case, hence the high probe fraction).  Exact-order
    equality doubles as the tie-order check."""
    from distributed_graph_db_c_spark.operators.similarity import ivf_topk

    exact = [r["vec_id"] for r in brute_force_topk(embeddings, 0, 10).collect()]
    ivf = [
        r["vec_id"]
        for r in ivf_topk(embeddings, query_id=0, top_k=10, n_cells=24, nprobe=16).collect()
    ]
    assert ivf == exact, "IVF recall < 1.0: retune (n_cells, nprobe) or drop the exact oracle"


def test_ann_multiprobe_improves_or_matches_recall(spark, embeddings):
    """Hamming-1 multiprobe strictly widens the candidate set per table, so
    recall vs brute force can only improve (same index, bigger broadcast
    probe list); top-k output length stays k."""
    from distributed_graph_db_c_spark.operators.similarity import N_PLANES

    exact = {r["vec_id"] for r in brute_force_topk(embeddings, 0, 10).collect()}
    base = {r["vec_id"] for r in ann_topk(embeddings, 0, 64, 10).collect()}
    multi = [
        r["vec_id"]
        for r in ann_topk(embeddings, 0, 64, 10, multiprobe=N_PLANES).collect()
    ]
    assert len(multi) == 10
    assert len(exact & set(multi)) >= len(exact & base)


def test_ann_margin_ranked_multiprobe_beats_position_order(spark, embeddings):
    """Margin-ranked probing (flip the bits whose hyperplanes the query is
    closest to) reaches TOTAL recall at multiprobe=2 on the gate corpus,
    where position-order flipping needs multiprobe=4 — each probe buys
    more recall when ranked by |margin|.  Exact-order equality vs brute
    force pins it (everything is deterministic)."""
    exact = [r["vec_id"] for r in brute_force_topk(embeddings, 0, 10).collect()]
    marg = [
        r["vec_id"]
        for r in ann_topk(
            embeddings, 0, 64, 10, multiprobe=2, margin_ranked=True
        ).collect()
    ]
    assert marg == exact


def test_simhash_banding_exact_within_pigeonhole_bound(spark, docs):
    """The 4x16-bit banding is EXACT for Hamming <= 3 (pigeonhole: 3
    differing bits cannot touch all 4 quarters, so one quarter matches and
    the pair surfaces as a candidate).  Verify against brute-force Hamming
    over all sketch pairs at gate scale — recall must be 1.0, not
    approximate."""
    from distributed_graph_db_c_spark.operators.dedup import simhash64, simhash_candidate_pairs

    sketches = {r["id"]: r["simhash"] for r in simhash64(docs).collect()}
    ids = sorted(sketches)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sketches[a] ^ sketches[b]) & (2**64 - 1)).count("1") <= 3
    }
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_candidate_pairs(docs, max_hamming=3).collect()
    }
    assert banded == brute


def test_cosine_lsh_pairs_total_recall(spark, embeddings):
    """The exact all-pairs oracle on dedup_embedding_cosine_pairs is valid
    ONLY while the multiprobe bucket self-join's candidate recall at 0.45
    is 1.0 on this corpus (corpus-contingent; this near-orthogonal corpus
    at a threshold near the random-cosine regime is LSH's worst case).
    Set equality vs the exact O(n^2) path pins it; precision is exact by
    construction (candidates are re-scored with the same fold)."""
    from distributed_graph_db_c_spark.operators.similarity import (
        N_PLANES,
        cosine_lsh_pairs,
        cosine_pairs,
    )

    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs(embeddings, 0.45).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_lsh_pairs(
            embeddings, 0.45, dim=64, multiprobe=N_PLANES
        ).collect()
    }
    assert exact, "gate corpus should contain near-dup embedding pairs"
    assert lsh == exact


def test_ann_batch_topk_matches_bruteforce_per_query(spark, embeddings):
    """The exact oracle on sim_ann_batch_topk is valid ONLY while the
    multiprobe candidate sets cover every query's exact top-3 on this
    corpus (corpus-contingent, same contract as the other ANN gates).
    Pin per-query exact-order equality vs the brute-force path."""
    from distributed_graph_db_c_spark.operators.similarity import (
        N_PLANES,
        ann_batch_topk,
    )

    queries = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = {}
    for r in ann_batch_topk(
        embeddings, queries, dim=64, top_k=3, multiprobe=N_PLANES
    ).collect():
        got.setdefault(r["qid"], []).append(r["vec_id"])
    for q in range(5):
        exact = [r["vec_id"] for r in brute_force_topk(embeddings, q, 3).collect()]
        assert got.get(q) == exact, (q, got.get(q), exact)


def test_cosine_lsh_pairs_ragged_vector_raises(spark):
    """A vector narrower than `dim` must fail LOUDLY, not be silently
    dropped by the threshold filter (ADVICE r4): the unpacked scoring
    indexes vec[0..dim) and nulls would eat the pair."""
    import pytest as _pytest
    from distributed_graph_db_c_spark.operators.similarity import cosine_lsh_pairs

    rows = [(1, [1.0] * 8), (2, [1.0] * 8), (3, [1.0] * 5)]  # id 3 ragged
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # Either our explicit width guard or ANSI array indexing fires —
    # both are loud; silence is the failure mode being pinned against.
    with _pytest.raises(Exception, match="width != 8|INVALID_ARRAY_INDEX"):
        cosine_lsh_pairs(df, 0.0, dim=8).collect()


def test_containment_catches_doc_in_doc_jaccard_misses(spark):
    """A short doc fully embedded in a long one: containment = 1.0 but
    Jaccard is far below any dedup threshold — the case the containment
    operator exists for."""
    from distributed_graph_db_c_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally unrelated text body here")],
        "doc_id long, text string",
    )
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(docs, threshold=0.9).collect()
    }
    assert cont == {(1, 2): 1.0}
    assert jaccard_pairs(docs, threshold=0.8).count() == 0


def test_containment_prefix_filter_matches_bruteforce(spark):
    """Total-recall proof for the prefix filter on random corpora: the
    prefix-filtered join must produce EXACTLY the brute-force containment
    pairs (python sets over string shingles), across thresholds."""
    import itertools
    import random

    from distributed_graph_db_c_spark.operators.dedup import containment_pairs

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    for d in range(24):
        n = rng.randint(3, 40)
        texts[d] = " ".join(rng.choice(vocab) for _ in range(n))
    # plant doc-in-doc cases
    texts[24] = texts[0] + " " + texts[1]
    texts[25] = texts[2]
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")

    def sh(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for thr in (0.7, 0.9):
        expect = {}
        for a, b in itertools.combinations(sorted(texts), 2):
            sa, sb = sh(texts[a]), sh(texts[b])
            if not sa or not sb:
                continue
            c = len(sa & sb) / min(len(sa), len(sb))
            if c >= thr:
                expect[(a, b)] = c
        got = {
            (r["doc_a"], r["doc_b"]): r["containment"]
            for r in containment_pairs(docs, threshold=thr).collect()
        }
        assert got == expect, f"thr={thr}"


def _clustered_corpus(n: int, dim: int = 32, n_clusters: int = 64):
    """Deterministic clustered corpus shaped like real embeddings: point
    i = unit(center[i % n_clusters] + 0.25 * noise_i).  Cluster-mates sit
    at cosine ~0.9; cross-cluster pairs near 0 — the regime the LSH/IVF
    recall model targets (random near-orthogonal corpora are the
    documented worst case, not the operating point)."""
    import numpy as np

    rng = np.random.default_rng(7)  # PCG64 stream is version-stable
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    noise = rng.standard_normal((n, dim))
    pts = centers[np.arange(n) % n_clusters] + 0.25 * noise / np.linalg.norm(
        noise, axis=1, keepdims=True
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pts.astype(np.float32)


def _exact_topk_ids(pts, qidx: int, k: int = 10) -> list[int]:
    import numpy as np

    cos = pts @ pts[qidx]
    cos[qidx] = -np.inf
    order = np.lexsort((np.arange(len(pts)), -cos))  # cosine desc, id asc
    return [int(i) for i in order[:k]]


@pytest.mark.parametrize("n", [512, 4096, 16384])
def test_ann_recall_sweep_clustered_corpora(spark, n):
    """MEASURED recall@10 vs corpus size (the r5-verdict #5 curve): with
    parameters auto-sized together by lsh_params_for (planes from the
    occupancy rule, probes+tables scaled to hold the model's recall),
    multiprobe batch ANN keeps mean recall@10 >= 0.9 from 512 to 16384
    vectors on a clustered corpus.  Fixed gate parameters would decay
    with n — this pins that the SIZING RULE, not a lucky constant, is
    what scales."""
    import pandas as pd

    from distributed_graph_db_c_spark.operators.similarity import (
        ann_batch_topk,
        lsh_params_for,
    )

    dim, k, n_queries = 32, 10, 10
    pts = _clustered_corpus(n, dim)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": list(map(list, pts))})
    )
    queries = spark.createDataFrame(
        pd.DataFrame(
            {"qid": range(n_queries), "qvec": list(map(list, pts[:n_queries]))}
        )
    )
    n_planes, n_tables, multiprobe, predicted = lsh_params_for(n, 0.85)
    got = (
        ann_batch_topk(
            emb, queries, dim=dim, top_k=k,
            multiprobe=multiprobe, n_planes=n_planes, n_tables=n_tables,
        )
        .groupBy("qid")
        .agg(F.collect_list("vec_id").alias("ids"))
        .collect()
    )
    by_q = {r["qid"]: set(r["ids"]) for r in got}
    recalls = [
        len(by_q.get(q, set()) & set(_exact_topk_ids(pts, q, k))) / k
        for q in range(n_queries)
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.9, (
        f"n={n}: mean recall@10 {mean_recall:.3f} < 0.9 "
        f"(params planes={n_planes} tables={n_tables} probe={multiprobe}, "
        f"model predicted {predicted:.3f})"
    )


@pytest.mark.parametrize("n", [512, 4096])
def test_ivf_recall_sweep_clustered_corpora(spark, n):
    """IVF recall@10 across corpus sizes with cells scaled to the corpus
    (n//256 floored at 16) and nprobe = half the cells — the IVF half of
    the measured recall curve."""
    import pandas as pd

    from distributed_graph_db_c_spark.operators.similarity import ivf_topk

    dim, k = 32, 10
    pts = _clustered_corpus(n, dim)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": list(map(list, pts))})
    ).cache()
    n_cells = max(16, n // 256)
    recalls = []
    for q in [0, 1, 2]:
        got = {
            r["vec_id"]
            for r in ivf_topk(
                emb, query_id=q, top_k=k, n_cells=n_cells, nprobe=n_cells // 2
            ).collect()
        }
        recalls.append(len(got & set(_exact_topk_ids(pts, q, k))) / k)
    emb.unpersist()
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.9, f"n={n}: IVF mean recall@10 {mean_recall:.3f} < 0.9"


def test_ivf_persisted_matches_in_memory_and_prunes(spark, tmp_path, embeddings):
    """The persisted-index path must (a) return exactly the in-memory
    ivf_topk result at the same operating point and (b) read the lists
    through a PARTITION-PRUNED scan (`cell IN (probes)` as a
    PartitionFilter) — reading all cells and filtering in memory would
    defeat the on-disk index."""
    from distributed_graph_db_c_spark.operators.similarity import (
        ivf_build,
        ivf_query_persisted,
        ivf_topk,
    )

    idx = str(tmp_path / "idx")
    ivf_build(embeddings, idx, n_cells=24)
    got = ivf_query_persisted(spark, idx, query_id=0, top_k=10, nprobe=16)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan[:2000]
    mem = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_topk(
            embeddings, query_id=0, top_k=10, n_cells=24, nprobe=16
        ).collect()
    ]
    per = [(r["vec_id"], round(r["cosine"], 9)) for r in got.collect()]
    assert per == mem


def test_ivf_persisted_query_vector_fetch_is_pruned_end_to_end(
    spark, tmp_path, embeddings
):
    """r6 verdict item 3: the by-id query-vector fetch must NOT scan the
    full inverted lists.  Pins (a) the id->cell sidecar resolves the id
    through a stats-prunable id-sorted read (EqualTo pushed to the
    parquet scan), (b) the vector fetch itself is a partition-pruned
    single-cell read, (c) the caller-supplied query_vec path returns the
    bit-identical result with no by-id access at all, and (d) an index
    built without the sidecar fails LOUDLY instead of silently scanning."""
    import pyspark.sql.functions as F

    from distributed_graph_db_c_spark.operators.similarity import (
        ivf_build,
        ivf_query_persisted,
        ivf_resolve,
    )

    idx = str(tmp_path / "idx")
    ivf_build(embeddings, idx, n_cells=24)
    content = ivf_resolve(spark, idx)  # the published generation directory

    # (a) the sidecar read the fetch performs: id equality reaches the scan
    ids = spark.read.parquet(f"{content}/ids").filter(F.col("vec_id") == 0)
    ids_plan = ids._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in ids_plan and "EqualTo(vec_id,0)" in ids_plan, (
        ids_plan[:2000]
    )
    cell = ids.head()["cell"]

    # (b) the single-cell vector fetch: cell is a PartitionFilter
    fetch = (
        spark.read.parquet(f"{content}/lists")
        .filter(F.col("cell") == int(cell))
        .filter(F.col("vec_id") == 0)
    )
    fetch_plan = fetch._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in fetch_plan and "cell" in fetch_plan, (
        fetch_plan[:2000]
    )

    # (c) query_vec path == query_id path, bit-identical
    by_id = [
        (r["vec_id"], r["cosine"])
        for r in ivf_query_persisted(
            spark, idx, query_id=0, top_k=10, nprobe=16
        ).collect()
    ]
    qvec = [float(x) for x in fetch.head()["embedding"]]
    by_vec = [
        (r["vec_id"], r["cosine"])
        for r in ivf_query_persisted(
            spark, idx, query_vec=qvec, query_id=0, top_k=10, nprobe=16
        ).collect()
    ]
    assert by_vec == by_id

    # (d) a pre-sidecar index raises loudly on the by-id path...
    import shutil

    shutil.rmtree(f"{content}/ids")
    with pytest.raises(Exception, match="ids|PATH_NOT_FOUND"):
        ivf_query_persisted(spark, idx, query_id=0, top_k=10, nprobe=16)
    # ...while the query_vec path still works (no by-id access at all)
    still = ivf_query_persisted(
        spark, idx, query_vec=qvec, query_id=0, top_k=10, nprobe=16
    )
    assert [(r["vec_id"], r["cosine"]) for r in still.collect()] == by_id


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_grade_pairs_total_recall(spark, sf_dir):
    """The dedup-grade gates' exact oracle is valid ONLY while the
    widened (4-bit multiprobe floor) candidate recall at threshold 0.8
    is 1.0 on the planted corpus — pinned at both driver SFs.  Planted
    pairs sit at cosine ~0.89 (mixture 2x+y), where auto-sizing alone
    realized 71/72 and a 2-bit floor still missed one pair at sf0.001;
    the measured minimal floor is 3, the gate carries 4.  Precision is exact by
    construction (candidates re-scored with the shared fold)."""
    from distributed_graph_db_c_spark.operators.similarity import (
        cosine_lsh_pairs,
        cosine_pairs,
    )
    from distributed_graph_db_c_spark.queries.dedup import (
        _GRADE_MULTIPROBE,
        _GRADE_THRESHOLD,
        _grade_corpus,
    )

    corpus = _grade_corpus(spark, sf_dir).cache()
    try:
        exact = {
            (r["id_a"], r["id_b"])
            for r in cosine_pairs(
                corpus, _GRADE_THRESHOLD, id_col="vec_id", vec_col="v"
            ).collect()
        }
        assert exact, "planted corpus produced no dedup-grade pairs"
        lsh = {
            (r["id_a"], r["id_b"])
            for r in cosine_lsh_pairs(
                corpus,
                _GRADE_THRESHOLD,
                dim=64,
                id_col="vec_id",
                vec_col="v",
                multiprobe=_GRADE_MULTIPROBE,
            ).collect()
        }
        assert lsh == exact, f"missed={sorted(exact - lsh)} extra={sorted(lsh - exact)}"
    finally:
        corpus.unpersist()


def test_grade_groups_cluster_shape(spark):
    """Dedup-grade survivorship shape: every planted mixture clusters
    with its source vector (canonical = the source id), and no base
    vector other than the sources leaves its singleton — the production
    dedup geometry the gate exists to pin."""
    from distributed_graph_db_c_spark.queries.dedup import (
        _PLANT_ID_OFFSET,
        _PLANT_STRIDE,
        dedup_embedding_groups_grade,
    )

    rows = dedup_embedding_groups_grade(spark, "/root/testdata/sf0.001").collect()
    canon = {r["vec_id"]: r["canonical_id"] for r in rows}
    planted = [v for v in canon if v >= _PLANT_ID_OFFSET]
    assert planted, "no planted vectors in the corpus"
    for v in planted:
        assert canon[v] == v - _PLANT_ID_OFFSET, (v, canon[v])
    sources = {v - _PLANT_ID_OFFSET for v in planted}
    for v, lab in canon.items():
        if v < _PLANT_ID_OFFSET and v not in sources:
            assert lab == v, f"base vector {v} unexpectedly clustered to {lab}"


def test_incremental_dedup_matches_full_batch_cross_pairs(spark):
    """Cross-snapshot incremental dedup (round 7): index the 'old'
    corpus snapshot, dedup a 'new' batch against it, and require EXACT
    set equality (ids and jaccard values) with the full-batch
    minhash_dedup_pairs over old ∪ new restricted to cross pairs — a
    signature depends only on its own text, so the decomposition must
    be exact, not approximate.  Also pins the scale contract: the
    candidate join's INDEX side reads co-located (no Exchange above
    the bucketed scan; the only Exchange hashes the delta's bkey)."""
    from distributed_graph_db_c_spark.operators.dedup import (
        incremental_dedup_pairs,
        minhash_dedup_pairs,
        minhash_index_build,
    )
    from distributed_graph_db_c_spark.sources.tables import load_table

    from distributed_graph_db_c_spark.operators.bucketing import index_drop_all

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    index_drop_all(spark, "incdedup_t", ("_bands", "_shingles"))
    minhash_index_build(old, "incdedup_t")
    inc = {
        (r["old_id"], r["new_id"]): round(r["jaccard"], 9)
        for r in incremental_dedup_pairs(new, "incdedup_t").collect()
    }
    full = minhash_dedup_pairs(docs, threshold=0.8).collect()
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    expected = {}
    for r in full:
        a, b = r["doc_a"], r["doc_b"]
        if (a in new_ids) != (b in new_ids):  # cross pairs only
            old_id, new_id = (b, a) if a in new_ids else (a, b)
            expected[(old_id, new_id)] = round(r["jaccard"], 9)
    assert inc == expected and expected, (
        f"inc={len(inc)} expected={len(expected)}"
    )
    # plan contract: no Exchange on the index side of the candidate join
    # (materialize=False: a checkpointed frame's plan is just a scan and
    # would make this pin vacuous)
    plan = (
        incremental_dedup_pairs(new, "incdedup_t", materialize=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    n_exchanges = len(re.findall(r"Exchange hashpartitioning\(bkey", plan))
    assert n_exchanges <= 1, f"index side reshuffled: {n_exchanges} bkey exchanges"


def test_incremental_dedup_reingested_id_excluded(spark):
    """Re-ingesting a document under its OWN id must not pair it with
    itself (old_id != new_id), while a byte-identical copy under a NEW
    id must surface at jaccard 1.0."""
    from distributed_graph_db_c_spark.operators.dedup import (
        incremental_dedup_pairs,
        minhash_index_build,
    )

    from distributed_graph_db_c_spark.operators.bucketing import index_drop_all

    base = [(i, " ".join(f"w{j+i}" for j in range(30))) for i in range(40)]
    old = spark.createDataFrame(base, "doc_id long, text string")
    index_drop_all(spark, "incdedup_t2", ("_bands", "_shingles"))
    minhash_index_build(old, "incdedup_t2")
    new = spark.createDataFrame(
        [(7, base[7][1]), (999, base[3][1])], "doc_id long, text string"
    )
    got = {
        (r["old_id"], r["new_id"]): r["jaccard"]
        for r in incremental_dedup_pairs(new, "incdedup_t2").collect()
    }
    assert (7, 7) not in got
    assert got.get((3, 999)) == 1.0


def test_incremental_index_build_claims_against_racing_builders(spark):
    """The index rebuild carries the sinks claim discipline: a standing
    claim marker (a crashed builder) makes a second build raise
    ConcurrentCommitError BEFORE touching either catalog table, and a
    completed build releases its claim so the next rebuild proceeds."""
    import os

    from distributed_graph_db_c_spark.operators.dedup import minhash_index_build
    from distributed_graph_db_c_spark.sinks import ConcurrentCommitError

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j+i}" for j in range(20))) for i in range(30)],
        "doc_id long, text string",
    )
    from distributed_graph_db_c_spark.operators.bucketing import (
        index_drop_all,
        index_gen_prefix,
        index_generations,
    )

    index_drop_all(spark, "incdedup_claimed", ("_bands", "_shingles"))
    gen1 = minhash_index_build(docs, "incdedup_claimed")  # claim released
    warehouse = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    marker = f"{warehouse.rstrip('/')}/_incdedup_claimed__index_build__"
    open(marker, "w").close()  # a dead builder's leftover claim
    bands1 = f"{index_gen_prefix('incdedup_claimed', gen1)}_bands"
    before = spark.table(bands1).count()
    with pytest.raises(ConcurrentCommitError, match="index_build"):
        minhash_index_build(docs, "incdedup_claimed")
    # the published generation is untouched AND nothing new published
    assert spark.table(bands1).count() == before
    assert index_generations(spark, "incdedup_claimed") == [gen1]
    os.remove(marker)
    gen2 = minhash_index_build(docs, "incdedup_claimed")  # operator cleared it
    assert gen2 == gen1 + 1  # a rebuild is a NEW generation, never in place
    index_drop_all(spark, "incdedup_claimed", ("_bands", "_shingles"))


def test_index_attach_recovers_catalog_and_bucketed_plan(spark):
    """The restarted-nightly-driver path: DROPPING the catalog entries
    (metadata loss — the in-memory catalog's behavior at session end)
    and re-attaching over the surviving files must (a) restore the
    exact incremental result and (b) keep the bucketed scan — the
    zero-index-shuffle plan — not silently degrade to a plain scan."""
    import shutil
    from urllib.parse import urlparse

    from distributed_graph_db_c_spark.operators.dedup import (
        incremental_dedup_pairs,
        minhash_index_attach,
        minhash_index_build,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j + i}" for j in range(25))) for i in range(60)],
        "doc_id long, text string",
    )
    old = docs.filter(F.col("doc_id") < 40)
    new = docs.filter(F.col("doc_id") >= 40)
    from distributed_graph_db_c_spark.operators.bucketing import (
        index_drop_all,
        index_gen_prefix,
    )

    index_drop_all(spark, "attach_idx", ("_bands", "_shingles"))
    gen = minhash_index_build(old, "attach_idx")
    gp = index_gen_prefix("attach_idx", gen)
    before = {
        (r["old_id"], r["new_id"]): round(r["jaccard"], 9)
        for r in incremental_dedup_pairs(new, "attach_idx").collect()
    }
    # simulate session loss: copy files aside, drop managed tables
    # (which purges them), restore files, re-attach metadata (the
    # published marker lives in the warehouse and survives on its own)
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (f"{gp}_bands", f"{gp}_shingles"):
        shutil.copytree(f"{warehouse}/{t}", f"{warehouse}/_keep_{t}")
        spark.sql(f"DROP TABLE {t}")
        shutil.move(f"{warehouse}/_keep_{t}", f"{warehouse}/{t}")
    assert minhash_index_attach(spark, "attach_idx") == gen
    after = {
        (r["old_id"], r["new_id"]): round(r["jaccard"], 9)
        for r in incremental_dedup_pairs(new, "attach_idx").collect()
    }
    assert after == before and before  # exact recovery, non-empty
    plan = (
        incremental_dedup_pairs(new, "attach_idx", materialize=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SelectedBucketsCount" in plan, plan[:1500]


def test_attach_refuses_managed_table_instead_of_purging(spark):
    """ADVICE r7: attach_bucketed over a table that is still MANAGED in
    this session's catalog (same-session build) must raise instead of
    DROP-purging the data directory and re-attaching over an empty
    location (which silently returned zero pairs)."""
    from distributed_graph_db_c_spark.operators.dedup import (
        incremental_dedup_pairs,
        minhash_index_attach,
        minhash_index_build,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j + i}" for j in range(25))) for i in range(40)],
        "doc_id long, text string",
    )
    from distributed_graph_db_c_spark.operators.bucketing import index_drop_all

    index_drop_all(spark, "attach_guard", ("_bands", "_shingles"))
    minhash_index_build(docs.filter(F.col("doc_id") < 30), "attach_guard")
    with pytest.raises(ValueError, match="MANAGED"):
        minhash_index_attach(spark, "attach_guard")
    # the data survived the refused attach
    new = docs.filter(F.col("doc_id") >= 30)
    assert incremental_dedup_pairs(new, "attach_guard").count() > 0


def test_failed_index_build_leaves_claim_and_blocks_builders(spark, monkeypatch):
    """ADVICE r7, amended by the round-12 generation layout: a build
    that dies between the two bucketed writes must LEAVE its claim
    marker so the next BUILDER fails loudly.  READERS, by contrast, are
    now safe by layout — the dead build's staging tables were never
    published, so a read resolves the last published generation and
    returns the exact healthy result; a rebuild after operator repair
    clears the claim and publishes the next generation."""
    import os

    from distributed_graph_db_c_spark.operators import bucketing
    from distributed_graph_db_c_spark.operators.dedup import (
        incremental_dedup_pairs,
        minhash_index_build,
    )
    from distributed_graph_db_c_spark.sinks import ConcurrentCommitError

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j + i}" for j in range(20))) for i in range(30)],
        "doc_id long, text string",
    )
    from distributed_graph_db_c_spark.operators.bucketing import index_drop_all

    old = docs.filter(F.col("doc_id") < 20)
    new = docs.filter(F.col("doc_id") >= 20)
    index_drop_all(spark, "failed_build", ("_bands", "_shingles"))
    minhash_index_build(old, "failed_build")  # healthy baseline
    baseline = {
        (r["old_id"], r["new_id"]): round(r["jaccard"], 9)
        for r in incremental_dedup_pairs(new, "failed_build").collect()
    }

    real = bucketing.write_bucketed
    calls = {"n": 0}

    def dies_on_second(df, table, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("executor lost mid-rewrite")
        return real(df, table, **kw)

    monkeypatch.setattr(bucketing, "write_bucketed", dies_on_second)
    with pytest.raises(OSError, match="executor lost"):
        minhash_index_build(old, "failed_build")
    monkeypatch.setattr(bucketing, "write_bucketed", real)

    # marker still standing: the next BUILDER refuses; the READER is
    # now SAFE (round 12) — it binds the published healthy generation,
    # which the failed rebuild never touched (its staging tables were
    # never published)
    with pytest.raises(ConcurrentCommitError):
        minhash_index_build(old, "failed_build")
    mid_crash = {
        (r["old_id"], r["new_id"]): round(r["jaccard"], 9)
        for r in incremental_dedup_pairs(new, "failed_build").collect()
    }
    assert mid_crash == baseline  # bit-identical to the healthy read
    warehouse = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    marker = f"{warehouse.rstrip('/')}/_failed_build__index_build__"
    os.remove(marker)  # operator repair
    minhash_index_build(old, "failed_build")
    assert incremental_dedup_pairs(new, "failed_build").count() >= 0
    index_drop_all(spark, "failed_build", ("_bands", "_shingles"))
