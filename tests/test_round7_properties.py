"""Defining-property pins for the round-7 operators, in the round-6
style: hand-constructed adversarial shapes where Spark is involved, plus
REAL property-based (hypothesis) sweeps where the property is pure math
and hundreds of examples cost nothing."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# Fixed-point BM25: the integer pipeline must track float BM25
# ---------------------------------------------------------------------------

K1, B = 1.2, 0.75


def _float_bm25_term(tf: int, dl: int, n_docs: int, sum_dl: int) -> float:
    avg = sum_dl / n_docs
    k = K1 * (1 - B + B * dl / avg)
    return tf / (tf + k)


def _fixed_bm25_term_milli(tf: int, dl: int, n_docs: int, sum_dl: int) -> int:
    # mirrors text_bm25_topk's k_expr/_tfsat integer pipeline exactly
    norm_milli = 1000 - 750 + (750 * dl * n_docs) // sum_dl
    k_milli = (1200 * norm_milli) // 1000
    return (1_000_000 * tf) // (1000 * tf + k_milli)


@given(
    tf=st.integers(1, 500),
    dl=st.integers(1, 5_000),
    n_docs=st.integers(1, 100_000),
    avg_dl=st.integers(1, 5_000),
)
@settings(max_examples=300, deadline=None)
def test_fixed_point_bm25_tracks_float_within_milli_rounding(
    tf, dl, n_docs, avg_dl
):
    """The milli-scaled integer tf-saturation term must sit within the
    fixed-point resolution of the float BM25 term everywhere in the
    realistic parameter cube — i.e. the exactness trick (no ln, no
    float division) costs resolution, never correctness."""
    sum_dl = avg_dl * n_docs
    fx = _fixed_bm25_term_milli(tf, dl, n_docs, sum_dl) / 1000.0
    fl = _float_bm25_term(tf, dl, n_docs, sum_dl)
    # two integer floors (norm, tfsat) each lose < 1/1000; k_milli's
    # floor perturbs the denominator by < 1 part in 1000 of k
    assert abs(fx - fl) < 5e-3, (tf, dl, n_docs, avg_dl, fx, fl)


@given(
    dl=st.integers(1, 5_000),
    n_docs=st.integers(1, 100_000),
    avg_dl=st.integers(1, 5_000),
)
@settings(max_examples=200, deadline=None)
def test_fixed_point_bm25_saturates_monotonically(dl, n_docs, avg_dl):
    """tf-monotonicity and saturation survive the integer floors: the
    term is nondecreasing in tf and bounded by 1000 milli."""
    sum_dl = avg_dl * n_docs
    prev = -1
    for tf in (1, 2, 3, 5, 10, 50, 200, 1000):
        cur = _fixed_bm25_term_milli(tf, dl, n_docs, sum_dl)
        assert prev <= cur <= 1000
        prev = cur


# ---------------------------------------------------------------------------
# lsh_params_for: the sizing law holds wherever the caps don't bind
# ---------------------------------------------------------------------------


@given(
    n_rows=st.integers(100, 50_000_000),
    threshold=st.floats(0.3, 0.95),
)
@settings(max_examples=300, deadline=None)
def test_lsh_params_sizing_law(n_rows, threshold):
    from distributed_graph_db_c_spark.operators.similarity import (
        _MAX_MULTIPROBE,
        _MAX_PLANES,
        _MAX_TABLES,
        _RECALL_TARGET,
        lsh_params_for,
        planes_for,
    )

    n_planes, tables, q, predicted = lsh_params_for(n_rows, threshold)
    # planes follow the occupancy rule and caps
    assert n_planes == planes_for(n_rows) <= _MAX_PLANES
    assert tables <= _MAX_TABLES and q <= min(_MAX_MULTIPROBE, n_planes)
    assert 0.0 <= predicted <= 1.0
    # whenever neither cap binds, the predicted recall meets the target
    if tables < _MAX_TABLES or q < min(_MAX_MULTIPROBE, n_planes):
        if not (tables == 8 and q == 0):  # defaults may already exceed target
            assert predicted >= _RECALL_TARGET - 1e-9
    # the closed form itself: recall computed independently must agree
    r = max(1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi, 1e-9)
    per_table = (r ** n_planes) * (1.0 + q * (1.0 - r) / r)
    recall = 1.0 - (1.0 - min(per_table, 1.0)) ** tables
    assert abs(recall - predicted) < 1e-12


@given(st.integers(100, 10_000_000), st.integers(2, 9))
@settings(max_examples=200, deadline=None)
def test_lsh_planes_monotone_and_occupancy_bounded(n_rows, scale):
    """More rows never means fewer planes, and the chosen plane count
    keeps mean occupancy near the target (the linearity knob)."""
    from distributed_graph_db_c_spark.operators.similarity import (
        _MAX_PLANES,
        _TARGET_BUCKET_ROWS,
        planes_for,
    )

    p1, p2 = planes_for(n_rows), planes_for(n_rows * scale)
    assert p2 >= p1
    if p2 < _MAX_PLANES:
        # occupancy rule: 2^planes buckets hold <= target mean rows
        assert (n_rows * scale) / (1 << p2) <= _TARGET_BUCKET_ROWS * 2


# ---------------------------------------------------------------------------
# Reservoir sample: single-displacement under corpus growth (Spark)
# ---------------------------------------------------------------------------


def test_reservoir_incremental_growth_displaces_at_most_one(spark, tmp_path):
    """The bottom-k-sketch property the gate's docstring claims: adding
    ONE new document changes each stratum's sample by at most one
    member (the newcomer either misses the bottom-k or displaces
    exactly the evicted maximum).  RNG reservoirs cannot promise this;
    the hash form must."""
    from distributed_graph_db_c_spark.queries.text import (
        sample_reservoir_per_group,
    )

    rows = [(i, f"t{i}", "en" if i % 2 else "de", "s", 10) for i in range(200)]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    base = str(tmp_path / "base")
    grown = str(tmp_path / "grown")
    spark.createDataFrame(rows, schema).write.parquet(f"{base}/documents.parquet")
    spark.createDataFrame(rows + [(999, "new", "en", "s", 10)], schema).write.parquet(
        f"{grown}/documents.parquet"
    )
    s1 = {
        (r["lang"], r["doc_id"])
        for r in sample_reservoir_per_group(spark, base).collect()
    }
    s2 = {
        (r["lang"], r["doc_id"])
        for r in sample_reservoir_per_group(spark, grown).collect()
    }
    de1 = {d for l, d in s1 if l == "de"}
    de2 = {d for l, d in s2 if l == "de"}
    en1 = {d for l, d in s1 if l == "en"}
    en2 = {d for l, d in s2 if l == "en"}
    assert de1 == de2  # untouched stratum: identical sample
    assert len(en1 - en2) <= 1 and len(en2 - en1) <= 1  # one displacement max


# ---------------------------------------------------------------------------
# Quality survivors: tie-break and cluster-shape adversarial cases (Spark)
# ---------------------------------------------------------------------------


def test_survivor_election_tie_breaks_to_min_id(spark):
    """Equal n_chars inside a cluster must elect the min doc_id — pin
    the tie order on the agg itself (max_by over (n_chars, -doc_id)),
    using a constructed mapping so no LSH recall contingency applies."""
    mapping = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7)], "doc_id long, canonical_id long"
    )
    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (7, 10)], "doc_id long, n_chars long"
    )
    with_q = mapping.join(docs, "doc_id")
    survivors = {
        r["canonical_id"]: r["survivor_id"]
        for r in with_q.groupBy("canonical_id")
        .agg(
            F.max_by(
                "doc_id",
                F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("_nd")),
            ).alias("survivor_id")
        )
        .collect()
    }
    # 2 and 3 tie at 90 chars -> min id (2) wins; singleton survives itself
    assert survivors == {1: 2, 7: 7}
