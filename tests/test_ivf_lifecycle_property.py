"""Randomized state-machine pin for the IVF index lifecycle (round 12,
late — the minhash gauntlet's twin for the third index, covering the
segment-append rework end to end): random interleavings of bootstrap
build / segment append / retrain-swap / vacuum / fresh+pinned queries
must track a pure Python model exactly — on-disk generation and segment
listings, the attach descriptor, and every query's strong-match set.

No recall contingency exists here by construction: queries probe ALL
cells (nprobe = n_cells), so the IVF answer is exactly brute force over
the resolved snapshot, and the vector families are near-orthogonal
(within-family cosine ~1, cross-family ~0) so "the strong matches" is
an exact set, not a ranking judgment.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F  # noqa: F401  (parity with sibling gauntlet)
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_graph_db_c_spark.operators.similarity import (
    _ivf_generations,
    _ivf_segments,
    ivf_append,
    ivf_build,
    ivf_compact,
    ivf_index_attach,
    ivf_query_persisted,
    ivf_resolve,
    ivf_retrain_swap,
    ivf_vacuum_generations,
)

DIM = 32
N_FAM = 10
N_CELLS = 6


def _vec(fam: int, member: int) -> list[float]:
    v = np.zeros(DIM)
    v[fam] = 1.0
    v[N_FAM + (fam + member) % (DIM - N_FAM)] = 0.02 * (member + 1)
    return [float(x) for x in v]


def _vectors(spark, ids: list[int]):
    rows = [(i, _vec(i % 100, i // 100)) for i in ids]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _strong(spark, path: str, fam: int, **pins) -> set[int]:
    """ids answering family ``fam``'s probe at cosine > 0.5 — with
    probe-all this is exactly the indexed members of the family."""
    rows = ivf_query_persisted(
        spark, path, query_vec=_vec(fam, 7), top_k=50, nprobe=N_CELLS, **pins
    ).collect()
    return {r["vec_id"] for r in rows if r["cosine"] > 0.5}


OPS = st.lists(
    st.tuples(
        st.sampled_from(["append", "retrain", "vacuum", "query", "compact"]),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=3,
    max_size=7,
)


@given(ops=OPS)
@settings(max_examples=5, deadline=None)
def test_ivf_lifecycle_tracks_model(spark, ops):
    from distributed_graph_db_c_spark.streaming.sources import cleanup, scratch_dir

    s = scratch_dir("ivflcprop")
    path = f"{s}/idx"
    gens: dict[int, list[set[int]]] = {}
    try:
        base_ids = list(range(N_FAM))
        assert ivf_build(_vectors(spark, base_ids), path, n_cells=N_CELLS) == 1
        gens[1] = [set(base_ids)]
        for kind, k in ops:
            newest = max(gens)
            if kind == "append":
                used = set().union(*gens[newest])
                pool = [100 + f for f in range(N_FAM) if 100 + f not in used]
                ids = pool[: (k % 3 + 1)]
                if not ids:
                    continue
                audit = ivf_append(spark, path, _vectors(spark, ids))
                assert (audit["segment"], audit["n_segments"]) == (
                    len(gens[newest]),
                    len(gens[newest]),
                )
                gens[newest].append(set(ids))
            elif kind == "retrain":
                corpus = sorted(set().union(*gens[newest]))
                extra = [
                    200 + f for f in range(N_FAM) if 200 + f not in corpus
                ][: k % 3]
                g = ivf_retrain_swap(
                    spark, path, _vectors(spark, corpus + extra),
                    n_cells=N_CELLS,
                )
                assert g == newest + 1
                gens[g] = [set(corpus + extra)]
            elif kind == "compact":
                # round 13: fold segments into g=N+1's base under the
                # frozen quantizer — a pure union in the model
                if len(gens[newest]) < 2:
                    with pytest.raises(ValueError):
                        ivf_compact(spark, path)
                    continue
                audit = ivf_compact(spark, path)
                assert audit["generation"] == newest + 1
                assert audit["compacted_segments"] == list(
                    range(1, len(gens[newest]))
                )
                gens[newest + 1] = [set().union(*gens[newest])]
            elif kind == "vacuum":
                if len(gens) < 2:
                    continue
                doomed = sorted(gens)[:-1]
                assert ivf_vacuum_generations(spark, path, keep_last=1) == doomed
                for g in doomed:
                    del gens[g]
            else:  # query
                fam = k % N_FAM
                want = {
                    d
                    for d in set().union(*gens[max(gens)])
                    if d % 100 == fam
                }
                assert _strong(spark, path, fam) == want
                # random surviving pin: (generation, segment horizon)
                g = sorted(gens)[k % len(gens)]
                seg = k % len(gens[g])
                want_pin = {
                    d
                    for d in set().union(*gens[g][: seg + 1])
                    if d % 100 == fam
                }
                assert (
                    _strong(
                        spark, path, fam, generation=g, as_of_segment=seg
                    )
                    == want_pin
                ), f"pin (g={g}, s<={seg}) diverged"
            # disk state tracks the model after EVERY op
            assert _ivf_generations(spark, path) == sorted(gens)
            for g in gens:
                content = ivf_resolve(spark, path, generation=g)
                assert _ivf_segments(spark, content) == list(
                    range(1, len(gens[g]))
                )
            desc = ivf_index_attach(spark, path)
            assert desc["generation"] == max(gens)
            assert desc["segments"] == list(range(1, len(gens[max(gens)])))
            assert desc["total_rows"] == len(set().union(*gens[max(gens)]))
    finally:
        cleanup(s)
