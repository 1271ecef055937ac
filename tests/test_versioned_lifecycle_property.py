"""Randomized state-machine pin for the versioned table store (round
12, late — the index gauntlets' pattern applied to the storage-commit
layer they are built on): random commit/read/time-travel/vacuum
sequences over ``versioned.py`` must track a pure Python model exactly —
the on-disk version listing, every latest and pinned read's row set,
and loud failure on vacuumed or never-published pins.

This is the layer whose directory-rename atomicity the whole engine's
snapshot story leans on (sinks.replace_table, the index generations,
the IVF g= layout), so it earns the same randomized interleaving
coverage as the structures above it."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_graph_db_c_spark.versioned import (
    commit_version,
    list_versions,
    read_version,
    vacuum_versions,
)


def _frame(spark, op_idx: int, size: int):
    rows = [(op_idx * 1000 + i, f"v{op_idx}r{i}") for i in range(size)]
    return spark.createDataFrame(rows, "id long, payload string"), set(rows)


OPS = st.lists(
    st.tuples(
        st.sampled_from(["commit", "read", "vacuum"]),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=4,
    max_size=10,
)


@given(ops=OPS)
@settings(max_examples=6, deadline=None)
def test_versioned_store_tracks_model(spark, tmp_path_factory, ops):
    import shutil

    base = tmp_path_factory.mktemp("verprop")
    path = str(base / "tbl")
    model: dict[int, set] = {}
    try:
        for op_idx, (kind, k) in enumerate(ops):
            if kind == "commit":
                df, rows = _frame(spark, op_idx, k % 4 + 1)
                v = commit_version(df, path)
                assert v == (max(model) if model else 0) + 1
                model[v] = rows
            elif kind == "read":
                if not model:
                    with pytest.raises(FileNotFoundError, match="no versions"):
                        read_version(spark, path)
                    continue
                latest = {
                    tuple(r) for r in read_version(spark, path).collect()
                }
                assert latest == model[max(model)]
                pin = sorted(model)[k % len(model)]
                assert {
                    tuple(r)
                    for r in read_version(spark, path, version=pin).collect()
                } == model[pin]
                # a vacuumed-or-never pin fails loudly, never resolves
                ghost = max(model) + 5
                with pytest.raises(FileNotFoundError, match=str(ghost)):
                    read_version(spark, path, version=ghost)
            else:  # vacuum
                if not model:
                    continue
                keep = k % 2 + 1
                doomed = sorted(model)[:-keep]
                assert vacuum_versions(spark, path, keep_last=keep) == doomed
                for v in doomed:
                    del model[v]
                    with pytest.raises(FileNotFoundError):
                        read_version(spark, path, version=v)
            assert list_versions(spark, path) == sorted(model)
    finally:
        shutil.rmtree(str(base), ignore_errors=True)
