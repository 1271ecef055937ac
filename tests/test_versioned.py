"""Versioned-table layer (versioned.py): commit / time travel / vacuum.

The properties that make it a lake layer rather than a directory pile:
published versions are immutable, version numbering is monotone, reads
are explicit (no silent fallback), a commit may read the previous
version without racing, and vacuum destroys exactly the old tail.
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from distributed_graph_db_c_spark.versioned import (
    commit_version,
    list_versions,
    read_version,
    vacuum_versions,
)


def _df(spark, vals):
    return spark.createDataFrame([(i,) for i in vals], "x long")


def test_commit_read_roundtrip_and_monotone_numbering(spark, tmp_path):
    t = str(tmp_path / "t")
    assert commit_version(_df(spark, [1, 2]), t) == 1
    assert commit_version(_df(spark, [3]), t) == 2
    assert list_versions(spark, t) == [1, 2]
    assert sorted(r["x"] for r in read_version(spark, t, 1).collect()) == [1, 2]
    assert sorted(r["x"] for r in read_version(spark, t).collect()) == [3]


def test_old_version_immutable_after_later_commits(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_version(_df(spark, [10, 20]), t)
    v1 = read_version(spark, t, 1)  # lazy plan over v1's files
    commit_version(_df(spark, [99]), t)
    commit_version(_df(spark, [7]), t)
    # the lazy v1 read still sees exactly v1's rows — files untouched
    assert sorted(r["x"] for r in v1.collect()) == [10, 20]


def test_commit_may_read_previous_version(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_version(_df(spark, [1, 2, 3]), t)
    nxt = read_version(spark, t, 1).withColumn("x", F.col("x") * 10)
    assert commit_version(nxt, t) == 2
    assert sorted(r["x"] for r in read_version(spark, t, 2).collect()) == [10, 20, 30]


def test_vacuum_removes_exactly_old_tail(spark, tmp_path):
    t = str(tmp_path / "t")
    for i in range(4):
        commit_version(_df(spark, [i]), t)
    assert vacuum_versions(spark, t, keep_last=2) == [1, 2]
    assert list_versions(spark, t) == [3, 4]
    with pytest.raises(FileNotFoundError, match="version 1"):
        read_version(spark, t, 1)
    assert [r["x"] for r in read_version(spark, t).collect()] == [3]
    with pytest.raises(ValueError):
        vacuum_versions(spark, t, keep_last=0)


def test_read_missing_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_version(spark, str(tmp_path / "nope"))
