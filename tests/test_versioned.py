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
    ConcurrentCommitError,
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


def test_claimed_version_raises_before_staging(spark, tmp_path):
    """The deterministic core of the race: a standing claim marker for
    the next version (an in-flight committer) makes a second committer
    raise ConcurrentCommitError BEFORE writing any data — no staging
    dir, no partial state, published history untouched."""
    import os

    t = tmp_path / "t"
    commit_version(_df(spark, [1]), str(t))
    (t / "__claim_v00000002__").touch()  # rival committer's claim
    with pytest.raises(ConcurrentCommitError, match="claimed by another"):
        commit_version(_df(spark, [2]), str(t))
    assert list_versions(spark, str(t)) == [1]
    assert not [d for d in os.listdir(t) if d.startswith("__stage_")]
    # the rival publishes; its completed marker is swept by the next
    # commit, which claims the following number cleanly
    _df(spark, [2]).write.parquet(str(t / "v=00000002"))
    assert commit_version(_df(spark, [3]), str(t)) == 3
    assert not [d for d in os.listdir(t) if d.startswith("__claim_")and d != "__claim_v00000003__"]


def test_racing_committers_one_wins_one_raises(spark, tmp_path):
    """Two commit_version calls racing from the same version listing:
    whatever the interleaving, version numbering stays consistent (no
    version published twice, no silent loss — a loser always raises)."""
    import threading

    t = str(tmp_path / "t")
    commit_version(_df(spark, [0]), t)
    results: list[object] = [None, None]

    def go(i: int) -> None:
        try:
            results[i] = commit_version(_df(spark, [100 + i]), t)
        except ConcurrentCommitError as exc:
            results[i] = exc

    threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wins = [r for r in results if isinstance(r, int)]
    losses = [r for r in results if isinstance(r, ConcurrentCommitError)]
    assert len(wins) + len(losses) == 2 and len(wins) >= 1
    # every winner's version is published and readable; no duplicates
    assert len(set(wins)) == len(wins)
    published = list_versions(spark, t)
    for v in wins:
        assert v in published
        read_version(spark, t, v).collect()


def test_failed_staging_releases_claim_and_retry_succeeds(spark, tmp_path):
    """A staging-write failure AFTER the claim marker is created must
    release the committer's own marker: nothing was published, so a
    retry recomputes the same version number and would otherwise hit
    its own dead marker as a phantom ConcurrentCommitError forever."""
    t = str(tmp_path / "t")
    commit_version(_df(spark, [1]), t)

    @F.udf("long")
    def boom(x):
        raise RuntimeError("injected staging failure")

    bad = _df(spark, [2]).withColumn("x", boom(F.col("x")))
    with pytest.raises(Exception) as exc_info:
        commit_version(bad, t)
    # the surfaced error is the real write failure, not a claim error
    assert not isinstance(exc_info.value, ConcurrentCommitError)
    # the claim was released: the same version number commits cleanly
    assert commit_version(_df(spark, [3]), t) == 2


class _FakePath:
    def __init__(self, p):
        self.p = p


class _FakeFS:
    """Pure-python FileSystem stub for exercising _claim_marker's
    classification branches without a JVM failure injector.  Models the
    ownership-token protocol: files carry content, create returns a
    writeUTF-able stream, open a readUTF-able one.

    ``create_error_leaves_foreign``: the create raises WITHOUT touching
    the path, and a racing writer's marker lands in the same instant —
    the window the token check exists for."""

    def __init__(
        self,
        existing=(),
        create_error=None,
        fail_on_close=False,
        create_error_leaves_foreign=False,
    ):
        self.contents = {p: "pre-existing" for p in existing}
        self.create_error = create_error
        self.fail_on_close = fail_on_close
        self.create_error_leaves_foreign = create_error_leaves_foreign
        self.deleted = []

    @property
    def files(self):
        return set(self.contents)

    def exists(self, jp):
        return jp.p in self.contents

    def create(self, jp, overwrite):
        if jp.p in self.contents:
            raise OSError("FileAlreadyExistsException: " + jp.p)
        if self.create_error is not None:
            if self.create_error_leaves_foreign:
                self.contents[jp.p] = "another-writers-token"
            raise self.create_error
        self.contents[jp.p] = ""
        fs = self

        class _Out:
            def writeUTF(self, s):
                fs.contents[jp.p] = s

            def close(self):
                if fs.fail_on_close:
                    raise OSError("flush failed")

        return _Out()

    def open(self, jp):
        if jp.p not in self.contents:
            raise OSError("FileNotFoundException: " + jp.p)
        fs = self

        class _In:
            def readUTF(self):
                if fs.contents[jp.p] == "":
                    raise OSError("EOFException: truncated marker")
                return fs.contents[jp.p]

            def close(self):
                pass

        return _In()

    def delete(self, jp, recursive=False):
        self.deleted.append(jp.p)
        self.contents.pop(jp.p, None)
        return True


def test_claim_marker_preexisting_is_concurrent():
    from distributed_graph_db_c_spark.versioned import (
        ConcurrentCommitError,
        _claim_marker,
    )

    fs = _FakeFS(existing={"/t/__claim_v00000001__"})
    with pytest.raises(ConcurrentCommitError):
        _claim_marker(fs, _FakePath, "/t/__claim_v00000001__", 1)
    assert fs.deleted == []  # a foreign marker is never deleted


def test_claim_marker_own_partial_marker_released_not_mislabeled():
    """ADVICE r6: create succeeded but close() raised — the marker is
    OURS.  The failure must surface as the real IO error (not
    ConcurrentCommitError), and our marker must be deleted so the
    version is not permanently wedged."""
    from distributed_graph_db_c_spark.versioned import (
        ConcurrentCommitError,
        _claim_marker,
    )

    fs = _FakeFS(fail_on_close=True)
    with pytest.raises(OSError, match="flush failed"):
        _claim_marker(fs, _FakePath, "/t/__claim_v00000002__", 2)
    assert "/t/__claim_v00000002__" in fs.deleted
    assert "/t/__claim_v00000002__" not in fs.files


def test_claim_marker_transient_create_fault_surfaces_itself():
    from distributed_graph_db_c_spark.versioned import _claim_marker

    fs = _FakeFS(create_error=OSError("quota exceeded"))
    with pytest.raises(OSError, match="quota exceeded"):
        _claim_marker(fs, _FakePath, "/t/__claim_v00000003__", 3)


def test_claim_marker_never_deletes_foreign_marker_in_race_window(caplog):
    """ADVICE r7: our create fails transiently WITHOUT touching the
    path, and another writer's marker lands in the same window.  The
    cleanup must verify ownership via the token before deleting —
    deleting the foreign marker would release the other writer's live
    claim and break mutual exclusion."""
    from distributed_graph_db_c_spark.versioned import _claim_marker

    fs = _FakeFS(
        create_error=OSError("transient namenode fault"),
        create_error_leaves_foreign=True,
    )
    with pytest.raises(OSError, match="transient namenode fault"):
        _claim_marker(fs, _FakePath, "/t/__claim_v00000004__", 4)
    # the foreign marker survives: token mismatch forbids the delete
    assert fs.deleted == []
    assert "/t/__claim_v00000004__" in fs.files
    assert fs.contents["/t/__claim_v00000004__"] == "another-writers-token"
