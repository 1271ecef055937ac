"""Versioned parquet tables: time travel + vacuum on plain directories.

The reference's modify (op 2) is a destructive whole-file truncate-and-
rewrite (`primary_server.c:65` "w+") — a reader can never ask for the
pre-modify graph.  A lake pipeline wants the opposite: every commit is a
new immutable snapshot, reads default to the latest but can time-travel,
and storage is reclaimed explicitly (vacuum), never implicitly.  Table
formats (Delta/Iceberg) do this with a transaction log; this layer gives
the raw-parquet equivalent with directory-rename atomicity — the same
commit primitive `sinks.replace_table` uses, here applied per version:

    path/v=00000001/...parquet     (immutable once published)
    path/v=00000002/...parquet

A version is PUBLISHED by renaming its fully-written staging directory to
`v=NNNNNNNN` — one metadata op, so readers enumerate either without the
new version or with all of it, never a partial directory.  Version
numbers are monotonically increasing; the latest = max(listed).  Old
versions stay byte-identical forever (readers-writers isolation for
free), until `vacuum` deletes all but the newest ``keep_last``.

Scale: listing cost is O(versions) directory entries, not O(files);
every read is an ordinary pruned parquet scan of ONE version directory;
vacuum is O(removed versions) recursive deletes.  Nothing here touches
the driver filesystem API — all IO goes through the Hadoop FileSystem,
so any HDFS-compatible store works.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession

from .sinks import ConcurrentCommitError, _hadoop_fs, claim_marker

_FMT = "v=%08d"
_CLAIM_FMT = "__claim_v%08d__"

log = logging.getLogger(__name__)


def _discard_staging(fs, jpath, staging: str) -> None:
    """Best-effort staging cleanup; a silent false from fs.delete would
    orphan the __stage__ dir invisibly, so log it loudly instead."""
    try:
        if not fs.delete(jpath(staging), True):
            log.warning("commit_version: staging cleanup left orphan %s", staging)
    except Exception:
        log.warning("commit_version: staging cleanup raised for %s", staging, exc_info=True)


# ConcurrentCommitError is defined in sinks.py (shared with the
# non-versioned replace_table/replace_partitions commit path, which
# adopted the same claim discipline in round 7) and re-exported here —
# this module remains its historical import site.


def _claim_marker(fs, jpath, claim: str, version: int) -> None:
    """Atomically claim ``version`` via the shared
    :func:`sinks.claim_marker` O_EXCL discipline (see its docstring for
    the classification contract — ADVICE r6: a self-created marker
    whose close() raised is released, not mislabeled as a lost race)."""
    claim_marker(fs, jpath, claim, f"commit_version (version {version})")


def _version_dirs(spark: SparkSession, path: str) -> list[int]:
    fs, jpath = _hadoop_fs(spark, path)
    if not fs.exists(jpath(path)):
        return []
    out = []
    for st in fs.listStatus(jpath(path)):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(out)


def list_versions(spark: SparkSession, path: str) -> list[int]:
    """All published version numbers, ascending."""
    return _version_dirs(spark, path)


def commit_version(df: DataFrame, path: str) -> int:
    """Publish ``df`` as the next version of the table at ``path``;
    returns the new version number.  The snapshot is written to a staging
    directory and published by ONE rename, so a concurrent reader's
    listing either includes the complete version or not at all.  Safe
    when ``df``'s plan reads an older version of the same table (staging
    never deletes anything).

    Multi-writer contract: the version number is CLAIMED atomically
    before any data is written — ``FileSystem.create(path,
    overwrite=false)`` on a per-version marker file has O_EXCL
    semantics (one creator wins, every other raises), so two racing
    committers can never both believe they published the same version:
    the loser raises :class:`ConcurrentCommitError` up front, with no
    staged data written at all.  Hadoop's rename does not fail onto an
    existing directory (it nests the source inside it), so the publish
    is additionally guarded by an exists-check before and a nest-audit
    after the rename — belt for marker-deleted-by-hand scenarios.  A
    committer that crashes between claim and publish leaves its marker
    behind; the claim error names the marker so an operator (or a
    cleanup sweep) can remove it after verifying no committer is live —
    lost work is always LOUD, never silent.

    Markers of already-published versions are swept opportunistically at
    the start of the next commit, so steady-state leaves one live marker
    per in-flight commit, not one per version forever."""
    import uuid as _uuid

    spark = df.sparkSession
    fs, jpath = _hadoop_fs(spark, path)
    fs.mkdirs(jpath(path))
    version = (_version_dirs(spark, path) or [0])[-1] + 1
    # sweep markers whose commit completed (version dir exists) or whose
    # version is older than the current head (published then vacuumed —
    # numbering never reuses them, so the marker can only be an orphan)
    for st in fs.listStatus(jpath(path)):
        name = st.getPath().getName()
        if name.startswith("__claim_v") and name.endswith("__"):
            try:
                v = int(name[len("__claim_v"):-2])
            except ValueError:
                continue
            if v < version or fs.exists(jpath(f"{path.rstrip('/')}/{_FMT % v}")):
                fs.delete(st.getPath(), False)
    claim = f"{path.rstrip('/')}/{_CLAIM_FMT % version}"
    _claim_marker(fs, jpath, claim, version)
    staging = f"{path.rstrip('/')}/__stage_{version}_{_uuid.uuid4().hex[:8]}__"
    try:
        df.write.mode("overwrite").parquet(staging)
    except Exception:
        # The staging write failed AFTER we claimed the version.  Our own
        # marker must not outlive the attempt: nothing was published, so
        # a retry recomputes the SAME version number and would find the
        # dead marker and raise ConcurrentCommitError forever.  Release
        # the claim, then surface the real failure.
        fs.delete(jpath(claim), False)
        _discard_staging(fs, jpath, staging)
        raise
    final = f"{path.rstrip('/')}/{_FMT % version}"
    if fs.exists(jpath(final)) or not fs.rename(jpath(staging), jpath(final)):
        _discard_staging(fs, jpath, staging)
        raise ConcurrentCommitError(
            f"commit_version: version {version} already published "
            f"(concurrent committer won) — staged data discarded, retry"
        )
    # post-rename audit: if a racer published between the exists-check and
    # our rename, our dir was nested INSIDE theirs — detect and fail loudly
    nested = f"{final}/{staging.rsplit('/', 1)[1]}"
    if fs.exists(jpath(nested)):
        fs.delete(jpath(nested), True)
        raise ConcurrentCommitError(
            f"commit_version: lost publish race for version {version} — "
            "staged data discarded, retry"
        )
    return version


def read_version(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """The table at ``version`` (latest when None).  Raises if the
    version was vacuumed or never existed — time travel is explicit,
    never a silent fallback to a different snapshot."""
    versions = _version_dirs(spark, path)
    if not versions:
        raise FileNotFoundError(f"no versions at {path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(
            f"version {version} not present at {path} (have {versions})"
        )
    return spark.read.parquet(f"{path.rstrip('/')}/{_FMT % version}")


def vacuum_versions(spark: SparkSession, path: str, keep_last: int) -> list[int]:
    """Delete all but the newest ``keep_last`` versions; returns the
    removed version numbers.  Storage reclamation is the ONLY operation
    that destroys a published snapshot, and it never touches the newest
    one (keep_last >= 1 enforced)."""
    if keep_last < 1:
        raise ValueError("vacuum_versions: keep_last must be >= 1")
    fs, jpath = _hadoop_fs(spark, path)
    versions = _version_dirs(spark, path)
    doomed = versions[:-keep_last]
    for v in doomed:
        fs.delete(jpath(f"{path.rstrip('/')}/{_FMT % v}"), True)
    return doomed
