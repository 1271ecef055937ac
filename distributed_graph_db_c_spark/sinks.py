"""Layout-aware parquet sink (SURVEY.md §2.2 sinks row: the reference's
only sink is one matrix text file per graph, primary_server.c:118-128;
this is the engine's general-purpose table sink).

Layout IS the query plan at 100 TB: a table written as
partition-dirs(low-cardinality filter cols) + files sorted on the common
range/equality column gives every future scan partition pruning for free
and min/max row-group statistics tight enough to skip most files — the
poor man's z-order, no table format required.  ``maxRecordsPerFile``
bounds file size so a skewed partition ships many medium files instead of
one unsplittable giant.
"""

from __future__ import annotations

import logging
import uuid

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger(__name__)


class ConcurrentCommitError(IOError):
    """A concurrent committer claimed or published first.  The raising
    committer's data was never visible to readers; retry after the
    winner completes (versioned tables recompute the next free version
    number on retry)."""


def _local_claim_path(claim: str) -> str:
    """OS path of a claim on the local filesystem ("file:/..." URI or
    plain path)."""
    from urllib.parse import urlparse

    return urlparse(claim).path if claim.startswith("file:") else claim


def _claim_marker_local(claim: str, token: str, what: str) -> None:
    """Local-FS claim via POSIX ``O_CREAT|O_EXCL`` — genuinely atomic.

    Hadoop's ``RawLocalFileSystem.create(overwrite=false)`` is
    CHECK-THEN-ACT: two racing creators can both pass the exists check
    and both "win" the claim, after which both stage into the same
    directory and one writer's tasks die on the other's staging delete
    (observed: chmod on a vanished ``_temporary`` dir, ~1-in-4 under a
    two-thread race).  The kernel's O_EXCL is the only real arbiter the
    local FS offers.  Ownership is structural here — O_EXCL succeeding
    means the file is OURS — so the failure path may delete
    unconditionally; no token read-back is needed on this branch."""
    import os

    path = _local_claim_path(claim)
    # A claim may be the very first write into the warehouse of a fresh
    # checkout (observed: dedup_incremental_pairs as the first query of a
    # sweep, ENOENT on the marker open) — the directory is normally created
    # lazily by Spark's first managed-table write, so create it here too.
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as exc:
        raise ConcurrentCommitError(
            f"{what}: commit is claimed by another writer (marker "
            f"{claim}) — retry after it completes, or remove the "
            "marker if its writer is known dead"
        ) from exc
    try:
        os.write(fd, token.encode("utf-8"))
        os.close(fd)
    except Exception as exc:
        try:
            os.close(fd)
        except OSError:
            pass
        try:
            os.unlink(path)  # ours by O_EXCL: safe to release
        except OSError:
            log.warning(
                "%s: could not release own marker %s after failed claim",
                what, claim, exc_info=True,
            )
        exc.add_note(
            f"{what}: claim attempt failed (not a lost race); own marker "
            f"{claim} released"
        )
        raise


def claim_marker(fs, jpath_cls, claim: str, what: str) -> None:
    """Atomically claim a commit by creating ``claim`` exclusively: one
    creator wins, every other raises :class:`ConcurrentCommitError`.

    Two branches by store: on the LOCAL filesystem the claim is a POSIX
    ``O_CREAT|O_EXCL`` open (see :func:`_claim_marker_local` — Hadoop's
    local ``create(overwrite=false)`` is check-then-act and NOT a real
    arbiter); on Hadoop-compatible remote stores it is
    ``FileSystem.create(overwrite=false)``, which the namenode
    serializes atomically.

    On the remote branch, existence is checked BEFORE the create
    attempt so a later create
    failure can be classified: a marker that already existed is another
    committer's claim; one that appears only after our create raised is
    either OUR OWN partially-created marker (create succeeded,
    write/close raised) or — in the narrow window between the pre-check
    and a create that failed WITHOUT touching the path — another
    writer's brand-new live claim.  The two are distinguished by an
    OWNERSHIP TOKEN: the marker body carries a per-attempt unique
    string (writeUTF), and the failure path deletes the marker only
    after reading back its own token — deleting an unverified marker
    here would release the *other* writer's live claim and let a third
    writer in while the second is mid-commit, breaking exactly the
    mutual exclusion the marker exists for.  When ownership cannot be
    confirmed (token mismatch, or our own marker is truncated and
    unreadable) the marker is left in place and the surfaced error
    names its path — a possibly-wedged path an operator can inspect
    beats a silently broken lock.  The create remains the atomic
    arbiter; only a genuine lost race wears the ConcurrentCommitError
    label — a transient IO fault (namenode failover, permissions,
    quota) surfaces as itself.  A committer that crashes while holding
    a claim leaves its marker behind and the next writer fails LOUDLY,
    naming the marker — lost work is never silent (the same discipline
    as ``versioned.commit_version``, extended to the non-versioned
    path per the r6 verdict)."""
    token = f"{what}#{uuid.uuid4().hex}"
    try:
        scheme = fs.getUri().getScheme()
    except Exception:
        scheme = None  # test stubs exercise the generic branch
    if scheme == "file":
        _claim_marker_local(claim, token, what)
        return
    pre_existed = fs.exists(jpath_cls(claim))
    try:
        out = fs.create(jpath_cls(claim), False)
        try:
            out.writeUTF(token)
        finally:
            out.close()
    except Exception as exc:
        if pre_existed or "FileAlreadyExists" in type(
            exc
        ).__name__ or "FileAlreadyExists" in str(exc):
            raise ConcurrentCommitError(
                f"{what}: commit is claimed by another writer (marker "
                f"{claim}) — retry after it completes, or remove the "
                "marker if its writer is known dead"
            ) from exc
        # Non-race failure: release the marker ONLY if it is verifiably
        # ours (token match); otherwise leave it and name it.
        owned = False
        try:
            if fs.exists(jpath_cls(claim)):
                inp = fs.open(jpath_cls(claim))
                try:
                    owned = inp.readUTF() == token
                finally:
                    inp.close()
        except Exception:
            log.warning(
                "%s: could not verify ownership of marker %s after "
                "failed claim; leaving it in place",
                what, claim, exc_info=True,
            )
        if owned:
            try:
                fs.delete(jpath_cls(claim), False)
            except Exception:
                log.warning(
                    "%s: could not release own marker %s after failed "
                    "claim", what, claim, exc_info=True,
                )
        exc.add_note(
            f"{what}: claim attempt failed (not a lost race); marker "
            f"{claim} was {'released' if owned else 'left for inspection'}"
        )
        raise


def _commit_claim(path: str) -> str:
    """Marker path for a rewrite-commit of ``path``: a sibling file with
    a LEADING UNDERSCORE, so that when ``path`` sits inside a scanned
    directory the marker is invisible to Spark's file listing (the same
    naming rule as ``_swap_dir``'s backup)."""
    fin = path.rstrip("/")
    parent, name = fin.rsplit("/", 1)
    return f"{parent}/_{name}__commit__"


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as a parquet table partitioned by ``partition_cols``,
    each file internally sorted on ``sort_cols``.

    The repartition on the partition columns makes each task own whole
    output partitions (one writer per partition-dir, not tasks x dirs
    small files); sortWithinPartitions then orders rows inside each task
    so parquet row-group min/max stats on the sort columns are disjoint
    ranges — scans with a ``sort_cols`` predicate skip whole files."""
    out = df.repartition(*partition_cols)
    if sort_cols:
        # partition cols lead the sort: the file writer REQUIRES rows
        # ordered by partition expressions and would otherwise inject its
        # own (unstable) sort, scrambling sort_cols again
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    writer = out.write.mode("overwrite").partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


# ---------------------------------------------------------------------------
# Write-new-then-swap: the one audited rewrite-commit pattern
# ---------------------------------------------------------------------------
#
# Overwriting a parquet path with a plan that READS the same path races:
# the write job's scan tasks read source files that the overwrite commit
# is concurrently deleting (observed as a task-level FileFormatWriter
# failure).  Every in-place rewrite therefore stages to a sibling
# directory first — the staging write scans the OLD files, which nothing
# deletes — and only then swaps directories with filesystem renames.
# Rename is a metadata op on HDFS-compatible stores (and object-store
# committers map it to a copy+delete), so the swap window is rename-sized
# regardless of table size; a reader that races the swap sees the old
# table or the new one, never a mixture of files from both.  True
# multi-reader ACID needs a table format (Delta/Iceberg) — this is the
# strongest guarantee raw parquet directories admit, and it is the same
# one the reference's whole-file truncate-and-rewrite gives
# (primary_server.c:65 "w+").


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path-class) for ``path`` via the JVM Hadoop API —
    works on any Hadoop-compatible store, no driver-side os.* walking."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm.org.apache.hadoop.fs.Path


def _read_stream_bytes(spark: SparkSession, inp) -> bytes:
    """Drain a JVM input stream (FSDataInputStream) to raw Python bytes
    via Hadoop's own IOUtils copy — one JVM-side pass, no per-byte py4j
    round-trips, no assumption about framing (callers parse the bytes
    themselves; contrast readUTF, which demands Java's 2-byte-prefixed
    modified-UTF-8 layout and caps payloads at 64 KiB)."""
    jvm = spark._jvm
    bout = jvm.java.io.ByteArrayOutputStream()
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(inp, bout, 4096, False)
    return bytes(bout.toByteArray())


def _swap_dir(fs, jpath_cls, staging: str, final: str) -> None:
    """Replace directory ``final`` with ``staging``: old → trash-suffix,
    staging → final, delete old.  Each step is one rename/delete.

    The backup name carries a LEADING UNDERSCORE: Spark's file listing
    ignores ``_``/``.``-prefixed entries, so when ``final`` is a
    partition directory INSIDE a table (replace_partitions), a reader
    racing the swap can only ever see the partition absent for a
    rename-sized instant — never a mislabeled ``part=x__old__``
    partition value or a doubled row set from scanning both copies
    (which a visible sibling backup produced)."""
    fin = final.rstrip("/")
    parent, name = fin.rsplit("/", 1)
    old = f"{parent}/_{name}__old__"
    fs.delete(jpath_cls(old), True)
    if fs.exists(jpath_cls(final)):
        if not fs.rename(jpath_cls(final), jpath_cls(old)):
            raise IOError(f"rename {final} -> {old} failed")
    if not fs.rename(jpath_cls(staging), jpath_cls(final)):
        raise IOError(f"rename {staging} -> {final} failed")
    fs.delete(jpath_cls(old), True)


def replace_table(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
) -> None:
    """Full-table rewrite of the parquet table at ``path`` with ``df``,
    safe even when ``df``'s plan reads ``path`` itself (the
    compaction / CTAS-replace pattern).

    Multi-writer contract (r6 verdict item 4): the rewrite is guarded
    by an atomic claim marker — two racing ``replace_table`` writers
    can no longer interleave their stage/swap steps silently (the
    loser raises :class:`ConcurrentCommitError` before writing
    anything).  The claim is released when the commit completes or
    fails in-process; a crashed writer leaves it behind and the next
    writer fails loudly, naming the marker."""
    spark = df.sparkSession
    staging = path.rstrip("/") + "__staging__"
    fs, jpath = _hadoop_fs(spark, path)
    claim = _commit_claim(path)
    claim_marker(fs, jpath, claim, f"replace_table({path})")
    try:
        fs.delete(jpath(staging), True)
        writer = df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(staging)
        _swap_dir(fs, jpath, staging, path)
    finally:
        fs.delete(jpath(claim), False)


def replace_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Partition-level rewrite (the MERGE/upsert commit): stage ``df``
    partitioned by ``partition_cols``, then swap ONLY the partition
    directories present in the staging output — untouched partitions of
    ``path`` keep their files byte-identical (the readers-writers
    isolation the catalog relies on), and cost scales with the affected
    partitions, not the table.  Safe when ``df`` reads ``path``.

    Guarded by the same table-level atomic claim marker as
    :func:`replace_table` (one claim for the whole partition batch —
    two upsert/MERGE writers racing the same table fail loudly rather
    than interleaving partition swaps)."""
    spark = df.sparkSession
    staging = path.rstrip("/") + "__staging__"
    fs, jpath = _hadoop_fs(spark, path)
    claim = _commit_claim(path)
    claim_marker(fs, jpath, claim, f"replace_partitions({path})")
    try:
        fs.delete(jpath(staging), True)
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(staging)

        # Enumerate staged leaf partition dirs level by level (k=v names);
        # listing is bounded by the affected-partition count.
        rels = [""]
        for _ in partition_cols:
            nxt = []
            for rel in rels:
                base = staging if not rel else f"{staging}/{rel}"
                for st in fs.listStatus(jpath(base)):
                    name = st.getPath().getName()
                    if st.isDirectory() and "=" in name:
                        nxt.append(name if not rel else f"{rel}/{name}")
            rels = nxt
        for rel in rels:
            parent = jpath(f"{path}/{rel}").getParent()
            fs.mkdirs(parent)
            _swap_dir(fs, jpath, f"{staging}/{rel}", f"{path}/{rel}")
        fs.delete(jpath(staging), True)
    finally:
        fs.delete(jpath(claim), False)
