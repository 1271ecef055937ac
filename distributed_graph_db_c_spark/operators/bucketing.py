"""Bucketed (pre-shuffled) storage for co-located fact-fact joins.

The scale problem this solves: at 100 TB the lineitem<->orders join
shuffles BOTH facts on every query.  Bucketing pays that shuffle once at
write time — both tables hash-partitioned into the same number of buckets
on the join key, bucket files sorted — and every subsequent equi-join on
that key compiles to a zero-Exchange sort-merge join (Spark's bucketed
scan reports the hash distribution, so Catalyst drops both Exchange nodes
and, with sorted buckets, both Sorts).

The reference has no analogue (its whole storage layer is one adjacency
matrix per file, SURVEY.md §1.1); this is part of the §2.3 scale surface.

Verified in tests/test_bucketing.py: identical results to the plain join,
and the physical plan contains no Exchange.
"""

from __future__ import annotations

import json
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

# Sidecar file recording a bucketed table's write spec next to its data
# files (round 14, ADVICE r13 medium).  The leading underscore keeps it
# invisible to Spark's file listing (the _SUCCESS/_metadata rule), so
# scans over the directory never see it as a parquet part.  It is the
# ON-DISK half of the bucketing contract attach_bucketed's docstring
# warns about: attaching with a spec that differs from the writing spec
# mislabels bucket membership and the zero-shuffle probe joins silently
# drop pairs.  write_bucketed records the spec; ensure_attached (the
# cross-session auto-attach seam) READS it instead of trusting its
# caller's default, and attach_bucketed refuses a contradicting spec.
BUCKET_SPEC_FILE = "_BUCKET_SPEC"


def write_json_sidecar(
    spark: SparkSession, location: str, name: str, payload: dict
) -> None:
    """Publish a small JSON contract file inside a data directory,
    crash-atomically: stage under a hidden temp name, then RENAME over
    the final name — a driver death mid-write must never leave a torn
    sidecar that bricks every later read (rename is a metadata op on
    HDFS-compatible stores; the same discipline as sinks._swap_dir).
    ``name`` must start with "_" so scans never see it as data.

    Bytes on disk are RAW UTF-8 JSON (ADVICE r14: the earlier Java
    ``DataOutputStream.writeUTF`` framing capped payloads at 64 KiB of
    modified UTF-8 behind a 2-byte length prefix and made the file
    unreadable to external JSON tools); :func:`read_json_sidecar`
    still accepts the legacy framing for sidecars already on disk."""
    import uuid as _uuid

    from ..sinks import _hadoop_fs

    assert name.startswith("_"), name
    fs, jpath = _hadoop_fs(spark, location)
    final = f"{location.rstrip('/')}/{name}"
    tmp = f"{final}__tmp_{_uuid.uuid4().hex[:8]}__"
    backup = None
    try:
        out = fs.create(jpath(tmp), True)
        try:
            out.write(bytearray(json.dumps(payload).encode("utf-8")))
        finally:
            out.close()
        # rename-first: only if the destination is occupied (a
        # re-publish over an existing sidecar) move the OLD sidecar
        # aside to a hidden backup name and retry — a concurrent
        # reader that misses the final name then finds the backup
        # (read_json_sidecar checks it), so no reader ever observes
        # ABSENCE and silently falls back to caller-supplied values
        # (write_bucketed clears the directory before saveAsTable, so
        # the common path renames into an empty slot atomically)
        if not fs.rename(jpath(tmp), jpath(final)):
            backup = f"{final}__bak_{_uuid.uuid4().hex[:8]}__"
            if not fs.rename(jpath(final), jpath(backup)):
                # backup rename refused (e.g. destination vanished
                # between the two renames) — fall back to delete+retry
                backup = None
                fs.delete(jpath(final), False)
            if not fs.rename(jpath(tmp), jpath(final)):
                raise OSError(f"could not publish sidecar {final}")
        # backups are only deleted AFTER the new sidecar is live; the
        # sweep runs on EVERY successful publish (not just ones that
        # made a backup) so a stale backup from a prior crashed or
        # interrupted publish is reclaimed the next time the contract
        # is written — at this point final is authoritative again
        for st in fs.globStatus(jpath(f"{final}__bak_*__")) or []:
            fs.delete(st.getPath(), False)
    except Exception:
        # never leave the hidden temp behind (one orphan per failed
        # attempt would accumulate in the table directory forever);
        # the backup, if any, stays — it is the only readable copy
        # when the publish died between the two renames
        try:
            fs.delete(jpath(tmp), False)
        except Exception:
            pass
        raise


def read_json_sidecar(
    spark: SparkSession, location: str, name: str
) -> dict | None:
    """Read a contract sidecar published by :func:`write_json_sidecar`,
    or None if absent (legacy directory).  A PRESENT-but-unreadable
    sidecar raises a clear error naming the file: silently treating it
    as absent would reintroduce exactly the trusted-wrong-default
    corruption the sidecar exists to prevent.

    Accepts both byte formats: raw UTF-8 JSON (current) and the legacy
    Java ``writeUTF`` framing (2-byte big-endian length prefix +
    modified UTF-8) for sidecars written before round 15.  When the
    final name is mid-republish (the writer moved the old sidecar to a
    hidden ``__bak_*__`` name before installing the new one), the
    backup is read instead, so a concurrent reader never observes
    absence and silently falls back to caller-supplied values."""
    from ..sinks import _hadoop_fs

    fs, jpath = _hadoop_fs(spark, location)
    path = f"{location.rstrip('/')}/{name}"
    p = jpath(path)
    reading_backup = False
    if not fs.exists(p):
        # mid-republish window: the old sidecar lives under a backup
        # name between the writer's two renames — read it rather than
        # reporting absence (re-check final first in case the publish
        # completed and swept the backup while we globbed)
        backups = fs.globStatus(jpath(f"{path}__bak_*__")) or []
        if fs.exists(p):
            pass
        elif backups:
            p = backups[0].getPath()
            reading_backup = True
        else:
            return None
    try:
        try:
            data = _read_all(spark, fs, p)
        except Exception:
            # a backup can legitimately vanish between the glob and the
            # open (the interrupted publish completed and swept it) —
            # by then the final name is live again; only that path gets
            # a second look, a torn FINAL file still refuses below
            if not (reading_backup and fs.exists(jpath(path))):
                raise
            data = _read_all(spark, fs, jpath(path))
        try:
            return json.loads(data.decode("utf-8"))
        except (ValueError, UnicodeDecodeError):
            # legacy writeUTF framing: 2-byte big-endian length prefix,
            # then modified UTF-8 (identical to UTF-8 for the BMP JSON
            # these sidecars hold)
            if len(data) >= 2 and int.from_bytes(data[:2], "big") == len(data) - 2:
                return json.loads(data[2:].decode("utf-8"))
            raise
    except Exception as exc:
        raise ValueError(
            f"sidecar {path} exists but cannot be read/parsed "
            f"({type(exc).__name__}) — refusing to guess the recorded "
            "contract; restore it (its writer records it) or delete the "
            "file to fall back to caller-supplied values"
        ) from exc


def _read_all(spark: SparkSession, fs, p) -> bytes:
    from ..sinks import _read_stream_bytes

    inp = fs.open(p)
    try:
        return _read_stream_bytes(spark, inp)
    finally:
        inp.close()


def _write_bucket_spec(
    spark: SparkSession, location: str, keys: list[str], n_buckets: int,
    sorted_buckets: bool,
) -> None:
    write_json_sidecar(
        spark, location, BUCKET_SPEC_FILE,
        {"keys": keys, "n_buckets": n_buckets, "sorted": sorted_buckets},
    )


def read_bucket_spec(
    spark: SparkSession, table: str, location: str | None = None
) -> dict | None:
    """The recorded write spec of bucketed table ``table`` (or the
    explicit ``location``), or None for a directory written before the
    sidecar existed (legacy indexes keep the caller-supplied-spec
    behavior)."""
    if location is None:
        location = warehouse_location(spark, table.split(".")[-1])
    return read_json_sidecar(spark, location, BUCKET_SPEC_FILE)


def count_and_distinct(df: DataFrame, col: str) -> tuple[int, int]:
    """(row count, distinct count of ``col``) in ONE aggregation job
    (round 15, guide §1.2): the ``df.count()`` +
    ``df.select(col).distinct().count()`` idiom every append/stream
    validation used costs two full passes over the delta — at 100 TB two
    delta scans, locally two scheduled jobs — for numbers one partial
    aggregate produces together.  NULL semantics match
    ``distinct().count()`` exactly: ``count_distinct`` ignores NULLs, so
    a NULL-presence flag adds the one distinct row NULLs collapse to."""
    import pyspark.sql.functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(col)).alias("d"),
        F.max(F.col(col).isNull().cast("int")).alias("has_null"),
    ).head()
    return int(row["n"]), int(row["d"]) + int(row["has_null"] or 0)


def warehouse_location(spark: SparkSession, name: str) -> str:
    """The FULLY-QUALIFIED URI of warehouse entry ``name``, resolved
    through the Hadoop filesystem (ADVICE r10): composing a LOCATION
    from ``urlparse(warehouse).path`` drops the scheme/authority, so an
    object-store warehouse (s3a://bucket/wh) silently resolved to a
    defaultFS path.  ``fs.makeQualified`` preserves scheme + authority
    and normalizes scheme-less paths against defaultFS — the same
    resolve-don't-substring discipline as similarity._local_fs_path."""
    from ..sinks import _hadoop_fs

    wh = spark.conf.get("spark.sql.warehouse.dir")
    fs, jpath = _hadoop_fs(spark, wh)
    return fs.makeQualified(jpath(f"{wh.rstrip('/')}/{name}")).toString()


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    sorted_buckets: bool = True,
) -> None:
    """Persist ``df`` as a bucketed parquet table (Spark bucketing metadata
    lives in the session catalog, so this goes through ``saveAsTable``).

    The ``repartition`` on the bucket key before the write makes each task
    own whole buckets — one file per bucket instead of one file per
    (task, bucket) pair, which at 1000 executors is the difference between
    32 files and 32,000."""
    keys = [key] if isinstance(key, str) else key
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a dead session leaves the managed location behind with no catalog
    # entry (in-memory catalog, file warehouse); clear it or CREATE fails
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if warehouse.scheme in ("", "file"):
        shutil.rmtree(f"{warehouse.path}/{table.split('.')[-1]}", ignore_errors=True)
    writer = (
        df.repartition(n_buckets, *keys)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
    )
    if sorted_buckets:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)
    # record the spec on disk so a fresh session's ensure_attached can
    # recover the EXACT writing spec instead of assuming a default —
    # an attach with mismatched n_buckets mislabels bucket membership
    _write_bucket_spec(
        spark,
        warehouse_location(spark, table.split(".")[-1]),
        keys,
        n_buckets,
        sorted_buckets,
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join two tables previously written by :func:`write_bucketed`
    with the SAME key and bucket count.  Plain ``join`` — the zero-shuffle
    plan is Catalyst's doing once the bucketed scans report their
    distribution; this wrapper only documents the contract."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def attach_bucketed(
    spark: SparkSession,
    table: str,
    schema_ddl: str,
    key: str | list[str],
    n_buckets: int = 32,
    location: str | None = None,
    sorted_buckets: bool = True,
    validate_spec: bool = True,
) -> None:
    """RE-ATTACH bucketing metadata to an existing bucketed-parquet
    directory (round 7).  Spark's default in-memory catalog forgets
    every table at session end, but the FILES a bucketed write produced
    persist — including the bucket id encoded in each file name — so a
    restarted driver (the nightly incremental-dedup job) can recover
    the zero-shuffle join property by recreating the catalog entry over
    the same directory with the same CLUSTERED BY spec.  With a real
    metastore (production) this is a no-op; locally it is the
    difference between an index that survives restarts and one that
    silently does not.

    ``location`` defaults to the managed-warehouse path the original
    ``write_bucketed``/saveAsTable used.  The spec (key, n_buckets,
    sort) MUST match the writing spec — a mismatch mislabels bucket
    membership and corrupts join results, so callers should treat these
    as part of the index's on-disk contract (e.g. constants next to the
    index builder)."""
    keys = [key] if isinstance(key, str) else key
    if location is None:
        location = warehouse_location(spark, table.split(".")[-1])
    # round 14 (ADVICE r13 medium): if the directory records its write
    # spec, a contradicting attach spec is ALWAYS the corruption this
    # docstring warns about — refuse loudly instead of mislabeling
    # bucket membership (wrong keys/n_buckets: probe joins silently
    # miss pairs) or declaring SORTED BY over unsorted bucket files
    # (sort-merge joins elide the sort and drop matches).
    # ``validate_spec=False`` is for callers that ALREADY adopted the
    # recorded spec (ensure_attached) — skips a redundant sidecar read,
    # which on an object store is a network round-trip per resolved
    # index part.
    spec = read_bucket_spec(spark, table, location) if validate_spec else None
    if spec is not None and (
        list(spec["keys"]) != list(keys)
        or int(spec["n_buckets"]) != int(n_buckets)
        or bool(spec.get("sorted", True)) != bool(sorted_buckets)
    ):
        raise ValueError(
            f"attach_bucketed({table}): supplied spec (keys={keys}, "
            f"n_buckets={n_buckets}, sorted={sorted_buckets}) contradicts "
            f"the on-disk {BUCKET_SPEC_FILE} (keys={spec['keys']}, "
            f"n_buckets={spec['n_buckets']}, "
            f"sorted={spec.get('sorted', True)}) — attaching would "
            "mislabel bucket membership or declare a sort the files "
            "don't have, corrupting every co-located join; use the "
            "recorded spec"
        )
    # DROP of a MANAGED table PURGES its data directory — if this
    # session already holds the table from a write_bucketed/saveAsTable
    # (the build-then-attach-in-one-session flow), an unconditional
    # drop would destroy the files and silently re-attach over an empty
    # location (every later read returns zero rows).  A managed entry
    # already carries the bucketing metadata the attach exists to
    # recover, so attaching over it is at best redundant and at worst
    # destructive: refuse loudly.  An EXTERNAL entry (a prior attach)
    # drops safely — DROP on external removes metadata only.
    if spark.catalog.tableExists(table):
        ttype = spark.catalog.getTable(table).tableType
        if ttype != "EXTERNAL":
            raise ValueError(
                f"attach_bucketed({table}): table exists as {ttype} in "
                "this session's catalog — dropping it would purge the "
                "data directory. The managed entry already has bucketing "
                "metadata; attach is only for FRESH sessions recovering "
                "a persisted directory."
            )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    sort_clause = f"SORTED BY ({', '.join(keys)} ASC) " if sorted_buckets else ""
    spark.sql(
        f"CREATE TABLE {table} ({schema_ddl}) USING parquet "
        f"CLUSTERED BY ({', '.join(keys)}) {sort_clause}"
        f"INTO {n_buckets} BUCKETS LOCATION '{location}'"
    )


def ensure_attached(
    spark: SparkSession,
    table: str,
    schema_ddl: str,
    key: str | list[str],
    n_buckets: int = 32,
) -> None:
    """Attach ``table`` only if this session's catalog lacks it — the
    CROSS-SESSION append seam (ADVICE r12): a reader resolves its
    snapshot's segments from the ON-DISK markers, but reads the segment
    tables through the session catalog, so a segment another session
    published after this session's build/attach is visible in the
    marker listing yet absent from the catalog — the read would die on
    TABLE_OR_VIEW_NOT_FOUND until a manual re-attach.  Read paths call
    this per resolved part; the tableExists probe is catalog-metadata
    only (no data touched), and an existing entry — managed (this
    session built it) or external (a prior attach) — is left alone.

    ``n_buckets`` (and the key) are only the LEGACY fallback (round 14,
    ADVICE r13 medium): a table whose directory carries the
    ``_BUCKET_SPEC`` sidecar is attached with its RECORDED write spec,
    so an index built or appended with a non-default bucket count reads
    correctly from a fresh session instead of being auto-attached with
    a mismatched CLUSTERED BY spec (mislabeled bucket membership — the
    zero-shuffle probe joins would silently miss pairs).  Only
    directories written before the sidecar existed fall back to the
    caller's values."""
    if not spark.catalog.tableExists(table):
        spec = read_bucket_spec(spark, table)
        if spec is not None:
            # spec adopted verbatim -> skip attach's own re-read/validate
            attach_bucketed(
                spark, table, schema_ddl,
                list(spec["keys"]), int(spec["n_buckets"]),
                sorted_buckets=bool(spec.get("sorted", True)),
                validate_spec=False,
            )
        else:
            # no sidecar (read above) — skip attach's re-read too
            attach_bucketed(
                spark, table, schema_ddl, key, n_buckets, validate_spec=False
            )


# -- round 12: generation-versioned warehouse indexes ------------------------
#
# The r11 verdict's item 5: minhash_index_build / lsh_index_build rebuilds
# went through write_bucketed's DROP + overwrite of the SAME table names —
# the snapshot-less in-place-rewrite reader class the IVF index closed by
# layout at r11 (operators/similarity.py: g=NNNNNNNN directories).  Catalog
# tables can't ride a directory rename, so the same discipline lands as
# GENERATION-SUFFIXED TABLE NAMES plus an atomically-created published
# marker per generation:
#
# - a build writes brand-new tables ``<prefix>__gNNNNNNNN_<suffix>`` (never
#   touching any published generation or a legacy flat layout), then
#   publishes the generation by exclusively creating one marker file in the
#   warehouse — the single atomic commit point (claim_marker's O_EXCL
#   discipline, so racing publishers can never both claim a number);
# - readers RESOLVE once (newest published generation, an explicit pin, or
#   0 = the legacy flat layout) and bind their whole plan to that
#   generation's tables — a lazy reader overlapping a nightly rebuild keeps
#   answering from its resolved generation bit-identically, because no
#   rebuild ever writes into a published generation;
# - vacuum is the ONLY destroyer of a published generation (marker deleted
#   FIRST so no new reader can resolve a doomed generation, then tables and
#   files) — a reader still pinned to a vacuumed generation fails loudly on
#   its next scan, never silently reads a different snapshot.
#
# Generation 0 is the pre-r12 FLAT layout (``<prefix>_<suffix>``): resolved
# when no generation was ever published, and pinnable explicitly — which
# also fixes the ADVICE r11 round-trip gap (a descriptor's generation field
# must always be accepted back as a pin).

import re as _re

INDEX_GEN_FMT = "__g%08d"
_MARKER_RE = r"^_%s__g(\d{8,})__published__$"

# -- append SEGMENTS within a generation (round 12, late) --------------------
#
# The minhash index's content is purely PER-DOCUMENT (a signature depends
# only on its own text), so a delta append never needs to mutate published
# content: it lands as a brand-new pair of immutable bucketed SEGMENT
# tables (``<gen_prefix>_sNNNN_<suffix>``) plus one atomically-created
# segment marker.  Readers resolve (generation, published segments) ONCE
# and bind the whole plan to exactly those tables — an in-flight append is
# invisible until its marker lands, so appends are SNAPSHOT-ISOLATED by
# layout and readers never need an append-quiescence refusal.  (The IVF
# index adopted the same discipline later in round 12 —
# operators/similarity.py ``_ivf_segments`` — retiring what had been the
# engine's one residual isolation caveat.)  The file count a segment adds
# is identical to an in-place append's; what grows is per-read plan width
# (one co-located probe join per segment), which is the REBUILD TRIGGER's
# other half.

INDEX_SEG_FMT = "_s%04d"
# {4,}/{8,} not {4}/{8}: %04d WIDENS past 9999 (seg 10000 publishes
# "_s10000__..."), so an anchored fixed-width match would silently drop
# that segment from every snapshot while the next append dies on the
# marker O_EXCL collision — the numbers must stay visible however wide
# they print (numeric sort already handles >4 digits).
_SEG_MARKER_RE = r"^_%s__g(\d{8,})_s(\d{4,})__published__$"


def _index_seg_marker(warehouse: str, table_prefix: str, gen: int, seg: int) -> str:
    return (
        f"{warehouse.rstrip('/')}/_{table_prefix}"
        f"{INDEX_GEN_FMT % gen}{INDEX_SEG_FMT % seg}__published__"
    )


def index_seg_prefix(table_prefix: str, gen: int, seg: int) -> str:
    """The table-name prefix append segment ``seg`` of generation
    ``gen`` stores under (segment 0 is the build itself and has no
    segment tables — the base tables are ``index_gen_prefix(...)``)."""
    return f"{index_gen_prefix(table_prefix, gen)}{INDEX_SEG_FMT % seg}"


def index_segments(spark: SparkSession, table_prefix: str, gen: int) -> list[int]:
    """Published append segments of generation ``gen``, ascending —
    read from the on-disk segment markers, never the catalog, for the
    same restart-recovery reason as :func:`index_generations`."""
    from ..sinks import _hadoop_fs

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    fs, jpath = _hadoop_fs(spark, warehouse)
    if not fs.exists(jpath(warehouse)):
        return []
    pat = _re.compile(_SEG_MARKER_RE % _re.escape(table_prefix))
    out = []
    for st in fs.listStatus(jpath(warehouse)):
        m = pat.match(st.getPath().getName())
        if m and not st.isDirectory() and int(m.group(1)) == gen:
            out.append(int(m.group(2)))
    return sorted(out)


def index_publish_segment(
    spark: SparkSession, table_prefix: str, gen: int, seg: int, what: str
) -> None:
    """Publish append segment ``seg`` of generation ``gen`` with ONE
    exclusive marker create — the append's atomic commit point (the
    segment tables existed before this but no reader could resolve
    them)."""
    from ..sinks import _hadoop_fs, claim_marker

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    fs, jpath = _hadoop_fs(spark, warehouse)
    claim_marker(
        fs, jpath, _index_seg_marker(warehouse, table_prefix, gen, seg), what
    )


def _index_marker(warehouse: str, table_prefix: str, gen: int) -> str:
    return (
        f"{warehouse.rstrip('/')}/_{table_prefix}"
        f"{INDEX_GEN_FMT % gen}__published__"
    )


def index_gen_prefix(table_prefix: str, gen: int) -> str:
    """The table-name prefix generation ``gen`` of index
    ``table_prefix`` stores under; generation 0 is the legacy flat
    layout (bare prefix)."""
    if gen == 0:
        return table_prefix
    return f"{table_prefix}{INDEX_GEN_FMT % gen}"


def index_generations(spark: SparkSession, table_prefix: str) -> list[int]:
    """Published generations of warehouse index ``table_prefix``,
    ascending — read from the marker files, never the catalog (the
    in-memory catalog forgets at session end; the markers are the
    on-disk truth a restarted driver recovers from)."""
    from ..sinks import _hadoop_fs

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    fs, jpath = _hadoop_fs(spark, warehouse)
    if not fs.exists(jpath(warehouse)):
        return []
    pat = _re.compile(_MARKER_RE % _re.escape(table_prefix))
    out = []
    for st in fs.listStatus(jpath(warehouse)):
        m = pat.match(st.getPath().getName())
        if m and not st.isDirectory():
            out.append(int(m.group(1)))
    return sorted(out)


def index_resolve(
    spark: SparkSession, table_prefix: str, generation: int | None = None
) -> int:
    """The generation one index read (or attach) binds to, resolved
    ONCE per operation: the newest published generation, an explicitly
    pinned one, or 0 for a pre-generation flat-layout index.  Pinning
    0 is the EXPLICIT flat-layout pin (round-trippable from an attach
    descriptor); pinning an unpublished/vacuumed generation raises —
    never a silent fallback."""
    gens = index_generations(spark, table_prefix)
    if generation is not None:
        if generation != 0 and generation not in gens:
            raise FileNotFoundError(
                f"index_resolve({table_prefix}): generation {generation} "
                f"not published (have {gens or 'flat layout only'}) — "
                "vacuumed or never built; generation pinning is explicit,"
                " never a silent fallback"
            )
        return generation
    return gens[-1] if gens else 0


def index_publish_generation(
    spark: SparkSession, table_prefix: str, gen: int, what: str
) -> None:
    """Publish generation ``gen`` with ONE exclusive marker create —
    the atomic commit point (claim_marker's O_EXCL discipline: one
    publisher wins, a collision raises ConcurrentCommitError loudly
    with the staged tables left on disk for inspection)."""
    from ..sinks import _hadoop_fs, claim_marker

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    fs, jpath = _hadoop_fs(spark, warehouse)
    claim_marker(fs, jpath, _index_marker(warehouse, table_prefix, gen), what)


def index_vacuum_generations(
    spark: SparkSession,
    table_prefix: str,
    suffixes: tuple[str, ...],
    keep_last: int = 1,
) -> list[int]:
    """Delete all but the newest ``keep_last`` published generations of
    index ``table_prefix``; returns the removed numbers.  Marker first
    (no new reader can resolve a doomed generation), then catalog
    entries, then files — a reader already pinned to a vacuumed
    generation fails loudly on its next scan.  The legacy flat layout
    (generation 0) is never vacuumed here — it predates the marker
    discipline and owns no marker."""
    from ..sinks import _hadoop_fs

    if keep_last < 1:
        raise ValueError("index_vacuum_generations: keep_last must be >= 1")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    fs, jpath = _hadoop_fs(spark, warehouse)
    doomed = index_generations(spark, table_prefix)[:-keep_last]
    for g in doomed:
        fs.delete(jpath(_index_marker(warehouse, table_prefix, g)), False)
        # a doomed generation's append segments die with it: segment
        # markers first (same no-new-reader ordering), then each
        # segment's tables alongside the base tables below
        seg_prefixes = []
        for s in index_segments(spark, table_prefix, g):
            fs.delete(jpath(_index_seg_marker(warehouse, table_prefix, g, s)), False)
            seg_prefixes.append(index_seg_prefix(table_prefix, g, s))
        for gp in [index_gen_prefix(table_prefix, g), *seg_prefixes]:
            for suffix in suffixes:
                table = f"{gp}{suffix}"
                # a MANAGED drop purges the directory; an EXTERNAL drop
                # (a prior attach) removes metadata only — the explicit
                # file delete below covers both plus the
                # no-catalog-entry case
                if spark.catalog.tableExists(table):
                    spark.sql(f"DROP TABLE {table}")
                fs.delete(jpath(warehouse_location(spark, table)), True)
    return doomed


def index_drop_all(
    spark: SparkSession, table_prefix: str, suffixes: tuple[str, ...]
) -> None:
    """Gate/test hygiene: drop EVERY artifact of warehouse index
    ``table_prefix`` — all published generations (markers, catalog
    entries, files), any UNPUBLISHED staging tables a failed build left
    (they carry a generation-suffixed name but no marker), and the
    legacy flat layout.  Throwaway-prefix gates call this in their
    ``finally`` so a bench loop doesn't accumulate one generation of
    tables per run in the shared warehouse."""
    from ..sinks import _hadoop_fs

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    fs, jpath = _hadoop_fs(spark, warehouse)
    for g in index_generations(spark, table_prefix):
        for s in index_segments(spark, table_prefix, g):
            fs.delete(jpath(_index_seg_marker(warehouse, table_prefix, g, s)), False)
        fs.delete(jpath(_index_marker(warehouse, table_prefix, g)), False)
    # \d{8,}/\d{4,}, NOT fixed width (round 14 review): %08d/%04d widen
    # past their field width, and the module's marker regexes already
    # accept that — a fixed-width pattern here would leak segment-10000
    # tables/directories past the drop while the markers vanish
    pat = _re.compile(
        rf"^{_re.escape(table_prefix)}(__g\d{{8,}}(_s\d{{4,}})?)?"
        rf"({'|'.join(_re.escape(s) for s in suffixes)})$"
    )
    for t in spark.catalog.listTables():
        if pat.match(t.name):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    # directories with no catalog entry (a dead session's leftovers)
    if fs.exists(jpath(warehouse)):
        for st in fs.listStatus(jpath(warehouse)):
            if st.isDirectory() and pat.match(st.getPath().getName()):
                fs.delete(st.getPath(), True)
