"""Dedup queries over ``documents`` (SURVEY.md §2.3).

``dedup_exact``, ``dedup_jaccard_pairs`` and ``dedup_minhash_pairs`` have
full DuckDB oracles (minhash's is the exact-Jaccard SQL — same output
contract, pytest-pinned total recall on the gate corpus).  SimHash uses
xxhash64 (not reproducible in DuckDB) so it registers rows-only; its
correctness gate is tests/test_dedup_similarity.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_dedup_pairs,
    simhash64,
)
from ..registry import register
from ..sources.tables import load_table
from .similarity import _PAIRS_SQL as _EMBED_PAIRS_SQL
from .text import _TOKS_SQL

_EXACT_SQL = """
SELECT md5(text) AS fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


@register("dedup_exact", oracle=_EXACT_SQL)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content fingerprint, deterministic
    min-id survivor.  One shuffle on the fingerprint."""
    docs = load_table(spark, sf_dir, "documents").withColumn("fp", F.md5("text"))
    return exact_dedup(docs, ["fp"], "doc_id")


_EXACT_KEYS_SQL = """
SELECT lang, source, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY lang, source
"""


@register("dedup_exact_by_keys", oracle=_EXACT_KEYS_SQL)
def dedup_exact_by_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, ["lang", "source"], "doc_id")


_JACCARD_SQL = rf"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct(list_transform(generate_series(0, len(t)-3),
                                                     i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
                   ELSE [] END AS s
       FROM toks),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
sizes AS (SELECT doc_id, len(s) AS n FROM sh)
SELECT doc_a, doc_b,
       CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.8
"""


@register("dedup_jaccard_pairs", oracle=_JACCARD_SQL)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3-gram Jaccard near-dup join at threshold 0.8 — the oracle
    semantics; minhash_dedup_pairs is the 100 TB path for the same output."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs, threshold=0.8)


@register("dedup_minhash_pairs", oracle=_JACCARD_SQL)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16x4) candidates verified by exact Jaccard >= 0.8.
    Same output contract as dedup_jaccard_pairs, so the exact-Jaccard SQL
    is its oracle too: LSH candidate recall at >= 0.8 is total on this
    corpus (pytest-pinned) and the verification jaccard is computed over
    hashed shingle sets whose sizes equal the string-shingle sets absent a
    64-bit collision — the outputs are bit-identical, fully hash-checked.

    CORPUS-CONTINGENT ORACLE: valid only while LSH recall at J>=0.8 is 1.0
    on this corpus (pinned by test_minhash_matches_exact_jaccard); a
    corpus/seed/scale change that turns this gate red is LSH recall loss,
    not an oracle bug — diagnose with the pytest pin."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup_pairs(docs, threshold=0.8)


_INCREMENTAL_SQL = rf"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct(list_transform(generate_series(0, len(t)-3),
                                                     i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
                   ELSE [] END AS s
       FROM toks),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
j AS (SELECT doc_a, doc_b,
             CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
      FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.8)
SELECT CASE WHEN doc_a % 4 = 0 THEN doc_b ELSE doc_a END AS old_id,
       CASE WHEN doc_a % 4 = 0 THEN doc_a ELSE doc_b END AS new_id,
       jaccard
FROM j
WHERE (doc_a % 4 = 0) <> (doc_b % 4 = 0)
"""


@register("dedup_incremental_pairs", oracle=_INCREMENTAL_SQL)
def dedup_incremental_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental dedup (round 8 — the banked round-7
    candidate): the corpus's doc_id%4!=0 rows play the indexed 100 TB
    snapshot (minhash_index_build: bucketed band + shingle stores), the
    %4==0 rows play tonight's delta batch; incremental_dedup_pairs then
    finds every cross pair at Jaccard >= 0.8 shuffling only the delta.
    The oracle is the full-batch exact-Jaccard SQL restricted to cross
    pairs — the pytest pin (test_incremental_dedup_matches_full_batch
    _cross_pairs) states the decomposition exactness this relies on,
    and the minhash gates' corpus-contingent total-recall argument
    carries over unchanged (same signatures, same banding).  Round 12:
    the index is GENERATION-VERSIONED (bucketing.index_gen_prefix —
    the build publishes g=1 and the read resolves it from the on-disk
    marker, never a bare table name), giving the r11 verdict's item-5
    rework its driver evidence.  Unique table prefix + a finally
    index_drop_all keeps the gate re-runnable without accumulating one
    generation per bench loop."""
    import uuid as _uuid

    from ..operators.bucketing import index_drop_all
    from ..operators.dedup import incremental_dedup_pairs, minhash_index_build

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    prefix = f"incgate_{_uuid.uuid4().hex[:8]}"
    try:
        minhash_index_build(old, prefix)
        result = incremental_dedup_pairs(new, prefix, threshold=0.8)
    finally:
        index_drop_all(spark, prefix, ("_bands", "_shingles"))
        # a failed build leaves its claim marker by design (durable
        # indexes must fail loudly until repaired) — but THIS prefix is
        # a random throwaway, so an orphaned marker would just litter
        # the shared warehouse forever (round-9 advisory): drop it too
        from ..operators.dedup import _index_claim
        from ..sinks import _hadoop_fs

        fs, jpath = _hadoop_fs(spark, spark.conf.get("spark.sql.warehouse.dir"))
        fs.delete(jpath(_index_claim(spark.conf.get("spark.sql.warehouse.dir"), prefix)), False)
    return result


_TIME_TRAVEL_SQL = rf"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct(list_transform(generate_series(0, len(t)-3),
                                                     i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
                   ELSE [] END AS s
       FROM toks),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
j AS (SELECT doc_a, doc_b,
             CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
      FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.8),
cross1 AS (SELECT CASE WHEN doc_a % 4 = 0 THEN doc_b ELSE doc_a END AS old_id,
                  CASE WHEN doc_a % 4 = 0 THEN doc_a ELSE doc_b END AS new_id,
                  jaccard
           FROM j
           WHERE (doc_a % 4 = 0) <> (doc_b % 4 = 0))
SELECT CAST(1 AS BIGINT) AS generation, old_id, new_id, jaccard FROM cross1
UNION ALL
SELECT CAST(2 AS BIGINT) AS generation, old_id, new_id, jaccard
FROM cross1 WHERE old_id % 4 IN (2, 3)
"""


@register("dedup_index_time_travel", oracle=_TIME_TRAVEL_SQL)
def dedup_index_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINHASH-INDEX TIME TRAVEL (round 12, registered after the window
    filled — AWAITING_FIRST_SLOT, an r13 driver slot): the
    sim_ivf_time_travel pattern applied to the text-dedup index, now
    that it carries the same generation layout.  The nightly story:
    generation 1 indexes the corpus snapshot (doc_id %4 != 0);
    overnight the %4 == 1 documents are DELETED and the rebuild
    publishes generation 2 over the survivors (%4 in (2,3)); tonight's
    delta batch (%4 == 0) is then screened against BOTH generations in
    one plan — the pinned read (generation=1) answering the
    pre-deletion question ("what would we have matched last night?")
    and the fresh resolve answering today's.  One row per (generation,
    cross pair) at Jaccard >= 0.8.

    The oracle replays BOTH constructions: the exact-Jaccard cross
    pairs vs the full snapshot labeled generation 1, and its restriction
    to the surviving old side labeled generation 2 — a strict
    hash-match proves the rebuild's publish left generation 1 answering
    its exact original construction (no rebuild bleed-through) AND that
    the fresh resolve binds the survivors only.  Same corpus-contingent
    total-recall contingency as dedup_incremental_pairs (signatures
    depend only on a document's own text, so subsetting the indexed
    side cannot lose recall).  Scale: each query leg shuffles only the
    delta's slim (id, bkey) rows into the pinned generation's bucketed
    layout — time travel costs storage, never query shape (the
    sim_ivf_time_travel argument, measured there at 1.4x for 10x).
    Lifecycle invariants raise RuntimeError (the engine's loud-failure
    convention — python -O strips asserts)."""
    import uuid as _uuid

    from ..operators.bucketing import index_drop_all
    from ..operators.dedup import incremental_dedup_pairs, minhash_index_build

    docs = load_table(spark, sf_dir, "documents")
    snapshot = docs.filter(F.col("doc_id") % 4 != 0)
    survivors = docs.filter((F.col("doc_id") % 4).isin([2, 3]))
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    prefix = f"ttgate_{_uuid.uuid4().hex[:8]}"
    try:
        # ONE full-corpus shingling/signing pass shared by BOTH builds
        # and the screens (round 15, guide §1.2): snapshot (3/4 of the
        # corpus), survivors (2/4) and batch (1/4) overlap, so building
        # each from its own pass shingled 1.5 corpus-equivalents; hs/sig
        # are per-document, so filtering one checkpointed full pass is
        # bit-identical and touches each document once.
        from ..operators.dedup import minhash_signatures, shingle_hash_sets

        hs_all = shingle_hash_sets(docs).localCheckpoint(eager=True)
        sig_all = minhash_signatures(docs, hs_df=hs_all).localCheckpoint(
            eager=True
        )

        def _sub(cond):
            return dict(
                hs_df=hs_all.filter(cond), sig_df=sig_all.filter(cond)
            )

        g1 = minhash_index_build(
            snapshot, prefix, **_sub(F.col("id") % 4 != 0)
        )
        g2 = minhash_index_build(
            survivors, prefix, **_sub((F.col("id") % 4).isin([2, 3]))
        )
        if (g1, g2) != (1, 2):
            raise RuntimeError(f"expected generations (1, 2), got ({g1}, {g2})")
        share = _sub(F.col("id") % 4 == 0)
        pinned = incremental_dedup_pairs(
            batch, prefix, threshold=0.8, generation=1, **share
        ).select(F.lit(1).cast("long").alias("generation"), "old_id", "new_id", "jaccard")
        fresh = incremental_dedup_pairs(batch, prefix, threshold=0.8, **share).select(
            F.lit(2).cast("long").alias("generation"), "old_id", "new_id", "jaccard"
        )
        result = pinned.unionByName(fresh).localCheckpoint(eager=True)
    finally:
        index_drop_all(spark, prefix, ("_bands", "_shingles"))
        from ..operators.dedup import _index_claim
        from ..sinks import _hadoop_fs

        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = _hadoop_fs(spark, warehouse)
        fs.delete(jpath(_index_claim(warehouse, prefix)), False)
    return result


_INDEX_APPEND_SQL = rf"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct(list_transform(generate_series(0, len(t)-3),
                                                     i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
                   ELSE [] END AS s
       FROM toks),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
j AS (SELECT doc_a, doc_b,
             CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
      FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.8),
cross1 AS (SELECT CASE WHEN doc_a % 4 = 0 THEN doc_b ELSE doc_a END AS old_id,
                  CASE WHEN doc_a % 4 = 0 THEN doc_a ELSE doc_b END AS new_id,
                  jaccard
           FROM j
           WHERE (doc_a % 4 = 0) <> (doc_b % 4 = 0))
SELECT 'base' AS phase, old_id, new_id, jaccard FROM cross1 WHERE old_id % 4 IN (1, 2)
UNION ALL
SELECT 'appended' AS phase, old_id, new_id, jaccard FROM cross1
"""


@register("dedup_index_append", oracle=_INDEX_APPEND_SQL)
def dedup_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINHASH-INDEX APPEND lifecycle (round 12, registered after the
    window filled — AWAITING_FIRST_SLOT, an r13 driver slot; the banked
    handoff candidate e): grow the persisted text-dedup index at DELTA
    cost instead of a full-corpus rebuild.  The nightly story: the
    corpus snapshot (doc_id %4 in (1, 2)) is indexed as generation 1;
    the next day's crawl (%4 == 3) lands via minhash_index_append as
    the generation's first immutable append SEGMENT (only the delta is
    shingled/signed — the base is never re-read); tonight's batch
    (%4 == 0) is then screened twice in one plan: pinned to the
    pre-append snapshot (as_of_segment=0, phase 'base') and against
    the appended index (fresh resolve, phase 'appended').  One row per
    (phase, cross pair) at Jaccard >= 0.8.

    The oracle replays both constructions exactly (cross pairs with the
    old side restricted to %4 in (1,2), then unrestricted): a strict
    hash-match proves (a) base ∪ segment indexes exactly what one build
    over the union would — signatures are per-document, so the
    decomposition is exact, and (b) the segment pin answers the
    pre-append construction bit-identically — appends are
    snapshot-isolated by layout (segments publish via one O_EXCL
    marker; readers resolve (generation, segments) once).  Same
    corpus-contingent total-recall contingency as
    dedup_incremental_pairs.  Scale: the append shingles only the
    delta; each query leg shuffles only the batch's slim (id, bkey)
    rows, once per part, against co-located bucketed scans.  Lifecycle
    invariants raise RuntimeError (loud-failure convention)."""
    import uuid as _uuid

    from ..operators.bucketing import index_drop_all
    from ..operators.dedup import (
        incremental_dedup_pairs,
        minhash_index_append,
        minhash_index_build,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter((F.col("doc_id") % 4).isin([1, 2]))
    delta = docs.filter(F.col("doc_id") % 4 == 3)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    prefix = f"apgate_{_uuid.uuid4().hex[:8]}"
    try:
        g = minhash_index_build(base, prefix)
        audit = minhash_index_append(delta, prefix)
        if (g, audit["generation"], audit["segment"]) != (1, 1, 1):
            raise RuntimeError(
                f"expected build gen 1 + segment 1, got ({g}, "
                f"{audit['generation']}, {audit['segment']})"
            )
        # ONE shingling/signing pass for every screen of the same batch
        # (round 13: the operators' hs_df/sig_df sharing parameters)
        from ..operators.dedup import minhash_signatures, shingle_hash_sets

        hs = shingle_hash_sets(batch).localCheckpoint(eager=True)
        sig = minhash_signatures(batch, hs_df=hs).localCheckpoint(eager=True)
        share = dict(hs_df=hs, sig_df=sig)
        pinned = incremental_dedup_pairs(
            batch, prefix, threshold=0.8, as_of_segment=0, **share
        ).select(F.lit("base").alias("phase"), "old_id", "new_id", "jaccard")
        fresh = incremental_dedup_pairs(batch, prefix, threshold=0.8, **share).select(
            F.lit("appended").alias("phase"), "old_id", "new_id", "jaccard"
        )
        result = pinned.unionByName(fresh).localCheckpoint(eager=True)
    finally:
        index_drop_all(spark, prefix, ("_bands", "_shingles"))
        from ..operators.dedup import _index_claim
        from ..sinks import _hadoop_fs

        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = _hadoop_fs(spark, warehouse)
        fs.delete(jpath(_index_claim(warehouse, prefix)), False)
    return result


_INDEX_VACUUM_SQL = rf"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct(list_transform(generate_series(0, len(t)-3),
                                                     i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
                   ELSE [] END AS s
       FROM toks),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
j AS (SELECT doc_a, doc_b,
             CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
      FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.8),
cross1 AS (SELECT CASE WHEN doc_a % 4 = 0 THEN doc_b ELSE doc_a END AS old_id,
                  CASE WHEN doc_a % 4 = 0 THEN doc_a ELSE doc_b END AS new_id,
                  jaccard
           FROM j
           WHERE (doc_a % 4 = 0) <> (doc_b % 4 = 0))
SELECT CAST(2 AS BIGINT) AS surviving_generation,
       CAST(1 AS BIGINT) AS removed_generation,
       old_id, new_id, jaccard
FROM cross1 WHERE old_id % 4 IN (2, 3)
"""


@register("dedup_index_vacuum", oracle=_INDEX_VACUUM_SQL)
def dedup_index_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINHASH-INDEX VACUUM lifecycle (round 12, late —
    AWAITING_FIRST_SLOT, an r13 driver slot; the banked handoff
    candidate d, previously pytest-pinned only): retention enforcement
    on the months-lived index.  The story completes the other lifecycle
    gates': generation 1 indexes the snapshot (base %4 in (1, 2) PLUS
    the %4 == 3 rows landed as an append SEGMENT — so the vacuum
    provably destroys segments with their generation, not just base
    tables); the rebuild publishes generation 2 over the survivors
    (%4 in (2, 3)); vacuum keep_last=1 then removes generation 1 —
    marker first, segment markers with it.  The gate enforces, loudly:
    vacuum returned exactly [1]; a generation-1 pinned read now raises
    (never silently re-resolves — the only-destroyer contract); and
    returns tonight's batch (%4 == 0) screened against the surviving
    generation, labeled with (surviving_generation, removed_generation).

    The oracle replays the SURVIVING construction only — a strict
    hash-match proves the vacuum destroyed generation 1 without
    touching what generation 2 answers.  Same corpus-contingent
    total-recall contingency as dedup_incremental_pairs.  Scale:
    vacuum is O(markers + file deletes) of the doomed generations;
    the surviving read's shape is unchanged (delta-only shuffles).
    Lifecycle invariants raise RuntimeError (loud-failure convention)."""
    import uuid as _uuid

    from ..operators.bucketing import index_drop_all
    from ..operators.dedup import (
        incremental_dedup_pairs,
        minhash_index_append,
        minhash_index_build,
        minhash_index_vacuum,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter((F.col("doc_id") % 4).isin([1, 2]))
    seg = docs.filter(F.col("doc_id") % 4 == 3)
    survivors = docs.filter((F.col("doc_id") % 4).isin([2, 3]))
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    prefix = f"vacgate_{_uuid.uuid4().hex[:8]}"
    try:
        # ONE full-corpus shingling/signing pass shared by the builds,
        # the append, and the final screen (round 15, guide §1.2): the
        # base/segment/survivor subsets overlap (%4==2 is indexed twice),
        # so per-phase passes shingled 1.5 corpus-equivalents; hs/sig
        # are per-document, filtering one checkpointed pass is identical.
        from ..operators.dedup import minhash_signatures, shingle_hash_sets

        hs_all = shingle_hash_sets(docs).localCheckpoint(eager=True)
        sig_all = minhash_signatures(docs, hs_df=hs_all).localCheckpoint(
            eager=True
        )

        def _sub(cond):
            return dict(
                hs_df=hs_all.filter(cond), sig_df=sig_all.filter(cond)
            )

        g1 = minhash_index_build(
            base, prefix, **_sub((F.col("id") % 4).isin([1, 2]))
        )
        audit = minhash_index_append(
            seg, prefix, **_sub(F.col("id") % 4 == 3)
        )
        g2 = minhash_index_build(
            survivors, prefix, **_sub((F.col("id") % 4).isin([2, 3]))
        )
        if (g1, audit["segment"], g2) != (1, 1, 2):
            raise RuntimeError(
                f"expected lifecycle (g1, seg 1, g2), got "
                f"({g1}, {audit['segment']}, {g2})"
            )
        removed = minhash_index_vacuum(spark, prefix, keep_last=1)
        if removed != [1]:
            raise RuntimeError(f"vacuum removed {removed}, expected [1]")
        try:
            incremental_dedup_pairs(batch, prefix, threshold=0.8, generation=1)
        except FileNotFoundError:
            pass  # the only-destroyer contract: pinned readers fail loudly
        else:
            raise RuntimeError(
                "generation 1 still resolvable after vacuum — the pin "
                "must raise, never silently re-resolve"
            )
        result = (
            incremental_dedup_pairs(
                batch, prefix, threshold=0.8, **_sub(F.col("id") % 4 == 0)
            )
            .select(
                F.lit(2).cast("long").alias("surviving_generation"),
                F.lit(1).cast("long").alias("removed_generation"),
                "old_id",
                "new_id",
                "jaccard",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        index_drop_all(spark, prefix, ("_bands", "_shingles"))
        from ..operators.dedup import _index_claim
        from ..sinks import _hadoop_fs

        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = _hadoop_fs(spark, warehouse)
        fs.delete(jpath(_index_claim(warehouse, prefix)), False)
    return result


_INDEX_COMPACT_SQL = rf"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct(list_transform(generate_series(0, len(t)-3),
                                                     i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
                   ELSE [] END AS s
       FROM toks),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
j AS (SELECT doc_a, doc_b,
             CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
      FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.8),
cross1 AS (SELECT CASE WHEN doc_a % 4 = 0 THEN doc_b ELSE doc_a END AS old_id,
                  CASE WHEN doc_a % 4 = 0 THEN doc_a ELSE doc_b END AS new_id,
                  jaccard
           FROM j
           WHERE (doc_a % 4 = 0) <> (doc_b % 4 = 0))
SELECT 'pre' AS phase, old_id, new_id, jaccard FROM cross1 WHERE old_id % 4 IN (1, 2)
UNION ALL
SELECT 'wide' AS phase, old_id, new_id, jaccard FROM cross1
UNION ALL
SELECT 'compacted' AS phase, old_id, new_id, jaccard FROM cross1
"""


@register("dedup_index_compact", oracle=_INDEX_COMPACT_SQL)
def dedup_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINHASH-INDEX SEGMENT COMPACTION lifecycle (round 13 — the r12
    verdict's item 5): fold a generation's append segments back into
    one base WITHOUT re-shingling the corpus, so the segment-count arm
    of the retrain trigger (per-read plan width) is serviced at
    union-rewrite cost instead of a full rebuild.  The story: the base
    snapshot (%4 in (1, 2)) is generation 1; the delta (%4 == 3) lands
    as its append segment; minhash_index_compact publishes generation 2
    as the pure union.  Tonight's batch (%4 == 0) is screened three
    ways in one plan: pinned to the PRE-append snapshot
    (generation=1, as_of_segment=0 — phase 'pre'), pinned to the WIDE
    post-append layout (generation=1 — phase 'wide'), and against the
    fresh resolve, now the COMPACTED generation (phase 'compacted').

    The oracle replays all three constructions from raw text; a strict
    hash-match proves (a) compaction is EXACT — the compacted
    generation answers bit-identically to the wide one (signatures are
    per-document, so union-of-tables == build-of-union, the same
    decomposition argument as the append gate), and (b) the source
    generation still answers BOTH its snapshots after the publish —
    compaction destroys nothing (vacuum is the only destroyer).  Gate
    enforces loudly: compact returned generation 2 folding segment
    [1], and the new generation's status shows zero segments with the
    trigger reset (a minhash index has no frozen sizing to outgrow).
    Scale: the compaction cost is one IO-bound shuffle of the
    generation's two slim tables — the shingling/signing the index
    exists to amortize is never re-paid.  Same corpus-contingent
    total-recall contingency as dedup_incremental_pairs."""
    import uuid as _uuid

    from ..operators.bucketing import index_drop_all
    from ..operators.dedup import (
        incremental_dedup_pairs,
        minhash_index_append,
        minhash_index_build,
        minhash_index_compact,
        minhash_index_status,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter((F.col("doc_id") % 4).isin([1, 2]))
    delta = docs.filter(F.col("doc_id") % 4 == 3)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    prefix = f"cpgate_{_uuid.uuid4().hex[:8]}"
    try:
        g = minhash_index_build(base, prefix)
        audit = minhash_index_append(delta, prefix)
        caudit = minhash_index_compact(spark, prefix)
        if (g, audit["segment"], caudit["generation"]) != (1, 1, 2) or caudit[
            "compacted_segments"
        ] != [1]:
            raise RuntimeError(
                f"expected build gen 1 + segment 1 + compact gen 2 of [1], "
                f"got ({g}, {audit['segment']}, {caudit})"
            )
        st = minhash_index_status(spark, prefix)
        if st["segments"] or st["retrain_due"]:
            raise RuntimeError(
                f"compacted generation must reset the trigger, got {st}"
            )
        # ONE shingling/signing pass for every screen of the same batch
        # (round 13: the operators' hs_df/sig_df sharing parameters)
        from ..operators.dedup import minhash_signatures, shingle_hash_sets

        hs = shingle_hash_sets(batch).localCheckpoint(eager=True)
        sig = minhash_signatures(batch, hs_df=hs).localCheckpoint(eager=True)
        share = dict(hs_df=hs, sig_df=sig)
        pre = incremental_dedup_pairs(
            batch, prefix, threshold=0.8, generation=1, as_of_segment=0, **share
        ).select(F.lit("pre").alias("phase"), "old_id", "new_id", "jaccard")
        wide = incremental_dedup_pairs(
            batch, prefix, threshold=0.8, generation=1, **share
        ).select(F.lit("wide").alias("phase"), "old_id", "new_id", "jaccard")
        compacted = incremental_dedup_pairs(
            batch, prefix, threshold=0.8, **share
        ).select(
            F.lit("compacted").alias("phase"), "old_id", "new_id", "jaccard"
        )
        result = pre.unionByName(wide).unionByName(compacted).localCheckpoint(
            eager=True
        )
    finally:
        index_drop_all(spark, prefix, ("_bands", "_shingles"))
        from ..operators.dedup import _index_claim
        from ..sinks import _hadoop_fs

        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = _hadoop_fs(spark, warehouse)
        fs.delete(jpath(_index_claim(warehouse, prefix)), False)
    return result


@register("dedup_simhash", oracle=None)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash sketch per document (rows-only check; Hamming-pair
    behavior tested in pytest)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash64(docs)


_SPLIT_SQL = """
WITH b AS (SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bk
           FROM documents)
SELECT CASE WHEN bk < 'cc' THEN 'train' WHEN bk < 'e6' THEN 'val' ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM b GROUP BY 1, 2
"""


@register("sample_deterministic_split", oracle=_SPLIT_SQL)
def sample_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~80/10/10 train/val/test split by content-hash bucket
    (operators/sampling.py): membership is a pure function of doc_id —
    stable under repartitioning, engines, and incremental loads, unlike
    seeded RNG sampling.  The oracle recomputes the identical md5-prefix
    assignment; the id checksum proves the exact row sets, not just
    counts."""
    from ..operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("doc_id").alias("id_checksum"))
    )


@register("dedup_embedding_cosine_pairs", oracle=_EMBED_PAIRS_SQL)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine >= 0.45) through the
    LSH-bucketed pairs path — the scale twin of ``sim_cosine_pairs``
    (which stays the all-pairs oracle form), completing the dedup-mode
    set: exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.

    Bucket self-equijoin with Hamming-1 multiprobe widening generates
    candidates; each candidate is scored with the same left-fold cosine
    as the exact path, so precision is exact and the output contract is
    identical.

    CORPUS-CONTINGENT ORACLE: the exact all-pairs oracle is valid only
    while multiprobe candidate recall at 0.45 is 1.0 on this corpus
    (pinned by test_cosine_lsh_pairs_total_recall); near-orthogonal
    random vectors at a threshold near the random-cosine regime are
    LSH's worst case — a corpus/threshold change that flips this gate
    red is candidate-recall loss, not an oracle bug."""
    from ..operators.similarity import N_PLANES, cosine_lsh_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_lsh_pairs(emb, threshold=0.45, dim=64, multiprobe=N_PLANES)


_GROUPS_SQL = rf"""
WITH RECURSIVE toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct(list_transform(generate_series(0, len(t)-3),
                                                     i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
                   ELSE [] END AS s
       FROM toks),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
ipairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
           FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
jpairs AS (SELECT doc_a, doc_b
           FROM ipairs
           JOIN sizes sa ON sa.doc_id = doc_a
           JOIN sizes sb ON sb.doc_id = doc_b
           WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.8),
edges AS (SELECT doc_a AS a, doc_b AS b FROM jpairs
          UNION ALL SELECT doc_b, doc_a FROM jpairs),
reach(doc, lab) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.a, r.lab FROM reach r JOIN edges e ON e.b = r.doc
)
SELECT doc AS doc_id, MIN(lab) AS canonical_id FROM reach GROUP BY doc
"""


@register("dedup_minhash_groups", oracle=_GROUPS_SQL)
def dedup_minhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup SURVIVORSHIP: every document mapped to the canonical (min
    doc_id) member of its near-dup cluster — the step a corpus dedup
    actually ships (pairs -> transitive clusters -> one survivor each;
    singletons map to themselves).

    Spark side composes two scale paths already gated separately: the
    MinHash+LSH near-dup pair join (one slim shuffle, bucketed candidates)
    feeds min-label connected components over the pair graph (the
    cogrouped union-find kernel via auto dispatch — near-dup clusters are
    tiny by construction even when the corpus is not).  The oracle
    recomputes the same fixpoint as a recursive CTE over the exact-Jaccard
    pair graph; both reduce to min-reachable-id, so the mapping is
    hash-exact while LSH recall stays total (see dedup_minhash_pairs'
    corpus-contingency note — same contract)."""
    from ..operators.traversal import pairs_to_canonical

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, threshold=0.8)
    return pairs_to_canonical(pairs, docs, ("doc_a", "doc_b"), "doc_id")


_STRAT_SQL = """
WITH b AS (SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bk
           FROM documents),
kept AS (SELECT * FROM b
         WHERE bk < CASE lang WHEN 'en' THEN 'cc' WHEN 'de' THEN '80'
                              WHEN 'fr' THEN '80' WHEN 'es' THEN '40'
                              WHEN 'zh' THEN '40' ELSE '00' END)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM kept GROUP BY lang
"""


@register("sample_stratified_mix", oracle=_STRAT_SQL)
def sample_stratified_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing / rebalancing sample (round 4): each language keeps a
    DIFFERENT deterministic fraction (en ~80%, de/fr ~50%, es/zh ~25%) via
    per-stratum md5-bucket thresholds — the upsampling/downsampling step
    that sets a training mix, with hash-membership stability under
    repartitioning and incremental loads.  Pure map-side filter (the
    threshold CASE folds into the scan); id checksums pin exact row
    sets per stratum."""
    from ..operators.sampling import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_hash_sample(
        docs,
        "doc_id",
        "lang",
        {"en": "cc", "de": "80", "fr": "80", "es": "40", "zh": "40"},
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("doc_id").alias("id_checksum")
    )


_CONTAIN_SQL = rf"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct(list_transform(generate_series(0, len(t)-3),
                                                     i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
                   ELSE [] END AS s
       FROM toks),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
sizes AS (SELECT doc_id, len(s) AS n FROM sh)
SELECT doc_a, doc_b,
       CAST(inter AS DOUBLE) / CAST(LEAST(sa.n, sb.n) AS DOUBLE) AS containment
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE) / CAST(LEAST(sa.n, sb.n) AS DOUBLE) >= 0.9
"""


@register("dedup_containment_pairs", oracle=_CONTAIN_SQL)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram CONTAINMENT near-dup join (round 5,
    operators/dedup.containment_pairs): pairs where the smaller doc's
    3-gram shingle set is >= 90% contained in the larger's — the
    doc-in-doc duplication (quotes, boilerplate wrappers) Jaccard's
    union-normalized score misses.  Same shingle-equijoin candidate plan
    as dedup_jaccard_pairs; only the normalizer differs (min size, not
    union size)."""
    from ..operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, threshold=0.9)


_SUBSTR_SQL = rf"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 20
                   THEN list_distinct(list_transform(generate_series(0, len(t)-20),
                        i -> list_aggregate(t[i+1:i+20], 'string_agg', ' ')))
                   ELSE [] END AS s
       FROM toks),
ex AS (SELECT doc_id, unnest(s) AS w FROM sh),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 COUNT(*) AS n_shared_windows
          FROM ex a JOIN ex b ON a.w = b.w AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
sizes AS (SELECT doc_id, len(s) AS n FROM sh)
SELECT doc_a, doc_b, n_shared_windows,
       CAST((1000 * n_shared_windows) // LEAST(sa.n, sb.n) AS BIGINT) AS frac_milli
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
"""


@register("dedup_substring_windows", oracle=_SUBSTR_SQL)
def dedup_substring_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 20-token substring duplication pairs (round 5,
    operators/dedup.substring_dup_pairs) — the Lee-et-al exact-substring
    dedup criterion: any two docs sharing a verbatim 20-token run, with
    the shared-window count and the permille of the smaller doc's
    windows duplicated.  Spark joins hashed windows (|hashed set| ==
    |string set| absent a 64-bit collision — the minhash gates' standing
    argument); the oracle joins the literal window STRINGS, so the two
    sides share nothing."""
    from ..operators.dedup import substring_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    return substring_dup_pairs(docs, k=20)


# -- round 6: embedding near-dup survivorship ------------------------------

def _embed_groups_sql() -> str:
    from .similarity import dot_sql

    return f"""
WITH RECURSIVE agg AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {dot_sql('a.embedding', 'b.embedding')} AS dot,
           {dot_sql('a.embedding', 'a.embedding')} AS na,
           {dot_sql('b.embedding', 'b.embedding')} AS nb
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
),
jp AS (SELECT id_a, id_b FROM agg WHERE dot / (sqrt(na) * sqrt(nb)) >= 0.45),
edges AS (SELECT id_a AS a, id_b AS b FROM jp UNION ALL SELECT id_b, id_a FROM jp),
reach(v, lab) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT e.a, r.lab FROM reach r JOIN edges e ON e.b = r.v
)
SELECT v AS vec_id, MIN(lab) AS canonical_id FROM reach GROUP BY v
"""


@register("dedup_embedding_groups", oracle=_embed_groups_sql())
def dedup_embedding_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup SURVIVORSHIP (round 6): every vector mapped to
    the canonical (min vec_id) member of its cosine>=0.45 cluster — the
    embedding-space twin of dedup_minhash_groups, completing the
    pairs->clusters->survivor story for BOTH text and vector
    near-duplicate modes.  Composes two separately-gated scale paths:
    the LSH-bucketed cosine pair join feeds min-label connected
    components (cogrouped union-find via auto dispatch; near-dup
    clusters stay tiny even when the corpus is not).

    CORPUS-CONTINGENT ORACLE: exact while multiprobe candidate recall
    at 0.45 is total on this corpus — the same contract (and the same
    pytest pin) as dedup_embedding_cosine_pairs; the oracle recomputes
    the fixpoint as a recursive CTE over the exact all-pairs graph."""
    from ..operators.similarity import N_PLANES, cosine_lsh_pairs
    from ..operators.traversal import pairs_to_canonical

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_lsh_pairs(emb, threshold=0.45, dim=64, multiprobe=N_PLANES)
    return pairs_to_canonical(pairs, emb, ("id_a", "id_b"), "vec_id")


# -- round 7: the dedup-grade embedding operating point --------------------
#
# The 0.45 gates above are the RECALL STRESS TEST: near-orthogonal random
# vectors at a threshold near the random-cosine regime are LSH's worst
# case, and holding recall there fundamentally costs n^(1+rho) (the
# measured 9.4x at 10x data, BENCH_SF1.md).  A production near-dup pass
# runs at a dedup-grade threshold (>= 0.8), where the same auto-sizing
# runs ~2.6x at 10x data — these gates pin THAT operating point
# (r6 verdict item 2), so both ends of the recall/cost curve carry
# driver hash evidence.
#
# The test corpora have NO natural pairs above cosine ~0.51 (verified at
# sf0.001 and sf0.01), so a plain threshold-0.8 gate would be vacuously
# 0-row.  Instead the gate plants near-duplicates DETERMINISTICALLY and
# identically on both sides: for every vec_id divisible by 7, a mixture
# vector 2*x + y (y = the next vector) joins the corpus under
# vec_id + 1_000_000.  cos(x, 2x+y) ~ 2/sqrt(5) ~ 0.89 for
# near-orthogonal equal-norm x, y — above threshold with margin, below
# exact-duplicate triviality — while cos(y, 2x+y) ~ 0.45 stays far
# under 0.8.  All arithmetic is double-precision with the same
# operation order in both engines (2*a_i + b_i, then the shared
# left-fold dot), so the constructed corpora are bit-identical.

_PLANT_STRIDE = 7
_PLANT_ID_OFFSET = 1_000_000
_GRADE_THRESHOLD = 0.8
# Multiprobe floor feeding lsh_params_for (same widening idiom as the 0.45
# gates, which probe N_PLANES=4 bits): auto-sizing alone predicts ~0.95
# recall at the threshold and realized 71/72 pairs at sf0.01; measured
# minimal total-recall floor on both driver corpora is 3 bits (2 still
# missed the (0, 1000000) pair at sf0.001), so the gate probes 4 — one
# step of margin, same setting as the 0.45 gates.
_GRADE_MULTIPROBE = 4

_GRADE_CORPUS_SQL = f"""
base AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
planted AS (
    SELECT a.vec_id + {_PLANT_ID_OFFSET} AS vec_id,
           list_transform(generate_series(1, len(a.v)),
                          i -> 2 * a.v[i] + b.v[i]) AS v
    FROM base a JOIN base b ON b.vec_id = a.vec_id + 1
    WHERE a.vec_id % {_PLANT_STRIDE} = 0
),
corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
"""


def _grade_pairs_sql() -> str:
    from .similarity import dot_sql

    return f"""
WITH {_GRADE_CORPUS_SQL},
agg AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {dot_sql('a.v', 'b.v')} AS dot,
           {dot_sql('a.v', 'a.v')} AS na,
           {dot_sql('b.v', 'b.v')} AS nb
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, dot / (sqrt(na) * sqrt(nb)) AS cosine
FROM agg WHERE dot / (sqrt(na) * sqrt(nb)) >= {_GRADE_THRESHOLD}
"""


def _grade_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planted-near-dup corpus, Spark side — bit-identical to the
    oracle's ``corpus`` CTE (same double casts, same 2*a+b order)."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a = base.filter(F.col("vec_id") % _PLANT_STRIDE == 0).select(
        F.col("vec_id").alias("_aid"), F.col("v").alias("_av")
    )
    b = base.select((F.col("vec_id") - 1).alias("_aid"), F.col("v").alias("_bv"))
    planted = a.join(b, "_aid").select(
        (F.col("_aid") + _PLANT_ID_OFFSET).alias("vec_id"),
        F.zip_with(
            "_av", "_bv", lambda x, y: F.lit(2.0) * x + y
        ).alias("v"),
    )
    return base.unionByName(planted)


@register("dedup_embedding_pairs_grade", oracle=_grade_pairs_sql())
def dedup_embedding_pairs_grade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs at the DEDUP-GRADE operating point
    (threshold 0.8, auto-sized LSH) over the planted-near-dup corpus —
    the production twin of dedup_embedding_cosine_pairs' recall stress
    test; see the module comment for the planting construction.

    The LSH parameters are the honest auto-sizing (lsh_params_for at
    threshold 0.8): at this threshold the recall target is reached well
    inside the table/probe caps, which is exactly the cost argument the
    10x run measured (2.6x vs 9.4x at threshold 0.45); the gate adds a
    4-bit multiprobe floor on top (the same widening idiom as the 0.45
    gates) so candidate recall is total on the gate corpus.

    CORPUS-CONTINGENT ORACLE: exact while widened candidate recall at
    0.8 is total on this corpus (pinned by
    test_grade_pairs_total_recall; realized 72/72 at sf0.01)."""
    from ..operators.similarity import cosine_lsh_pairs

    # Round 16: a shared-corpus materialization was A/B-tested here
    # (lazy vs localCheckpoint vs persist, interleaved min-of-3) and
    # LEFT LAZY — the plant join is cheap relative to the LSH work, a
    # localCheckpoint's stats-less LogicalRDD flips the rescore
    # broadcast joins to sort-merge (measured 2x on the groups twin),
    # and persist was at best neutral.
    corpus = _grade_corpus(spark, sf_dir)
    return cosine_lsh_pairs(
        corpus, threshold=_GRADE_THRESHOLD, dim=64,
        id_col="vec_id", vec_col="v", multiprobe=_GRADE_MULTIPROBE,
    )


def _grade_groups_sql() -> str:
    from .similarity import dot_sql

    return f"""
WITH RECURSIVE {_GRADE_CORPUS_SQL},
agg AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {dot_sql('a.v', 'b.v')} AS dot,
           {dot_sql('a.v', 'a.v')} AS na,
           {dot_sql('b.v', 'b.v')} AS nb
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
),
jp AS (SELECT id_a, id_b FROM agg
       WHERE dot / (sqrt(na) * sqrt(nb)) >= {_GRADE_THRESHOLD}),
edges AS (SELECT id_a AS a, id_b AS b FROM jp UNION ALL SELECT id_b, id_a FROM jp),
reach(v, lab) AS (
    SELECT vec_id, vec_id FROM corpus
    UNION
    SELECT e.a, r.lab FROM reach r JOIN edges e ON e.b = r.v
)
SELECT v AS vec_id, MIN(lab) AS canonical_id FROM reach GROUP BY v
"""


@register("dedup_embedding_groups_grade", oracle=_grade_groups_sql())
def dedup_embedding_groups_grade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup SURVIVORSHIP at the dedup-grade operating
    point: every corpus vector (base + planted) mapped to the canonical
    (min vec_id) member of its cosine>=0.8 cluster.  Planted mixtures
    cluster with their source vector (each cluster = {x, 2x+y}), every
    other vector is a singleton — the realistic shape of production
    dedup, where duplicate clusters are tiny and almost everything
    survives.  Same corpus-contingent-recall contract as the pairs
    gate; the oracle recomputes the fixpoint as a recursive CTE over
    the exact all-pairs graph of the same constructed corpus."""
    from ..operators.similarity import cosine_lsh_pairs
    from ..operators.traversal import pairs_to_canonical

    # Round 16: LEFT LAZY after an interleaved A/B — a localCheckpoint
    # of the corpus measured ~2x SLOWER here (6.3 -> 10.7 s min-of-3):
    # the stats-less LogicalRDD flips the unpacked rescore's broadcast
    # joins to sort-merge, and the CC tail loses the vec_id-only scan
    # pruning; persist kept stats but was still no better than lazy.
    corpus = _grade_corpus(spark, sf_dir)
    pairs = cosine_lsh_pairs(
        corpus, threshold=_GRADE_THRESHOLD, dim=64,
        id_col="vec_id", vec_col="v", multiprobe=_GRADE_MULTIPROBE,
    )
    return pairs_to_canonical(pairs, corpus, ("id_a", "id_b"), "vec_id")


# -- round 7: quality-weighted survivorship --------------------------------

_SURV_QUALITY_SQL = rf"""
WITH RECURSIVE toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct(list_transform(generate_series(0, len(t)-3),
                                                     i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
                   ELSE [] END AS s
       FROM toks),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
ipairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
           FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
jpairs AS (SELECT doc_a, doc_b
           FROM ipairs
           JOIN sizes sa ON sa.doc_id = doc_a
           JOIN sizes sb ON sb.doc_id = doc_b
           WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.8),
edges AS (SELECT doc_a AS a, doc_b AS b FROM jpairs
          UNION ALL SELECT doc_b, doc_a FROM jpairs),
reach(doc, lab) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.a, r.lab FROM reach r JOIN edges e ON e.b = r.doc
),
mapping AS (SELECT doc AS doc_id, MIN(lab) AS canonical_id FROM reach GROUP BY doc)
SELECT m.doc_id, m.canonical_id,
       FIRST_VALUE(m.doc_id) OVER (
           PARTITION BY m.canonical_id
           ORDER BY d.n_chars DESC, m.doc_id ASC) AS survivor_id
FROM mapping m JOIN documents d USING (doc_id)
"""


@register("dedup_minhash_survivors_quality", oracle=_SURV_QUALITY_SQL)
def dedup_minhash_survivors_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-WEIGHTED survivorship (round 7): every document mapped to
    its near-dup cluster's canonical label AND to the member the
    pipeline actually KEEPS — the highest-quality one (longest text,
    ties broken by min doc_id), not the arbitrary min-id member.  This
    is the keep-rule production corpus dedup ships: when a boilerplate
    page and its richer superset near-duplicate each other, the corpus
    keeps the superset.  Extends dedup_minhash_groups (which pins the
    clustering itself) with the selection step.

    Plan shape: the cluster mapping comes from the separately-gated
    MinHash+LSH pairs -> min-label CC path; quality attaches as a slim
    (doc_id, n_chars) join; the per-cluster argmax is a PARTIAL-AGG
    ``max_by(doc_id, struct(n_chars, -doc_id))`` over the mapping (one
    row per cluster out of the shuffle — never a window over raw
    rows), broadcast back onto the members.  At 100 TB survivor
    election shuffles |clusters| rows, not |corpus|.

    The oracle recomputes the identical fixpoint + election as a
    recursive CTE + FIRST_VALUE window over the exact-Jaccard pair
    graph (same corpus-contingent MinHash-recall contract, and the
    same argmax by construction: max(n_chars) then min(doc_id))."""
    from ..operators.traversal import pairs_to_canonical

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, threshold=0.8)
    mapping = pairs_to_canonical(
        pairs, docs, ("doc_a", "doc_b"), "doc_id"
    )
    with_q = mapping.join(docs.select("doc_id", "n_chars"), "doc_id")
    survivors = with_q.groupBy("canonical_id").agg(
        F.max_by(
            "doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("_nd"))
        ).alias("survivor_id")
    )
    return with_q.select("doc_id", "canonical_id").join(
        F.broadcast(survivors), "canonical_id"
    ).select("doc_id", "canonical_id", "survivor_id")


@register("dedup_semantic_survivors", oracle=None)
def dedup_semantic_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC cluster-then-dedup (round 9) — the SemDeDup recipe
    (public: Abbas et al. 2023) composed from this engine's own
    primitives: integer k-means over NORMALIZED embeddings partitions
    the corpus into k semantic cells, exact cosine near-dup pairs are
    scored ONLY within cells, and survivorship is the shared min-label
    CC tail (pairs_to_canonical).  Corpus = the planted-near-dup grade
    corpus, so the 0.8-pair set is nonvacuous and known.

    Why this exists at 100 TB: all-pairs scoring is n^2/2; LSH bounds
    it by collision counts; CLUSTERING bounds it by sum_k |cell|^2/2
    ~ n^2/(2k) while keeping exact scoring inside cells AND giving the
    curation pipeline its cluster structure for free (cluster-balanced
    sampling, per-cell quotas).  The honest cost is boundary recall:
    pairs straddling two cells are never scored — measured co-clustered
    fractions of the exact 0.8-pair set at the SHIPPED adaptive
    k = max(8, count // 256): 0.958 / 0.889 / 0.794 at
    sf0.001 / 0.01 / 0.1 (corpus 571 / 571 / 2286 rows, so the
    adaptive rule floors to k=8 at all three — pinned by
    test_semantic_adaptive_k_operating_point; recall pytest-pinned
    >= 0.9 at sf0.001), and 0.65 at the 10x corpus (22,857 rows,
    adaptive k=89 — numpy replica of the identical integer
    arithmetic, r10).  k trades recall against the n^2/k pair bound,
    and the LSH gates remain the high-recall path.  Wall:
    10.2 s -> 23.4 s at 10x (2.3x, BENCH_SF1.md) — the adaptive k
    keeps cells ~256 rows so the within-cell join grows linearly,
    not quadratically.

    Rows-only BY DESIGN (the k-means fixpoint is not SQL-expressible);
    precision is exact by construction — every emitted pair was
    re-scored with the left-fold cosine — and the pytest pins subset-of-
    exact-pairs, planted recall, and repeat-run identity.  Clustering
    normalizes (cosine geometry: planted mixtures have sqrt(5)x norms);
    pair scoring uses the ORIGINAL vectors, same as the grade gates."""
    from ..functions.vectors import norm2_seq
    from ..operators.kmeans import kmeans_assign, kmeans_fit
    from ..operators.traversal import pairs_to_canonical

    corpus = _grade_corpus(spark, sf_dir).persist()
    try:
        # k scales with the corpus so CELLS stay ~constant-sized (the
        # paper's regime): fixed k would let the n^2/k pair bound creep
        # back toward n^2 as the corpus grows.  256-row cells keep the
        # within-cell join ~linear in n; k=8 floor preserves the pinned
        # sf0.001/sf0.01 operating point.
        k = max(8, corpus.count() // 256)
        unit = corpus.withColumn("_n", norm2_seq(F.col("v"))).select(
            "vec_id", F.transform("v", lambda x: x / F.col("_n")).alias("nv")
        )
        cents, _iters, _inertia = kmeans_fit(unit, k=k, vec_col="nv", dim=64)
        asg = kmeans_assign(unit, cents, vec_col="nv")
        # Round-15 optimization (guide §4.1/§2.3): score pairs with the
        # UNPACKED-COLUMN dot product instead of cosine_seq — the
        # interpreted zip_with/aggregate HOFs evaluated dot + BOTH norms
        # per PAIR (~n^2/k interpreted 64-element folds), where the norm
        # is a per-ROW quantity.  Precompute nrm once per row before the
        # join and run the dot as a left-associated codegen multiply/add
        # chain — bit-identical to cosine_seq's sequential fold (same
        # double casts, same association order, 0.0 + x0 == x0; the
        # cosine_lsh_pairs rescore argument verbatim), so the pair set
        # and every cosine value are unchanged.
        withc = corpus.join(asg, "vec_id").select(
            "vec_id",
            "cluster",
            norm2_seq(F.col("v")).alias("_n"),
            *[F.col("v")[i].alias(f"_x{i}") for i in range(64)],
        )
        a = withc.select(
            F.col("vec_id").alias("id_a"),
            "cluster",
            F.col("_n").alias("_na"),
            *[F.col(f"_x{i}").alias(f"_a{i}") for i in range(64)],
        )
        b = withc.select(
            F.col("vec_id").alias("id_b"),
            "cluster",
            F.col("_n").alias("_nb"),
            *[F.col(f"_x{i}").alias(f"_b{i}") for i in range(64)],
        )
        import functools as _functools

        dot = _functools.reduce(
            lambda acc, t: acc + t,
            [F.col(f"_a{i}") * F.col(f"_b{i}") for i in range(64)],
        )
        pairs = (
            a.join(b, "cluster")
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                (dot / (F.col("_na") * F.col("_nb"))).alias("cosine"),
            )
            .filter(F.col("cosine") >= _GRADE_THRESHOLD)
            # CC iterates over the pair frame — cut the cluster-join
            # lineage once instead of re-executing it per superstep
            .localCheckpoint(eager=True)
        )
        return pairs_to_canonical(pairs, corpus, ("id_a", "id_b"), "vec_id")
    finally:
        corpus.unpersist()


# Corpus-role rule for the decontamination gates, COPY-OFFSET-ROBUST:
# a row is EVAL iff its id's position WITHIN its copy span is a plant
# id (vec_id % span >= plant offset).  At the driver SFs every id is
# < 1e6 so this is identical to a plain >= threshold; at the synthetic
# sf1 fixture (tools/make_sf1.py offsets each corpus copy by 1e9) a
# plain threshold would misclassify all 9 copies as eval — train would
# stay at the sf0.1 size while eval ballooned 9x, inverting the
# intended nightly shape (small eval batch vs large indexed train) and
# the measured scaling.  Stated identically in Spark and the oracle.
_COPY_SPAN = 1_000_000_000  # = tools/make_sf1.py KEY_OFF


def _is_eval_col():
    return (F.col("vec_id") % _COPY_SPAN) >= _PLANT_ID_OFFSET


def _decontaminate_sql(train_pred: str = "TRUE") -> str:
    from .similarity import dot_sql

    return f"""
WITH {_GRADE_CORPUS_SQL},
ev AS (SELECT * FROM corpus WHERE vec_id % {_COPY_SPAN} >= {_PLANT_ID_OFFSET}),
tr AS (SELECT * FROM corpus
       WHERE vec_id % {_COPY_SPAN} < {_PLANT_ID_OFFSET} AND ({train_pred})),
agg AS (
    SELECT e.vec_id AS eval_id, t.vec_id AS train_id,
           {dot_sql('e.v', 't.v')} AS dot,
           {dot_sql('e.v', 'e.v')} AS ne,
           {dot_sql('t.v', 't.v')} AS nt
    FROM ev e, tr t
),
scored AS (
    SELECT eval_id, train_id, dot / (sqrt(ne) * sqrt(nt)) AS cosine
    FROM agg WHERE dot / (sqrt(ne) * sqrt(nt)) >= {_GRADE_THRESHOLD}
),
ranked AS (
    SELECT eval_id, train_id, cosine,
           row_number() OVER (PARTITION BY eval_id
                              ORDER BY cosine DESC, train_id) AS rn
    FROM scored)
SELECT eval_id, train_id, cosine FROM ranked WHERE rn = 1
"""


@register("dedup_semantic_decontaminate", oracle=_decontaminate_sql())
def dedup_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC DECONTAMINATION (round 10): for each EVAL document,
    the strongest TRAIN near-duplicate at cosine >= 0.8 — the
    cross-corpus companion of the SemDeDup and grade gates, and the
    embedding-level form of text_decontaminate_overlap's n-gram check:
    "which benchmark items leak from the training corpus, and from
    where?"  Paraphrase-level leakage survives n-gram overlap checks;
    it does not survive this one.

    Corpus roles from the planted grade construction: eval = the
    planted near-dups (vec_id >= offset), train = the originals — so
    every eval doc leaks by construction and the gate is provably
    nonvacuous (the EXCEPT-gate lesson).  Output is one row per
    contaminated eval doc: (eval_id, the argmax train match with ties
    to the lowest train_id, cosine).

    Plan: operators/similarity.cosine_lsh_cross_pairs — both frames
    bucket under the same md5 planes, candidates from a bucket
    EQUIJOIN between the frames (never an eval x train cross join),
    eval-side multiprobe widening, exact unpacked-column rescoring —
    then a per-eval window over the surviving pairs (bounded by the
    LSH candidate count, linear by construction).  At 100 TB the train
    side buckets once and persists (the minhash-index pattern); each
    eval batch shuffles only slim bucket rows.

    CORPUS-CONTINGENT ORACLE, the grade-gate contract: the exact SQL
    (eval x train replay + per-eval argmax) is valid because widened
    candidate recall at 0.8 is total on this corpus — pinned by
    test_decontaminate_matches_bruteforce, which compares the full
    pair set AND the argmax selection against brute force at two SFs."""
    from ..operators.similarity import cosine_lsh_cross_pairs
    from pyspark.sql import Window

    # ONE planted-corpus materialization (round 16, guide §1.2): ev/tr
    # slices feed the sizing count, two bucketing passes and two
    # unpacked rescore sides — each recomputed the plant join before
    corpus = _grade_corpus(spark, sf_dir).localCheckpoint(eager=True)
    ev = corpus.filter(_is_eval_col())
    tr = corpus.filter(~_is_eval_col())
    # n_rows = one corpus count (round 15, guide §1.2): eval/train
    # partition the corpus exactly, so the auto-sizing basis
    # left.count() + right.count() equals corpus.count() — one job and
    # one grade-corpus materialization instead of two, same basis value
    # and therefore identical plane parameters and results.
    pairs = cosine_lsh_cross_pairs(
        ev, tr, threshold=_GRADE_THRESHOLD, dim=64,
        vec_col="v", multiprobe=_GRADE_MULTIPROBE, n_rows=corpus.count(),
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("id_a").alias("eval_id"),
            F.col("id_b").alias("train_id"),
            "cosine",
        )
    )


def _decontaminate_by_source_sql() -> str:
    # compose the one-shot provenance SQL as a CTE — the rollup is a
    # strict post-processing of those rows, stated identically here
    return f"""
WITH prov AS ({_decontaminate_sql()}),
lab AS (SELECT p.eval_id, p.cosine, d.source
        FROM prov p JOIN documents d ON d.doc_id = p.train_id),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM prov)
SELECT lab.source,
       CAST(COUNT(*) AS BIGINT) AS leaked_evals,
       MAX(lab.cosine) AS max_cosine,
       CAST(COUNT(*) AS DOUBLE) / MAX(tot.n) AS leak_share
FROM lab, tot
GROUP BY lab.source
"""


@register("dedup_decontaminate_by_source", oracle=_decontaminate_by_source_sql())
def dedup_decontaminate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SOURCE decontamination rollup (round 11 — the r10 verdict's
    banked candidate a): 'which SOURCE leaks the most eval items?' —
    the curation report the decontamination sweep feeds.  A benchmark
    item leaking once is a filter decision; a SOURCE leaking dozens is
    an acquisition decision (drop the feed, renegotiate the crawl), and
    that call needs the rollup, not the row stream.

    COMPOSES the existing provenance rows — one (eval_id, train_id,
    cosine) row per contaminated eval item from
    dedup_semantic_decontaminate, same operating point, no new index —
    joins the train side to its document source metadata, and rolls up:
    leaked item count, strongest leak, and each source's share of all
    contaminated evals.

    Plan shape: the provenance frame is EVAL-BATCH sized (argmax gives
    one row per contaminated eval), so it BROADCASTS onto the documents
    metadata projection (column-pruned to (doc_id, source) — the text
    column never loads); the rollup shuffles at most |sources| groups
    and the share denominator rides a broadcast 1-row scalar, the
    engine's standing idiom.  At 100 TB: one metadata-projection pass
    over documents, a bounded broadcast, a 20-row result.

    Determinism: counts are exact longs; max_cosine is an order-
    insensitive max over doubles both engines computed identically;
    leak_share is ONE division of two exact numbers — no double
    accumulation anywhere, so no decimal ladder is needed.

    Same corpus-contingent oracle contract as the provenance gate it
    composes (total widened candidate recall at 0.8 on this corpus,
    pinned by test_decontaminate_matches_bruteforce)."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize the bounded provenance ONCE — it feeds both the
    # labeled rollup and the share denominator
    prov = dedup_semantic_decontaminate(spark, sf_dir).localCheckpoint(
        eager=True
    )
    lab = docs.select(F.col("doc_id").alias("train_id"), "source").join(
        F.broadcast(prov), "train_id"
    )
    total = prov.agg(F.count("*").cast("double").alias("_n"))
    return (
        lab.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("leaked_evals"),
            F.max("cosine").alias("max_cosine"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "leaked_evals",
            "max_cosine",
            (F.col("leaked_evals").cast("double") / F.col("_n")).alias(
                "leak_share"
            ),
        )
    )


@register("dedup_decontaminate_incremental", oracle=_decontaminate_sql())
def dedup_decontaminate_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NIGHTLY semantic decontamination (round 10): the persisted-index
    form of dedup_semantic_decontaminate — lsh_index_build buckets the
    TRAIN corpus once into the warehouse (bkey-bucketed candidates,
    id-bucketed prenormed vectors, sizing meta), then the EVAL batch is
    screened by decontaminate_incremental: it buckets only itself under
    the index's recorded plane parameters, shuffles only its own slim
    (id, bkey) rows into the index's bucket layout (no Exchange above
    the index's bucketed scan — pytest plan-pinned), rescores
    candidates exactly, and the gate applies the same per-eval argmax.
    This is the shape a months-lived benchmark-protection job wants:
    index the training corpus at snapshot time, screen each new eval
    set as it arrives — the minhash incremental contract
    (operators/dedup.py) applied to embeddings.

    Same output contract and SAME ORACLE as the one-shot gate: a
    vector's buckets depend only on itself and the persisted
    parameters, so batch-vs-index decomposes exactly; pytest
    additionally pins bit-exact output equality with
    dedup_semantic_decontaminate at two SFs (both operating points have
    total candidate recall on this corpus — the standing grade-gate
    contingency).  Unique table prefix + finally-drop keeps the gate
    re-runnable; a failed build leaves its claim by design, but the
    throwaway prefix's marker is removed in the same finally (the
    incremental-dedup gate's r9 hygiene rule)."""
    import uuid as _uuid

    from pyspark.sql import Window

    from ..operators.similarity import (
        _lsh_index_claim,
        decontaminate_incremental,
        lsh_index_build,
    )

    # ONE planted-corpus materialization (round 16, guide §1.2): the
    # build's sizing count + bucket + vector passes and the screen's
    # bucket + rescore side each recomputed the plant join before
    corpus = _grade_corpus(spark, sf_dir).localCheckpoint(eager=True)
    ev = corpus.filter(_is_eval_col())
    tr = corpus.filter(~_is_eval_col())
    prefix = f"decongate_{_uuid.uuid4().hex[:8]}"
    try:
        lsh_index_build(
            tr, prefix, threshold=_GRADE_THRESHOLD, dim=64,
            vec_col="v", multiprobe=_GRADE_MULTIPROBE,
        )
        # materialize=False: the gate's own eager checkpoint below (after
        # the argmax window, before the finally drops the tables) is the
        # single materialization — the operator's default would execute
        # the full bucket-join/rescore plan to a checkpoint TWICE
        pairs = decontaminate_incremental(
            ev, prefix, vec_col="v", materialize=False
        )
        w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
        result = (
            pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.col("id_a").alias("eval_id"),
                F.col("id_b").alias("train_id"),
                "cosine",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        from ..operators.bucketing import index_drop_all
        from ..sinks import _hadoop_fs

        index_drop_all(spark, prefix, ("_buckets", "_vectors", "_meta"))
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = _hadoop_fs(spark, warehouse)
        fs.delete(jpath(_lsh_index_claim(warehouse, prefix)), False)
    return result


def _decontaminate_append_sql() -> str:
    # the two phases replay the two constructions exactly: 'base' =
    # the one-shot restricted to the base train half (argmax over the
    # restricted pairs — restriction BEFORE argmax, which is why the
    # predicate threads into _decontaminate_sql's tr CTE rather than
    # filtering its output), 'appended' = the full one-shot
    return f"""
SELECT 'base' AS phase, eval_id, train_id, cosine
FROM ({_decontaminate_sql("(vec_id // 7) % 2 = 0")})
UNION ALL
SELECT 'appended' AS phase, eval_id, train_id, cosine
FROM ({_decontaminate_sql()})
"""


@register("dedup_decontaminate_append", oracle=_decontaminate_append_sql())
def dedup_decontaminate_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECONTAMINATION-INDEX APPEND lifecycle (round 12, registered
    after the window filled — AWAITING_FIRST_SLOT, an r13 driver slot;
    with dedup_index_append this completes the banked handoff
    candidate e for BOTH persisted text/embedding indexes): grow the
    benchmark-protection index at DELTA cost.  The nightly story: half
    the train corpus is indexed (lsh_index_build, generation 1, plane
    parameters sized and RECORDED for that half); the other half lands
    later via lsh_index_append as the generation's first immutable
    segment — bucketed under the RECORDED parameters, never re-sized;
    the eval batch is then screened twice in one plan: pinned to the
    pre-append snapshot (as_of_segment=0, phase 'base') and against the
    appended index (fresh resolve, phase 'appended'), each with the
    same per-eval argmax as the one-shot gate.

    The oracle replays both constructions exactly (the one-shot SQL
    with the train side restricted to the base half, then unrestricted)
    — a strict hash-match proves the frozen-parameter decomposition
    (base ∪ segment = union build with the same parameters) AND the
    segment pin's bit-identical pre-append answer.  Same
    corpus-contingent total-recall contingency as the other
    decontamination gates, with one addition pinned in pytest: the
    base-half index's parameters (sized for the half, then probed for
    the union) retain total recall on this corpus.  Train halves split
    by (vec_id // 7) % 2 — id-block alternation, stated identically in
    both engines, chosen so both halves span all sources.  Lifecycle
    invariants raise RuntimeError (loud-failure convention)."""
    import uuid as _uuid

    from pyspark.sql import Window

    from ..operators.similarity import (
        _lsh_index_claim,
        decontaminate_incremental,
        lsh_index_append,
        lsh_index_build,
    )

    # ONE planted-corpus materialization (round 16, guide §1.2): this
    # gate is the heaviest consumer — build (count + bucket + vectors
    # over the base half), append (validation agg + dup semi-join +
    # bucket + vectors over the delta half) and TWO screens (bucket +
    # rescore side each) all sliced the lazily recomputed plant join
    corpus = _grade_corpus(spark, sf_dir).localCheckpoint(eager=True)
    ev = corpus.filter(_is_eval_col())
    tr = corpus.filter(~_is_eval_col())
    half = (F.floor(F.col("vec_id") / 7) % 2 == 0)
    base, delta = tr.filter(half), tr.filter(~half)
    prefix = f"apdecon_{_uuid.uuid4().hex[:8]}"
    try:
        g = lsh_index_build(
            base, prefix, threshold=_GRADE_THRESHOLD, dim=64,
            vec_col="v", multiprobe=_GRADE_MULTIPROBE,
        )
        audit = lsh_index_append(delta, prefix, vec_col="v")
        if (g, audit["generation"], audit["segment"]) != (1, 1, 1):
            raise RuntimeError(
                f"expected build gen 1 + segment 1, got ({g}, "
                f"{audit['generation']}, {audit['segment']})"
            )
        if not audit["retrain_due"]:
            raise RuntimeError(
                "appending ~the basis size must trip the retrain trigger; "
                f"audit={audit}"
            )
        w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))

        def _argmax(pairs, phase: str):
            return (
                pairs.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select(
                    F.lit(phase).alias("phase"),
                    F.col("id_a").alias("eval_id"),
                    F.col("id_b").alias("train_id"),
                    "cosine",
                )
            )

        pinned = _argmax(
            decontaminate_incremental(
                ev, prefix, vec_col="v", materialize=False, as_of_segment=0
            ),
            "base",
        )
        fresh = _argmax(
            decontaminate_incremental(ev, prefix, vec_col="v", materialize=False),
            "appended",
        )
        result = pinned.unionByName(fresh).localCheckpoint(eager=True)
    finally:
        from ..operators.bucketing import index_drop_all
        from ..sinks import _hadoop_fs

        index_drop_all(spark, prefix, ("_buckets", "_vectors", "_meta"))
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = _hadoop_fs(spark, warehouse)
        fs.delete(jpath(_lsh_index_claim(warehouse, prefix)), False)
    return result
