"""Storage & IO round-trip gate queries (SURVEY.md §2.2 scans/sinks,
§2.3 scale surface).

Each query drives a write-then-read round trip through one storage layer
— bucketed tables, the layout-aware partitioned sink, the strict JSONL
codec — and aggregates the result; the oracle recomputes the same
aggregate directly on the parquet tables, proving the storage path
changes the PLAN (or the on-disk layout) and not the ANSWER.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.bucketing import bucketed_join, write_bucketed
from ..registry import register
from ..sources.tables import load_table
from .relational import _dsql, _dsum_sql, d, dsum

_BUCKETED_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       {_dsum_sql(f"{_dsql('l_extendedprice')} * (1 - {_dsql('l_discount')})")} AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


@register("storage_bucketed_join_revenue", oracle=_BUCKETED_SQL)
def storage_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority through BUCKETED tables: orders and
    lineitem are first persisted bucketed on the join key (the write-once
    shuffle), then joined via the session catalog — the join itself is
    Exchange-free.  Unique table names + drop keep the gate re-runnable."""
    tag = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"b_orders_{tag}", f"b_lineitem_{tag}"
    try:
        write_bucketed(
            load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
            t_orders,
            "o_orderkey",
            n_buckets=8,
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount"
        )
        write_bucketed(li, t_lineitem, "o_orderkey", n_buckets=8)
        result = (
            bucketed_join(spark, t_orders, t_lineitem, on="o_orderkey")
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_lines"),
                dsum(d("l_extendedprice") * (F.lit(1) - d("l_discount"))).alias("revenue"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        # drop on failure too, or reruns leak uuid-named tables + warehouse
        # files (the scratch-dir gates' try/finally pattern)
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")
    return result


_SINK_SQL = """
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
FROM orders GROUP BY o_orderpriority, o_orderstatus
"""


@register("sink_partitioned_roundtrip", oracle=_SINK_SQL)
def sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-aware sink round trip: orders written partition-dirs by
    priority with date-sorted files (sinks.write_partitioned — the layout
    that buys partition pruning + tight row-group stats at scale), read
    back, aggregated.  The key checksum proves the exact row set survived
    the layout."""
    from ..sinks import write_partitioned
    from ..streaming.sources import cleanup, scratch_dir

    orders = load_table(spark, sf_dir, "orders")
    scratch = scratch_dir("sinkgate")
    try:
        write_partitioned(
            orders,
            f"{scratch}/orders",
            ["o_orderpriority"],
            sort_cols=["o_orderdate"],
        )
        back = spark.read.parquet(f"{scratch}/orders")
        result = (
            back.groupBy("o_orderpriority", "o_orderstatus")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum("o_orderkey").alias("key_checksum"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        cleanup(scratch)
    return result


_JSONL_SQL = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       COUNT(DISTINCT md5(text)) AS n_distinct_fp
FROM documents GROUP BY lang
"""


@register("source_jsonl_roundtrip", oracle=_JSONL_SQL)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict JSONL codec round trip: documents exported to JSON lines,
    re-read with the enforced schema + FAILFAST (sources/text_formats.py
    — never inferred), aggregated.  The distinct-fingerprint count proves
    the text bodies survived encoding byte-for-byte."""
    from ..sources.text_formats import read_jsonl
    from ..streaming.sources import cleanup, scratch_dir

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    scratch = scratch_dir("jsonlgate")
    try:
        docs.write.mode("overwrite").json(f"{scratch}/docs")
        back = read_jsonl(
            spark,
            f"{scratch}/docs",
            "doc_id long, lang string, source string, text string",
        )
        result = (
            back.groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("doc_id").alias("id_checksum"),
                F.countDistinct(F.md5("text")).alias("n_distinct_fp"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        cleanup(scratch)
    return result


_CSV_SQL = """
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total
FROM documents GROUP BY lang, source
"""


@register("source_csv_roundtrip", oracle=_CSV_SQL)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict CSV codec round trip over the scalar columns (document
    bodies belong in JSONL/parquet — embedded newlines would force
    non-splittable multiLine CSV, the wrong trade at scale).  Explicit
    schema + FAILFAST on the way back in; checksums prove the exact row
    set survived."""
    from ..sources.text_formats import read_csv
    from ..streaming.sources import cleanup, scratch_dir

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    scratch = scratch_dir("csvgate")
    try:
        docs.write.mode("overwrite").option("header", True).csv(f"{scratch}/docs")
        back = read_csv(
            spark,
            f"{scratch}/docs",
            "doc_id long, lang string, source string, n_chars long",
        )
        result = (
            back.groupBy("lang", "source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("doc_id").alias("id_checksum"),
                F.sum("n_chars").alias("chars_total"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        cleanup(scratch)
    return result


_XML_SQL = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       COUNT(DISTINCT md5(text)) AS n_distinct_fp
FROM documents GROUP BY lang
"""


@register("source_xml_roundtrip", oracle=_XML_SQL)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict XML codec round trip (round 8 — the banked round-7
    candidate): documents exported as <doc> row elements via Spark 4's
    built-in XML source, re-read with the enforced schema + FAILFAST
    (sources/text_formats.py), aggregated.  DuckDB has no XML reader,
    so the oracle states the roundtrip invariant against the parquet
    original — the CSV/JSONL gate pattern; the distinct-fingerprint
    count proves the text bodies survived entity-escaping round trips
    byte-for-byte.  Scale note (read_xml docstring): XML files are not
    line-splittable, so parallelism comes from file count — the export
    keeps Spark's one-file-per-partition layout."""
    from ..sources.text_formats import read_xml, write_xml
    from ..streaming.sources import cleanup, scratch_dir

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    scratch = scratch_dir("xmlgate")
    try:
        write_xml(docs, f"{scratch}/docs", row_tag="doc")
        back = read_xml(
            spark,
            f"{scratch}/docs",
            "doc_id long, lang string, source string, text string",
            row_tag="doc",
        )
        result = (
            back.groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("doc_id").alias("id_checksum"),
                F.countDistinct(F.md5("text")).alias("n_distinct_fp"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        cleanup(scratch)
    return result


_N_CORRUPT = 7

_QUARANTINE_SQL = f"""
SELECT COUNT(*) AS n_clean,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       CAST({_N_CORRUPT} AS BIGINT) AS n_corrupt
FROM documents
"""


@register("source_jsonl_quarantine", oracle=_QUARANTINE_SQL)
def source_jsonl_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter quarantine flow: the documents JSONL export plus a file
    of deliberately malformed lines, read PERMISSIVE with a `_corrupt`
    column (sources/text_formats.read_jsonl_permissive).  Every clean row
    must survive untouched (count + id checksum against the table) and
    every malformed line must land in quarantine — never silently dropped,
    never nulled into the clean stream."""
    import os

    from ..sources.text_formats import read_jsonl_permissive
    from ..streaming.sources import cleanup, scratch_dir

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    scratch = scratch_dir("quarantinegate")
    try:
        out = f"{scratch}/docs"
        docs.write.mode("overwrite").json(out)
        bad_lines = "\n".join(
            f'{{"doc_id": "not_a_number_{i}", "lang": [broken' for i in range(_N_CORRUPT)
        )
        with open(os.path.join(out, "zz_corrupt.json"), "w") as f:
            f.write(bad_lines + "\n")
        back = read_jsonl_permissive(
            spark, out, "doc_id long, lang string, source string, text string"
        ).cache()  # Spark forbids querying ONLY _corrupt from a raw scan
        clean = back.filter(F.col("_corrupt").isNull())
        result = (
            clean.agg(
                F.count("*").alias("n_clean"),
                F.sum("doc_id").alias("id_checksum"),
            )
            .crossJoin(
                back.filter(F.col("_corrupt").isNotNull())
                .agg(F.count("*").alias("n_corrupt"))
            )
            .localCheckpoint(eager=True)
        )
        back.unpersist(blocking=False)
    finally:
        cleanup(scratch)
    return result


_ZORDER_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(SUM(o_custkey) AS BIGINT) AS cust_checksum
FROM orders GROUP BY o_orderstatus
"""


@register("storage_zorder_roundtrip", oracle=_ZORDER_SQL)
def storage_zorder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout round trip: orders rewritten clustered by the Morton
    code of (o_custkey, o_orderdate) — the two-dimensional data-skipping
    layout (operators/zorder.py): per-file footer stats stay tight on BOTH
    columns, so range filters on either prune files, where a plain sort
    serves only its leading column.  The checksums prove the exact row set
    survived the rewrite; the skipping property itself is pinned by
    tests/test_zorder.py against real parquet footer metadata."""
    from ..operators.zorder import write_zordered
    from ..streaming.sources import cleanup, scratch_dir

    orders = load_table(spark, sf_dir, "orders")
    scratch = scratch_dir("zordergate")
    try:
        write_zordered(orders, f"{scratch}/orders", "o_custkey", "o_orderdate")
        back = spark.read.parquet(f"{scratch}/orders")
        result = (
            back.groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum("o_orderkey").alias("key_checksum"),
                F.sum("o_custkey").alias("cust_checksum"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        cleanup(scratch)
    return result


_ORC_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(MIN(o_orderdate) AS VARCHAR) AS first_date,
       CAST(MAX(o_orderdate) AS VARCHAR) AS last_date
FROM orders GROUP BY o_orderstatus, o_orderpriority
"""


@register("source_orc_roundtrip", oracle=_ORC_SQL)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC codec round trip (round 4 — the remaining built-in columnar
    format next to parquet): orders written to ORC with zlib compression,
    read back, aggregated; checksums + date extrema prove the exact row
    set and the date/decimal type round trips survived.  Like parquet,
    ORC scans get predicate pushdown and column pruning from Catalyst,
    so either format serves the 100 TB scan path; the gate pins that the
    codec seam doesn't bend values."""
    from ..streaming.sources import cleanup, scratch_dir

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_orderdate"
    )
    scratch = scratch_dir("orcgate")
    try:
        orders.write.mode("overwrite").option("compression", "zlib").orc(
            f"{scratch}/orders"
        )
        back = spark.read.orc(f"{scratch}/orders")
        result = (
            back.groupBy("o_orderstatus", "o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum("o_orderkey").alias("key_checksum"),
                F.min("o_orderdate").cast("string").alias("first_date"),
                F.max("o_orderdate").cast("string").alias("last_date"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        cleanup(scratch)
    return result


_COMPACT_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       CAST(64 AS BIGINT) AS n_files_before,
       CAST(1 AS BIGINT) AS n_files_after
FROM documents
"""


@register("storage_compact_roundtrip", oracle=_COMPACT_SQL)
def storage_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction round trip (operators/compaction.py): the
    documents table is first written as 64 deliberately-tiny files (the
    streaming-micro-batch pathology), then compacted into
    ceil(total/target) range-partitioned files sorted on doc_id.  The
    gate pins exact row preservation (count + id checksum) plus the
    before/after file counts; the bin-packing arithmetic and the
    tight-footer-stats property are pytest-pinned
    (tests/test_compaction.py).  Round 5: the compaction is IN PLACE via
    ``sinks.replace_table`` (write-new-then-swap), so the gate also
    drives the shared rewrite-commit helper the upsert gate uses.  At
    100 TB the inventory comes from the _metadata column (no driver
    filesystem walk) and the rewrite is one range-shuffle."""
    from ..operators.compaction import compact_in_place
    from ..streaming.sources import cleanup, scratch_dir

    docs = load_table(spark, sf_dir, "documents")
    scratch = scratch_dir("compactgate")
    try:
        docs.repartition(64).write.mode("overwrite").parquet(f"{scratch}/small")
        # target far above the corpus size -> exactly one output file,
        # making n_files_after deterministic for the oracle
        n_before, n_after = compact_in_place(
            spark, f"{scratch}/small", "doc_id", target_file_bytes=1 << 30
        )
        back = spark.read.parquet(f"{scratch}/small")
        result = back.agg(
            F.count("*").alias("n_rows"),
            F.sum("doc_id").alias("id_checksum"),
            F.lit(n_before).cast("long").alias("n_files_before"),
            F.lit(n_after).cast("long").alias("n_files_after"),
        ).localCheckpoint(eager=True)
    finally:
        cleanup(scratch)
    return result


_IVM_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
         AS total_price
FROM orders GROUP BY o_orderpriority
"""


@register("storage_incremental_rollup", oracle=_IVM_SQL)
def storage_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for an algebraic rollup: the per-
    priority aggregate is materialized over 80% of orders, then REFRESHED
    by merging the partial aggregate of the remaining 20% delta — a
    groupBy over (|keys| x 2) partial rows, never a rescan of the base.
    The oracle is the full recompute, so the gate proves merge(partial_a,
    partial_b) == agg(a ∪ b) bit-exactly — for doubles that holds only
    because the money sum rides DECIMAL until the final cast (the same
    decimal-ladder rule every gate uses; plain double partials would
    diverge by association order).  At 100 TB this is the nightly-delta
    pattern: refresh cost scales with the delta, not the table."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.pmod("o_orderkey", F.lit(5)) != 0)
    delta = orders.filter(F.pmod("o_orderkey", F.lit(5)) == 0)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_checksum"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_price_dec"),
        )

    materialized = partial(base).localCheckpoint(eager=True)  # the stored MV
    refreshed = (
        materialized.unionByName(partial(delta))
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("key_checksum").alias("key_checksum"),
            F.sum("_price_dec").alias("_price_dec"),
        )
    )
    return refreshed.select(
        "o_orderpriority",
        "n_orders",
        "key_checksum",
        F.col("_price_dec").cast("decimal(38,2)").cast("double").alias("total_price"),
    )


_UPSERT_SQL = """
WITH upd AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1, 2) AS DOUBLE)
           AS o_totalprice
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderkey % 10 = 0),
ins AS (
  SELECT o_orderkey + 100000000 AS o_orderkey,
         '1-URGENT' AS o_orderpriority,
         CAST(o_orderkey % 1000 AS DOUBLE) AS o_totalprice
  FROM orders WHERE o_orderpriority = '2-HIGH' AND o_orderkey % 100 = 0),
merged AS (
  SELECT o_orderkey, o_orderpriority, CAST(o_totalprice AS DOUBLE) AS o_totalprice
  FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
  UNION ALL SELECT * FROM upd
  UNION ALL SELECT * FROM ins)
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
         AS total_price
FROM merged GROUP BY o_orderpriority
"""


@register("storage_upsert_partitioned", oracle=_UPSERT_SQL)
def storage_upsert_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (upsert) into a partitioned parquet table — the lake-table
    update pattern when there is no transactional format: updates (10%
    price bump on a slice of two priorities) and inserts (synthetic new
    urgent orders) touch only 2 of 5 o_orderpriority partitions; the
    rewrite anti-joins the affected partitions' rows against the update
    keys, unions updates+inserts, and commits via
    ``sinks.replace_partitions`` — the write-new-then-swap helper stages
    the rewrite beside the table (the staging scan reads the OLD files,
    so reading-while-rewriting cannot race the way an in-place dynamic
    overwrite did in round 4) and swaps ONLY the affected partition
    directories; untouched partitions keep their files byte-identical,
    the readers-writers isolation the catalog relies on.  The oracle
    computes full MERGE semantics in SQL; the gate aggregates the re-read
    table, proving the upsert changed exactly the intended rows and
    nothing else."""
    from ..sinks import replace_partitions
    from ..streaming.sources import cleanup, scratch_dir

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.col("o_totalprice").cast("double").alias("o_totalprice")
    )
    scratch = scratch_dir("upsertgate")
    try:
        orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(
            f"{scratch}/t"
        )
        upd = orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.pmod("o_orderkey", F.lit(10)) == 0)
        ).select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.col("o_totalprice").cast("decimal(18,2)") * 1.1, 2)
            .cast("double")
            .alias("o_totalprice"),
        )
        ins = orders.filter(
            (F.col("o_orderpriority") == "2-HIGH") & (F.pmod("o_orderkey", F.lit(100)) == 0)
        ).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            F.lit("1-URGENT").alias("o_orderpriority"),
            F.pmod("o_orderkey", F.lit(1000)).cast("double").alias("o_totalprice"),
        )
        changes = upd.unionByName(ins)
        affected = [
            r["o_orderpriority"]
            for r in changes.select("o_orderpriority").distinct().collect()  # bounded: partitions
        ]
        table = spark.read.parquet(f"{scratch}/t")
        kept = table.filter(F.col("o_orderpriority").isin(affected)).join(
            changes.select("o_orderkey"), "o_orderkey", "left_anti"
        )
        replace_partitions(
            kept.unionByName(changes).select(
                "o_orderkey", "o_totalprice", "o_orderpriority"
            ),
            f"{scratch}/t",
            ["o_orderpriority"],
        )
        back = spark.read.parquet(f"{scratch}/t")
        result = (
            back.groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum("o_orderkey").alias("key_checksum"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(38,2)")
                .cast("double")
                .alias("total_price"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        cleanup(scratch)
    return result


_SCD_LATEST_SQL = """
WITH r AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id, event_type, event_id, ts_us, value
FROM r WHERE rn = 1
"""


@register("storage_scd_latest_version", oracle=_SCD_LATEST_SQL)
def storage_scd_latest_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction / latest-version-per-key (round 5): collapse an
    append-only change stream to the newest row per (user_id,
    event_type), ordered by (ts, event_id) with the id as a total
    tiebreaker — the read-side half of every MERGE-based lake pipeline
    (upsert writes are gated by storage_upsert_partitioned; this is the
    dedup a reader applies when upstream appends instead).  One shuffle
    on the key; at 100 TB the same window runs per partition after a
    partition-pruned scan of only the affected day/hour dirs."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "value",
        )
    )


_SCD2_SQL = """
SELECT user_id, event_id,
       epoch_us(ts) AS valid_from_us,
       epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id)) AS valid_to_us,
       CAST(CASE WHEN LEAD(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
            THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM events
WHERE event_type = 'purchase' AND user_id < 30
"""


@register("storage_scd2_history", oracle=_SCD2_SQL)
def storage_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build (round 5): each change row becomes a
    validity interval [ts, next-change ts) via LEAD over (user, time),
    the open-ended current row flagged — how a warehouse dimension tracks
    history without updates-in-place.  The (ts, event_id) compound order
    makes the intervals deterministic under timestamp ties.  One shuffle
    on the entity key, window local to each partition — at 100 TB this
    is the standard snapshot-to-history transform, cost linear in the
    change volume."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rows = ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 30))
    nxt = F.lead("ts").over(w)
    return rows.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).cast("long").alias("is_current"),
    )


_DIFF_SQL = """
WITH base AS (
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price FROM orders),
new_snap AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0
              THEN CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 1.05, 2) AS DOUBLE)
              ELSE CAST(o_totalprice AS DOUBLE) END AS price
  FROM orders WHERE o_orderkey % 7 <> 0
  UNION ALL
  SELECT o_orderkey + 500000000 AS o_orderkey,
         CAST(o_orderkey % 1000 AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 11 = 0),
j AS (
  SELECT COALESCE(b.o_orderkey, n.o_orderkey) AS key,
         CASE WHEN b.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'deleted'
              WHEN b.price <> n.price THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM base b FULL OUTER JOIN new_snap n ON b.o_orderkey = n.o_orderkey)
SELECT change_type, COUNT(*) AS n_rows, CAST(SUM(key) AS BIGINT) AS key_checksum
FROM j GROUP BY change_type
"""


@register("storage_snapshot_diff", oracle=_DIFF_SQL)
def storage_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC derivation (round 5): given two versions of a
    keyed table, classify every key as added / deleted / changed /
    unchanged via one full-outer join on the key — how a lake pipeline
    derives a change feed when upstream republishes full snapshots
    instead of deltas (the inverse of storage_upsert_partitioned, which
    APPLIES a change feed).  The new snapshot is derived deterministically
    from orders: keys %7 deleted, %5 repriced through the decimal ladder,
    %11 re-inserted under offset keys.

    Scale shape: a single key-partitioned shuffle join of the two
    snapshots, aggregate collapses map-side; with both snapshots bucketed
    on the key (operators/bucketing.py) the diff is exchange-free.  The
    changed-row test compares doubles produced by identical expressions,
    so it is exact."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    survivors = base.filter(F.pmod("o_orderkey", F.lit(7)) != 0).select(
        "o_orderkey",
        F.when(
            F.pmod("o_orderkey", F.lit(5)) == 0,
            F.round(F.col("price").cast("decimal(18,2)") * 1.05, 2).cast("double"),
        )
        .otherwise(F.col("price"))
        .alias("price"),
    )
    inserts = orders.filter(F.pmod("o_orderkey", F.lit(11)) == 0).select(
        (F.col("o_orderkey") + 500000000).alias("o_orderkey"),
        F.pmod("o_orderkey", F.lit(1000)).cast("double").alias("price"),
    )
    new_snap = survivors.unionByName(inserts)
    b = base.select(F.col("o_orderkey").alias("bk"), F.col("price").alias("bp"))
    n = new_snap.select(F.col("o_orderkey").alias("nk"), F.col("price").alias("np"))
    j = b.join(n, b.bk == n.nk, "full_outer").select(
        F.coalesce("bk", "nk").alias("key"),
        F.when(F.col("bk").isNull(), F.lit("added"))
        .when(F.col("nk").isNull(), F.lit("deleted"))
        .when(F.col("bp") != F.col("np"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )
    return j.groupBy("change_type").agg(
        F.count("*").alias("n_rows"), F.sum("key").alias("key_checksum")
    )


_TT_SQL = """
WITH v1 AS (
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 3 <> 0),
v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0
              THEN CAST(ROUND(CAST(price AS DECIMAL(18,2)) * 1.1, 2) AS DOUBLE)
              ELSE price END AS price
  FROM v1),
v3 AS (SELECT * FROM v2 WHERE o_orderkey % 7 <> 0),
a1 AS (SELECT 1 AS version, COUNT(*) AS n_rows,
              CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
              CAST(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
                AS total_price FROM v1),
a2 AS (SELECT 2, COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
              CAST(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
       FROM v2),
a3 AS (SELECT 3, COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
              CAST(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
       FROM v3)
SELECT version, n_rows, key_checksum, total_price,
       CAST(3 AS BIGINT) AS n_versions_before,
       CAST(2 AS BIGINT) AS n_versions_after
FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2 UNION ALL SELECT * FROM a3)
"""


@register("storage_time_travel", oracle=_TT_SQL)
def storage_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned table / time travel / vacuum (round 5, ``versioned.py``):
    three commits build successive snapshots — each NEW snapshot's plan
    READS the previous published version (the staging write never
    deletes, so read-while-commit cannot race); every version is then
    read back BY NUMBER and aggregated, vacuum(keep_last=2) reclaims v1,
    and the surviving version count lands in the output.  The oracle
    recomputes all three snapshot aggregates from the raw table.

    What this pins: published versions are immutable (v1's aggregate is
    taken after two further commits), version reads are explicit (no
    silent latest-fallback), vacuum destroys exactly the old tail.  The
    reference's op-2 modify destroys history by design
    (primary_server.c:65 "w+"); this is the lake-side answer."""
    from ..streaming.sources import cleanup, scratch_dir
    from ..versioned import commit_version, list_versions, read_version, vacuum_versions

    orders = load_table(spark, sf_dir, "orders")
    scratch = scratch_dir("timetravel")
    table = f"{scratch}/t"
    try:
        v1 = orders.filter(F.pmod("o_orderkey", F.lit(3)) != 0).select(
            "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
        )
        assert commit_version(v1, table) == 1
        prev = read_version(spark, table, 1)
        v2 = prev.select(
            "o_orderkey",
            F.when(
                F.pmod("o_orderkey", F.lit(5)) == 0,
                F.round(F.col("price").cast("decimal(18,2)") * 1.1, 2).cast("double"),
            )
            .otherwise(F.col("price"))
            .alias("price"),
        )
        assert commit_version(v2, table) == 2
        v3 = read_version(spark, table, 2).filter(F.pmod("o_orderkey", F.lit(7)) != 0)
        assert commit_version(v3, table) == 3

        def agg(version: int) -> DataFrame:
            return read_version(spark, table, version).agg(
                F.lit(version).cast("int").alias("version"),
                F.count("*").alias("n_rows"),
                F.sum("o_orderkey").alias("key_checksum"),
                F.sum(F.col("price").cast("decimal(18,2)"))
                .cast("decimal(38,2)")
                .cast("double")
                .alias("total_price"),
            )

        n_before = len(list_versions(spark, table))
        snap = (
            agg(1).unionByName(agg(2)).unionByName(agg(3)).localCheckpoint(eager=True)
        )
        removed = vacuum_versions(spark, table, keep_last=2)
        assert removed == [1]
        n_after = len(list_versions(spark, table))
        # latest read must survive the vacuum
        assert read_version(spark, table).count() == snap.filter(
            F.col("version") == 3
        ).first()["n_rows"]
        result = snap.select(
            "*",
            F.lit(n_before).cast("long").alias("n_versions_before"),
            F.lit(n_after).cast("long").alias("n_versions_after"),
        ).localCheckpoint(eager=True)
    finally:
        cleanup(scratch)
    return result


_DPP_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
GROUP BY o_orderpriority
"""


@register("storage_dpp_pruned_join", oracle=_DPP_SQL)
def storage_dpp_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (round 5): orders persisted as a
    priority-partitioned table, then joined to a FILTERED dimension of
    priorities — Catalyst injects the dim's post-filter values as a
    runtime IN-subquery on the fact's PARTITION column, so the scan
    reads 2 of 5 partition directories even though the selected
    priorities are only known at run time.  This is THE mechanism that
    makes star-schema joins over date/tenant-partitioned 100 TB facts
    read only the joined slice; `tests/test_storage_plans.py` pins the
    `dynamicpruning` subquery in the physical plan, and this gate pins
    that pruning never changes the answer (oracle = plain filtered
    aggregate)."""
    from ..streaming.sources import cleanup, scratch_dir

    orders = load_table(spark, sf_dir, "orders")
    scratch = scratch_dir("dppgate")
    try:
        orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(
            f"{scratch}/t"
        )
        fact = spark.read.parquet(f"{scratch}/t")
        dim = (
            orders.select("o_orderpriority")
            .distinct()
            .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        )
        result = (
            fact.join(F.broadcast(dim), on="o_orderpriority")
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum("o_orderkey").alias("key_checksum"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        cleanup(scratch)
    return result


_BINFILE_SQL = """
SELECT doc_id,
       md5(text) AS content_md5,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
FROM documents WHERE doc_id % 10 = 0
"""


@register("source_binaryfile_ingest", oracle=_BINFILE_SQL)
def source_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-bytes ingestion via the ``binaryFile`` source (round 5) — the
    entry point a multimodal corpus actually arrives through (a bucket
    of image/audio/doc files, no schema): one doc per staged file,
    re-read as (path, content binary), identity recovered from the
    filename, content proven byte-exact by md5 + byte length against
    the table the files came from.  UTF-8 text bytes make the oracle
    expressible (DuckDB md5/octet_length hash the same bytes); the
    decode stage downstream of this seam is the mm_* gate family.

    The staging loop writes each doc driver-side — bounded: the gate
    slice is 50 files at sf0.01 (a real ingest READS existing files;
    only the fixture needs creating them).  binaryFile scans
    distribute per-file like any other source."""
    import os

    from ..streaming.sources import cleanup, scratch_dir

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.pmod("doc_id", F.lit(10)) == 0)
        .select("doc_id", "text")
    )
    scratch = scratch_dir("binfile")
    try:
        os.makedirs(f"{scratch}/files", exist_ok=True)
        for r in docs.collect():  # bounded: 1/10 of the gate corpus
            with open(f"{scratch}/files/doc_{r['doc_id']}.txt", "wb") as f:
                f.write(r["text"].encode("utf-8"))
        raw = spark.read.format("binaryFile").load(f"{scratch}/files")
        result = raw.select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.txt$", 1)
            .cast("long")
            .alias("doc_id"),
            F.md5("content").alias("content_md5"),
            F.col("length").alias("n_bytes"),
        ).localCheckpoint(eager=True)
    finally:
        cleanup(scratch)
    return result


_EVOLVE_SQL = """
WITH unioned AS (
  SELECT o_orderkey, o_orderpriority, CAST(NULL AS DOUBLE) AS o_discount_rate
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_orderpriority,
         CAST(o_orderkey % 100 AS DOUBLE) / 1000.0 AS o_discount_rate
  FROM orders WHERE o_orderkey % 2 = 1)
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       COUNT(o_discount_rate) AS n_with_rate,
       CAST(CAST(SUM(CAST(o_discount_rate AS DECIMAL(18,6))) AS DECIMAL(38,6))
            AS DOUBLE) AS rate_sum
FROM unioned GROUP BY o_orderpriority
"""


@register("storage_schema_evolution", oracle=_EVOLVE_SQL)
def storage_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on a raw parquet table (round 5): an old batch
    written WITHOUT a column and a new batch written WITH it land in the
    same directory; reading with ``mergeSchema`` reconciles them — old
    rows surface the added column as NULL, and nothing is silently
    dropped or coerced.  The count/COUNT(col)/decimal-sum triple pins
    exactly which rows carry the new column.  This is the append-only
    evolution raw parquet supports (add nullable columns); renames/type
    changes need a table format — documented seam, same boundary
    ``replace_table`` draws for transactions."""
    from ..streaming.sources import cleanup, scratch_dir

    orders = load_table(spark, sf_dir, "orders")
    scratch = scratch_dir("evolvegate")
    try:
        old = orders.filter(F.pmod("o_orderkey", F.lit(2)) == 0).select(
            "o_orderkey", "o_orderpriority"
        )
        new = orders.filter(F.pmod("o_orderkey", F.lit(2)) == 1).select(
            "o_orderkey",
            "o_orderpriority",
            (F.pmod("o_orderkey", F.lit(100)).cast("double") / 1000.0).alias(
                "o_discount_rate"
            ),
        )
        old.write.mode("overwrite").parquet(f"{scratch}/t")
        new.write.mode("append").parquet(f"{scratch}/t")
        back = spark.read.option("mergeSchema", True).parquet(f"{scratch}/t")
        result = (
            back.groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_rows"),
                F.count("o_discount_rate").alias("n_with_rate"),
                F.sum(F.col("o_discount_rate").cast("decimal(18,6)"))
                .cast("decimal(38,6)")
                .cast("double")
                .alias("rate_sum"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        cleanup(scratch)
    return result


_MERGE_CDC_SQL = """
WITH upd AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,2)) + 100, 2) AS DOUBLE) AS c_acctbal,
         'U' AS op
  FROM customer WHERE c_custkey % 10 = 3),
del AS (
  SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal, 'D' AS op
  FROM customer WHERE c_custkey % 10 = 7),
ins AS (
  SELECT c_custkey + 50000000 AS c_custkey, c_nationkey,
         CAST(c_custkey % 500 AS DOUBLE) AS c_acctbal, 'I' AS op
  FROM customer WHERE c_custkey % 100 = 0),
chg AS (SELECT * FROM upd UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins),
merged AS (
  SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
  FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM chg)
  UNION ALL
  SELECT c_custkey, c_nationkey, c_acctbal FROM chg WHERE op <> 'D')
SELECT c_nationkey, COUNT(*) AS n_customers,
       CAST(SUM(c_custkey) AS BIGINT) AS key_checksum,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
         AS balance_total
FROM merged GROUP BY c_nationkey
"""


@register("storage_merge_cdc_batch", oracle=_MERGE_CDC_SQL)
def storage_merge_cdc_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with DELETES (round 6): apply one CDC batch — updates
    (+100 balance on custkey%10==3), tombstone deletes (custkey%10==7),
    inserts (offset keys) — to a parquet snapshot and commit via
    ``sinks.replace_table``.  This is the op the round-5 CDC read-side
    gates (scd_latest / scd2 / snapshot_diff) assumed someone performs:
    the WRITE side of a change-data-capture pipeline, including the
    delete semantics ``storage_upsert_partitioned`` does not exercise
    (a tombstone must remove the base row, not just fail to update it).

    Plan shape: one anti-join of the base against all change keys (the
    single shuffle), union of surviving changes, staged write + swap.
    At 100 TB the anti-join becomes a broadcast of the (slim) CDC key
    set — change batches are small relative to the base by definition —
    and the swap stays one metadata op per partition dir.  The oracle
    recomputes full MERGE semantics in SQL over the same tables; the
    gate aggregates the RE-READ table, so a lost delete, double-applied
    update, or dropped insert flips the hash."""
    from ..sinks import replace_table
    from ..streaming.sources import cleanup, scratch_dir

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", F.col("c_acctbal").cast("double").alias("c_acctbal")
    )
    scratch = scratch_dir("mergecdc")
    try:
        cust.write.mode("overwrite").parquet(f"{scratch}/t")
        base = spark.read.parquet(f"{scratch}/t")
        upd = base.filter(F.pmod("c_custkey", F.lit(10)) == 3).select(
            "c_custkey",
            "c_nationkey",
            F.round(F.col("c_acctbal").cast("decimal(18,2)") + 100, 2)
            .cast("double")
            .alias("c_acctbal"),
            F.lit("U").alias("op"),
        )
        dele = base.filter(F.pmod("c_custkey", F.lit(10)) == 7).select(
            "c_custkey", "c_nationkey", "c_acctbal", F.lit("D").alias("op")
        )
        ins = base.filter(F.pmod("c_custkey", F.lit(100)) == 0).select(
            (F.col("c_custkey") + 50000000).alias("c_custkey"),
            "c_nationkey",
            F.pmod("c_custkey", F.lit(500)).cast("double").alias("c_acctbal"),
            F.lit("I").alias("op"),
        )
        changes = upd.unionByName(dele).unionByName(ins)
        merged = base.join(
            F.broadcast(changes.select("c_custkey")), "c_custkey", "left_anti"
        ).unionByName(changes.filter(F.col("op") != "D").drop("op"))
        replace_table(merged, f"{scratch}/t")
        back = spark.read.parquet(f"{scratch}/t")
        result = (
            back.groupBy("c_nationkey")
            .agg(
                F.count("*").alias("n_customers"),
                F.sum("c_custkey").alias("key_checksum"),
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("decimal(38,2)")
                .cast("double")
                .alias("balance_total"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        cleanup(scratch)
    return result


# -- round 6: zone-map (data-skipping) statistics --------------------------

_ZONEMAP_SQL = """
SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
       COUNT(*) AS n_rows,
       MIN(l_orderkey) AS min_orderkey, MAX(l_orderkey) AS max_orderkey,
       MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
       CAST(MIN(l_shipdate) AS VARCHAR) AS min_shipdate,
       CAST(MAX(l_shipdate) AS VARCHAR) AS max_shipdate
FROM lineitem
GROUP BY 1
"""


@register("storage_zonemap_stats", oracle=_ZONEMAP_SQL)
def storage_zonemap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZONE-MAP construction (round 6): per-zone (ship-year) min/max/
    count statistics — the data-skipping index a lakehouse keeps per
    file/row-group so point and range predicates prune I/O without
    reading data.  This engine already RELIES on zone maps twice
    (parquet row-group stats written tight by the sorted sink,
    sinks.py; partition pruning, storage_dpp_pruned_join); this gate
    makes the index itself a first-class queryable artifact, the way
    Delta/Iceberg expose per-file stats in their manifests.

    One partial-agg scan (year() is a pushdown-friendly projection of
    an existing column); the zone key generalizes to any partition or
    file identifier.  A predicate like l_shipdate >= '1995-01-01'
    skips every zone whose max_shipdate falls below it — the pruning
    decision is a broadcast filter over this (tiny) table."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.year("l_shipdate").cast("long").alias("ship_year")
    ).agg(
        F.count("*").alias("n_rows"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").cast("string").alias("min_shipdate"),
        F.max("l_shipdate").cast("string").alias("max_shipdate"),
    )


# -- round 6: data-quality constraint audit --------------------------------

_CONSTRAINT_SQL = """
SELECT 'orderkey_unique' AS constraint_name,
       COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations
FROM orders
UNION ALL
SELECT 'custkey_fk_customer',
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'totalprice_positive',
       COUNT(*) FILTER (WHERE o_totalprice <= 0) FROM orders
UNION ALL
SELECT 'totalprice_expected_lt_400k',
       COUNT(*) FILTER (WHERE o_totalprice > 400000) FROM orders
UNION ALL
SELECT 'status_enum',
       COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P')) FROM orders
UNION ALL
SELECT 'orderdate_not_null',
       COUNT(*) FILTER (WHERE o_orderdate IS NULL) FROM orders
"""


@register("storage_constraint_audit", oracle=_CONSTRAINT_SQL)
def storage_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-QUALITY CONSTRAINT AUDIT (round 6): declarative
    expectations — key uniqueness, referential integrity, range, enum
    domain, non-null — evaluated in bulk and reported as a violation
    ledger, the contract-checking pass (Deequ/dbt-test-style) a
    training pipeline runs before admitting a batch.  Includes one
    deliberately tight expectation (totalprice < 400k) so the gate
    exercises nonzero violation counts, not just vacuous passes.

    Plan shape: the five scalar checks share ONE scan (conditional
    partial aggregates — count_if and a count-distinct Expand); the FK
    check is a broadcast/shuffle LEFT ANTI join counted map-side.  No
    raw rows move for any check; at 100 TB each constraint stays a
    partial-agg or anti-join reduction."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    scalars = o.agg(
        (F.count("*") - F.count_distinct(F.col("o_orderkey"))).alias(
            "orderkey_unique"
        ),
        F.count_if(F.col("o_totalprice") <= 0).alias("totalprice_positive"),
        F.count_if(F.col("o_totalprice") > 400000).alias(
            "totalprice_expected_lt_400k"
        ),
        F.count_if(~F.col("o_orderstatus").isin("F", "O", "P")).alias(
            "status_enum"
        ),
        F.count_if(F.col("o_orderdate").isNull()).alias("orderdate_not_null"),
    )
    fk = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("custkey_fk_customer").alias("constraint_name"),
            F.col("n").alias("n_violations"),
        )
    )
    names = [
        "orderkey_unique",
        "totalprice_positive",
        "totalprice_expected_lt_400k",
        "status_enum",
        "orderdate_not_null",
    ]
    stack_args = ", ".join(f"'{n}', {n}" for n in names)
    unpivoted = scalars.selectExpr(
        f"stack({len(names)}, {stack_args}) AS (constraint_name, n_violations)"
    )
    return unpivoted.unionAll(fk)


# -- round 6: order-insensitive table checksum -----------------------------

_CHECKSUM_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       bit_xor(CAST('0x' || substr(md5(concat_ws('|',
           CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
           printf('%.2f', l_quantity), printf('%.2f', l_extendedprice),
           l_returnflag, CAST(l_shipdate AS VARCHAR))), 1, 12) AS BIGINT))
         AS xor_checksum
FROM lineitem
GROUP BY l_returnflag
"""


@register("storage_table_checksum", oracle=_CHECKSUM_SQL)
def storage_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-INSENSITIVE TABLE CHECKSUM (round 6): per-group content
    fingerprint = XOR of a 48-bit md5 slice of each row's CANONICAL
    string — the cross-engine replication/migration verifier ("same
    rows on both sides?") that needs no sort, no row transfer, and no
    tolerance rules, because canonicalization (fixed %.2f for doubles,
    ISO dates, '|' separator) is pinned in the fingerprint itself.
    This gate IS its own point: the DuckDB hash-match proves two
    independent engines derive identical table fingerprints.

    XOR (not SUM) is the scale choice: commutative, associative, and
    incapable of overflow at ANY row count, so the partial aggregate
    map-side-combines and the shuffle carries one 8-byte value per
    (partition, group).  Deletions re-verify by XORing the removed
    rows back out — the same trick ledger diff tools use."""
    li = load_table(spark, sf_dir, "lineitem")
    canon = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.format_string("%.2f", F.col("l_quantity")),
        F.format_string("%.2f", F.col("l_extendedprice")),
        F.col("l_returnflag"),
        F.col("l_shipdate").cast("string"),
    )
    h48 = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("long")
    return (
        li.withColumn("h48", h48)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(h48)").alias("xor_checksum"),
        )
    )


@register("storage_zonemap_incremental", oracle=_ZONEMAP_SQL)
def storage_zonemap_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL zone-map maintenance (round 6): the data-skipping
    index of storage_zonemap_stats refreshed the IVM way — per-zone
    stats of an appended delta merged into the materialized base stats
    (count: sum; min: min-of-mins; max: max-of-maxs — every zone-map
    statistic is algebraic, which is WHY lakehouse manifests can keep
    file stats current per-commit instead of rescanning the table).
    The oracle is the full recompute, so the gate proves
    merge(stats(base), stats(delta)) == stats(base ∪ delta) exactly.
    Refresh cost at 100 TB scales with the delta, not history."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.filter(F.pmod("l_orderkey", F.lit(5)) != 0)
    delta = li.filter(F.pmod("l_orderkey", F.lit(5)) == 0)

    def zone_stats(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.year("l_shipdate").cast("long").alias("ship_year")
        ).agg(
            F.count("*").alias("n_rows"),
            F.min("l_orderkey").alias("min_orderkey"),
            F.max("l_orderkey").alias("max_orderkey"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.min(F.col("l_shipdate").cast("string")).alias("min_shipdate"),
            F.max(F.col("l_shipdate").cast("string")).alias("max_shipdate"),
        )

    materialized = zone_stats(base).localCheckpoint(eager=True)  # stored index
    return (
        materialized.unionByName(zone_stats(delta))
        .groupBy("ship_year")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.min("min_orderkey").alias("min_orderkey"),
            F.max("max_orderkey").alias("max_orderkey"),
            F.min("min_price").alias("min_price"),
            F.max("max_price").alias("max_price"),
            F.min("min_shipdate").alias("min_shipdate"),
            F.max("max_shipdate").alias("max_shipdate"),
        )
    )
