"""Streaming tests: the window builders and the stateful operator run over
a REAL file stream (2-3 micro-batches via maxFilesPerTrigger=1) and must
produce exactly the batch-mode result — batch mode being the path the
DuckDB oracle gate hash-checks (queries/streaming.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from distributed_graph_db_c_spark.sources.tables import load_table
from distributed_graph_db_c_spark.streaming.sources import (
    cleanup,
    read_file_stream,
    run_available_now,
    scratch_dir,
    stage_stream_dir,
)
from distributed_graph_db_c_spark.streaming.stateful import user_running_totals
from distributed_graph_db_c_spark.streaming.windows import (
    session_stats,
    sliding_counts,
    tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events")


def _stream_result(spark, events, builder, label, n_batches=2, output_mode="complete"):
    scratch = scratch_dir(f"test-{label}")
    try:
        batches = [
            events.filter(F.pmod("event_id", F.lit(n_batches)) == i)
            for i in range(n_batches)
        ]
        in_dir = stage_stream_dir(batches, f"{scratch}/in")
        sev = read_file_stream(spark, in_dir, events.schema)
        name = f"t_{label.replace('-', '_')}"
        run_available_now(
            builder(sev), f"{scratch}/ckpt", query_name=name, output_mode=output_mode
        )
        return spark.table(name).localCheckpoint(eager=True)
    finally:
        cleanup(scratch)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, events):
    got = _stream_result(spark, events, tumbling_counts, "tumble")
    assert _rows(got) == _rows(tumbling_counts(events))


def test_sliding_stream_equals_batch(spark, events):
    got = _stream_result(spark, events, sliding_counts, "slide")
    assert _rows(got) == _rows(sliding_counts(events))


def test_session_stream_equals_batch(spark, events):
    # Session windows must merge across micro-batches: split round-robin so
    # nearly every session has events in both batches.
    got = _stream_result(spark, events, session_stats, "session")
    assert _rows(got) == _rows(session_stats(events))


def test_stateful_totals_accumulate_across_batches(spark, events):
    # Update-mode emissions accumulate; final (max) per user == batch agg.
    upd = _stream_result(
        spark, events, user_running_totals, "stateful", n_batches=3, output_mode="update"
    )
    final = upd.groupBy("user_id").agg(
        F.max("n_events").alias("n"), F.max("total_cents").alias("cents")
    )
    expected = events.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    assert _rows(final) == _rows(expected)
    # and updates genuinely spanned batches: some user must have emitted
    # more than one cumulative row
    multi = upd.groupBy("user_id").count().filter(F.col("count") > 1).count()
    assert multi > 0


def test_stream_dedup_late_replay_stays_exactly_once(spark, events):
    """dropDuplicatesWithinWatermark's two drop reasons compose to
    exactly-once: a replay INSIDE the watermark is dropped as a duplicate;
    a replay arriving AFTER the watermark passed its event time is dropped
    as late (state already reclaimed) — never re-emitted."""
    from datetime import datetime

    from distributed_graph_db_c_spark.streaming.dedup import exact_dedup_stream

    schema = "event_id long, ts timestamp, k string"
    day = lambda n: datetime(2024, 1, 1 + n)
    b0 = spark.createDataFrame([(1, day(0), "A"), (2, day(0), "B")], schema)
    b1 = spark.createDataFrame([(2, day(0), "B-replay"), (3, day(10), "C")], schema)
    b2 = spark.createDataFrame([(1, day(0), "A-late-replay"), (4, day(10), "D")], schema)
    scratch = scratch_dir("test-sdedup-late")
    try:
        in_dir = stage_stream_dir([b0, b1, b2], f"{scratch}/in")
        sev = read_file_stream(spark, in_dir, b0.schema)
        run_available_now(
            exact_dedup_stream(sev, watermark="1 day"),
            f"{scratch}/ckpt",
            query_name="t_sdedup_late",
            output_mode="append",
        )
        got = sorted(
            (r["event_id"], r["k"]) for r in spark.table("t_sdedup_late").collect()
        )
    finally:
        cleanup(scratch)
    # each event_id exactly once, always the FIRST arrival's payload
    assert got == [(1, "A"), (2, "B"), (3, "C"), (4, "D")]


def test_request_server_online_loop(spark):
    """The long-running interactive server (processingTime trigger): submit
    op-1 add + op-4 BFS while the query stays up, read the reply by seq
    (mtype=1000*seq correlation), then op-2 modify + op-4 again — the
    second reply must reflect the replaced graph."""
    from distributed_graph_db_c_spark.catalog import GraphCatalog
    from distributed_graph_db_c_spark.streaming.requests import RequestServer

    scratch = scratch_dir("test-reqserver")
    server = None
    try:
        cat = GraphCatalog(spark, f"{scratch}/catalog")
        server = RequestServer(spark, cat, f"{scratch}/server")

        # chain 1-2-3 (edges stored one direction; dispatcher symmetrizes)
        server.submit(
            [
                (1, 1, 5, [1, 2, 3], [(1, 2), (2, 3)], None),
                (2, 4, 5, None, None, 1),  # BFS from 1
            ]
        )
        r1 = {
            row["id"]: row["level"]
            for row in server.await_reply(2).collect()
        }
        assert r1 == {1: 0, 2: 1, 3: 2}
        assert server.query.isActive  # still serving

        # op 2: full replace with star 1-2, 1-3, 1-4; BFS again
        server.submit(
            [
                (3, 2, 5, [1, 2, 3, 4], [(1, 2), (1, 3), (1, 4)], None),
                (4, 4, 5, None, None, 1),
            ]
        )
        r2 = {
            row["id"]: row["level"]
            for row in server.await_reply(4).collect()
        }
        assert r2 == {1: 0, 2: 1, 3: 1, 4: 1}
        assert server.query.isActive
        # first reply still addressable after the second completed
        assert len(server.await_reply(2).collect()) == 3

        # op 3 (DFS leaf report) against the live star graph: leaves are
        # the spokes, the non-isolated start excluded
        server.submit([(5, 3, 5, None, None, 1)])
        r3 = {row["id"] for row in server.await_reply(5).collect()}
        assert r3 == {2, 3, 4}
    finally:
        if server is not None:
            server.stop()
        cleanup(scratch)


def test_incremental_minhash_equals_batch(spark):
    """The streaming LSH index must find EXACTLY the batch operator's
    pairs regardless of batch boundaries, and a replayed (duplicate)
    micro-batch must not change the distinct pair set (at-least-once
    sink + deterministic values)."""
    from distributed_graph_db_c_spark.operators.dedup import minhash_dedup_pairs
    from distributed_graph_db_c_spark.streaming.dedup import (
        PAIRS_DDL,
        incremental_minhash_dedup,
    )

    docs = load_table(spark, SF_DIR, "documents")
    expected = _rows(minhash_dedup_pairs(docs, threshold=0.8))
    assert expected, "gate corpus must contain near-dup pairs"

    scratch = scratch_dir("test-sminhash")
    try:
        batches = [docs.filter(F.pmod("doc_id", F.lit(3)) == i) for i in range(3)]
        in_dir = stage_stream_dir(batches, f"{scratch}/in")
        sdocs = read_file_stream(spark, in_dir, docs.schema)
        run_available_now(
            sdocs,
            f"{scratch}/ckpt",
            foreach_batch=incremental_minhash_dedup(
                f"{scratch}/index", f"{scratch}/pairs"
            ),
        )
        got = _rows(
            spark.read.schema(PAIRS_DDL).parquet(f"{scratch}/pairs").distinct()
        )
        assert got == expected

        # replay batch 1 by hand (the retry scenario): appended rows are
        # exact duplicates, so the distinct set is unchanged
        handler = incremental_minhash_dedup(f"{scratch}/index", f"{scratch}/pairs")
        handler(batches[1], 99)
        replayed = _rows(
            spark.read.schema(PAIRS_DDL).parquet(f"{scratch}/pairs").distinct()
        )
        assert replayed == expected
    finally:
        cleanup(scratch)


def test_continuous_index_dedup_equals_batch_and_converges_with_nightly(spark):
    """The DURABLE-index streaming form (continuous_index_dedup): the
    accumulated distinct pair set must equal the batch operator's over
    the whole corpus; the stream must leave the engine's real
    generation/segment index behind (bootstrap build + one append
    segment per later batch, retrain ledger live); a replayed batch —
    BOTH the crash-before-publish and crash-after-publish shapes — must
    not change the distinct set; and a NIGHTLY batch must be able to
    screen against the stream-built index directly (one index, two
    cadences)."""
    from distributed_graph_db_c_spark.operators.bucketing import index_drop_all
    from distributed_graph_db_c_spark.operators.dedup import (
        _index_claim,
        incremental_dedup_pairs,
        minhash_dedup_pairs,
        minhash_index_status,
    )
    from distributed_graph_db_c_spark.sinks import _hadoop_fs
    from distributed_graph_db_c_spark.streaming.dedup import (
        PAIRS_DDL,
        continuous_index_dedup,
    )

    docs = load_table(spark, SF_DIR, "documents")
    expected = _rows(minhash_dedup_pairs(docs, threshold=0.8))
    assert expected, "gate corpus must contain near-dup pairs"

    prefix = "contdedup_t"
    index_drop_all(spark, prefix, ("_bands", "_shingles"))
    scratch = scratch_dir("test-contdedup")
    try:
        batches = [docs.filter(F.pmod("doc_id", F.lit(3)) == i) for i in range(3)]
        in_dir = stage_stream_dir(batches, f"{scratch}/in")
        sdocs = read_file_stream(spark, in_dir, docs.schema)
        run_available_now(
            sdocs,
            f"{scratch}/ckpt",
            foreach_batch=continuous_index_dedup(prefix, f"{scratch}/pairs"),
        )
        got = _rows(
            spark.read.schema(PAIRS_DDL).parquet(f"{scratch}/pairs").distinct()
        )
        assert got == expected
        # the stream left the REAL index: generation 1 (batch 0's
        # bootstrap) + 2 append segments (batches 1, 2), ledger live
        st = minhash_index_status(spark, prefix)
        assert (st["generation"], st["segments"]) == (1, [1, 2])
        assert st["base_rows"] + st["appended_rows"] == docs.count()

        # crash-AFTER-publish replay: batch 1 is fully committed (its
        # segment published); the up-front classification sees every id
        # indexed, rewrites exact-duplicate rows, skips the append
        handler = continuous_index_dedup(prefix, f"{scratch}/pairs")
        handler(batches[1], 99)
        assert minhash_index_status(spark, prefix)["segments"] == [1, 2]
        assert _rows(
            spark.read.schema(PAIRS_DDL).parquet(f"{scratch}/pairs").distinct()
        ) == expected

        # PARTIAL id overlap is NOT a replay — it is id reuse across
        # batches and must stay loud (the replay swallow verifies the
        # overlap is total before treating the refusal as benign)
        mixed = batches[1].select("doc_id", "text").limit(3).unionByName(
            docs.select((F.col("doc_id") + 9_000_000).alias("doc_id"), "text")
            .limit(2)
        )
        with pytest.raises(ValueError, match="id REUSE"):
            handler(mixed, 100)
        assert minhash_index_status(spark, prefix)["segments"] == [1, 2]
        # ADVICE r13: the refusal must land BEFORE the pairs write — the
        # mixed batch's 2 genuinely-new near-dup docs would pair against
        # the index, and those rows duplicate NO committed rows, so had
        # they been written distinct() could never remove them and the
        # accumulated set would diverge from the oracle permanently
        assert _rows(
            spark.read.schema(PAIRS_DDL).parquet(f"{scratch}/pairs").distinct()
        ) == expected

        # one index, two cadences: the nightly batch job screens a new
        # delta against the STREAM-built index state directly
        night = docs.filter(F.pmod("doc_id", F.lit(3)) == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
        pairs = incremental_dedup_pairs(night, prefix, threshold=0.8)
        assert pairs.count() > 0  # shifted copies pair with originals at 1.0
    finally:
        index_drop_all(spark, prefix, ("_bands", "_shingles"))
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = _hadoop_fs(spark, warehouse)
        fs.delete(jpath(_index_claim(warehouse, prefix)), False)
        cleanup(scratch)


def test_watermark_late_filter_lags_one_batch(spark, tmp_path):
    """Pins the empirical late-data contract stream_watermark_late_drop
    depends on: the late filter uses the watermark committed as of the
    PREVIOUS batch, so a late row one batch after its window was passed
    still lands (resurrecting evicted state), while a late row TWO
    batches on is dropped.  If a Spark upgrade tightens this to same-
    batch filtering, this test fails and the gate's batch layout (late
    slice in batch 3) still holds — but the docstring should be updated."""
    import datetime as dt

    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    from distributed_graph_db_c_spark.streaming.sources import (
        cleanup,
        run_available_now,
        scratch_dir,
        stage_stream_dir,
    )

    schema = StructType(
        [StructField("ts", TimestampType()), StructField("v", LongType())]
    )
    T = dt.datetime(2024, 1, 1)
    m = lambda mins: T + dt.timedelta(minutes=mins)  # noqa: E731
    mk = lambda rows: spark.createDataFrame(rows, schema)  # noqa: E731
    scratch = scratch_dir("wmlag")
    try:
        batches = [
            mk([(m(100), 1), (m(101), 2)]),
            mk([(m(102), 3)]),
            mk([(T, 10), (m(200), 4)]),  # T's window passed 2 batches ago
        ]
        in_dir = stage_stream_dir(batches, f"{scratch}/in")
        sev = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        agg = (
            sev.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.sum("v").alias("s"))
        )
        run_available_now(
            agg, f"{scratch}/ckpt", query_name="wmlag", output_mode="append"
        )
        rows = {r["w"]["start"]: r["s"] for r in spark.table("wmlag").collect()}
        # the late row at T was dropped: its window never appears
        assert T not in rows, rows
        # the on-time rows all aggregated into the 01:40 window
        assert rows[m(100)] == 1 + 2 + 3
    finally:
        cleanup(scratch)
