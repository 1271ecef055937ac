"""Write-new-then-swap commit helpers (sinks.replace_table /
replace_partitions) — the audited rewrite pattern every in-place rewrite
gate routes through.  The round-4 driver caught the anti-pattern these
replace: overwriting a parquet path with a plan that lazily reads the
same path races the overwrite commit's file deletions."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from distributed_graph_db_c_spark.operators.compaction import compact_in_place
from distributed_graph_db_c_spark.sinks import replace_partitions, replace_table
from distributed_graph_db_c_spark.streaming.sources import cleanup, scratch_dir


@pytest.fixture()
def scratch():
    d = scratch_dir("replacetest")
    yield d
    cleanup(d)


def _seed(spark, path, n=1000):
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 5).cast("string").alias("part"),
        (F.col("id") * 7).alias("val"),
    )
    df.write.mode("overwrite").partitionBy("part").parquet(path)


def test_replace_table_self_read(spark, scratch):
    """The exact round-4 race shape: the replacement plan reads the path
    being replaced.  Staged swap must make it deterministic."""
    path = f"{scratch}/t"
    _seed(spark, path)
    cur = spark.read.parquet(path)
    replace_table(cur.withColumn("val", F.col("val") + 1), path)
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("val")).first()[0] == sum(i * 7 + 1 for i in range(1000))
    # no staging/backup litter
    assert not os.path.exists(path + "__staging__")
    assert not os.path.exists(path + "__old__")


def test_replace_partitions_touches_only_affected(spark, scratch):
    path = f"{scratch}/t"
    _seed(spark, path)

    def files_of(part):
        d = f"{path}/part={part}"
        return {f: os.path.getmtime(f"{d}/{f}") for f in os.listdir(d) if f.endswith(".parquet")}

    before = {p: files_of(p) for p in "01234"}
    cur = spark.read.parquet(path)
    # rewrite only partitions 1 and 3, reading from the table itself
    upd = cur.filter(F.col("part").isin("1", "3")).withColumn("val", F.lit(0).cast("long"))
    replace_partitions(upd, path, ["part"])

    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.filter(F.col("part").isin("1", "3")).agg(F.sum("val")).first()[0] == 0
    untouched = sum(i * 7 for i in range(1000) if i % 5 in (0, 2, 4))
    assert back.filter(~F.col("part").isin("1", "3")).agg(F.sum("val")).first()[0] == untouched
    # untouched partition dirs keep the identical file set (names + mtimes)
    for p in "024":
        assert files_of(p) == before[p]
    for p in "13":
        assert set(files_of(p)) != set(before[p]) or files_of(p) != before[p]
    assert not os.path.exists(path + "__staging__")


def test_replace_partitions_adds_new_partition(spark, scratch):
    path = f"{scratch}/t"
    _seed(spark, path)
    new_rows = spark.range(10).select(
        (F.col("id") + 10_000).alias("id"),
        F.lit("9").alias("part"),
        F.lit(1).cast("long").alias("val"),
    )
    replace_partitions(new_rows, path, ["part"])
    back = spark.read.parquet(path)
    assert back.count() == 1010
    assert back.filter(F.col("part") == "9").count() == 10


def test_reader_sees_old_or_new(spark, scratch):
    """A reader materialized before the swap saw the old table; one after
    sees the new — never a mixture (the swap replaces whole dirs)."""
    path = f"{scratch}/t"
    _seed(spark, path)
    old_sum = spark.read.parquet(path).agg(F.sum("val")).first()[0]
    replace_table(spark.read.parquet(path).withColumn("val", F.col("val") * 2), path)
    new_sum = spark.read.parquet(path).agg(F.sum("val")).first()[0]
    assert new_sum == 2 * old_sum


def test_compact_in_place_roundtrip(spark, scratch):
    path = f"{scratch}/t"
    df = spark.range(5000).select(F.col("id"), (F.col("id") % 97).alias("k"))
    df.repartition(32).write.mode("overwrite").parquet(path)
    n_before, n_after = compact_in_place(spark, path, "id", target_file_bytes=1 << 30)
    assert n_before >= 32 and n_after == 1
    back = spark.read.parquet(path)
    assert back.count() == 5000
    assert back.agg(F.sum("id")).first()[0] == 5000 * 4999 // 2
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 1


# -- round 7: claim-marker discipline on the non-versioned commit path -----


def test_racing_replace_table_one_wins_one_raises(spark, scratch):
    """r6 verdict item 4: two replace_table writers racing the same
    path must never interleave stage/swap silently — one commits, the
    other raises ConcurrentCommitError (mirroring
    test_racing_committers_one_wins_one_raises for commit_version).
    The claim spans the whole stage+swap, so whatever the
    interleaving, the survivor's table is one writer's COMPLETE
    output."""
    import threading

    from distributed_graph_db_c_spark.sinks import ConcurrentCommitError

    path = f"{scratch}/t"
    _seed(spark, path, n=200)
    results: list[object] = [None, None]

    def go(i: int) -> None:
        df = spark.range(5000).select(
            F.col("id"), F.lit(f"w{i}").alias("writer")
        )
        try:
            replace_table(df, path)
            results[i] = "ok"
        except ConcurrentCommitError as exc:
            results[i] = exc

    threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wins = [r for r in results if r == "ok"]
    losses = [r for r in results if isinstance(r, ConcurrentCommitError)]
    # the claim makes a silent double-commit impossible: every writer
    # either commits or raises, and at least one must have won
    assert len(wins) + len(losses) == 2 and len(wins) >= 1, results
    out = spark.read.parquet(path)
    writers = {r["writer"] for r in out.select("writer").distinct().collect()}
    assert len(writers) == 1, f"interleaved output from {writers}"
    assert out.count() == 5000
    # the winner released its claim: a follow-up rewrite succeeds
    replace_table(spark.range(10).select(F.col("id"), F.lit("w9").alias("writer")), path)
    assert spark.read.parquet(path).count() == 10


def test_racing_replace_partitions_one_wins_one_raises(spark, scratch):
    import threading

    from distributed_graph_db_c_spark.sinks import ConcurrentCommitError

    path = f"{scratch}/t"
    _seed(spark, path, n=200)
    results: list[object] = [None, None]

    def go(i: int) -> None:
        df = spark.range(100).select(
            F.col("id"),
            F.lit("0").alias("part"),
            F.lit(i).alias("val"),
        )
        try:
            replace_partitions(df, path, ["part"])
            results[i] = "ok"
        except ConcurrentCommitError as exc:
            results[i] = exc

    threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wins = [r for r in results if r == "ok"]
    losses = [r for r in results if isinstance(r, ConcurrentCommitError)]
    assert len(wins) + len(losses) == 2 and len(wins) >= 1, results
    # partition part=0 is exactly ONE writer's output; others untouched
    p0 = spark.read.parquet(path).filter(F.col("part") == "0")
    assert {r["val"] for r in p0.select("val").distinct().collect()} in ({0}, {1})
    assert p0.count() == 100


def test_replace_table_failure_releases_claim(spark, scratch):
    """An in-process staging failure must release the claim so the next
    writer proceeds — only a CRASHED writer leaves a marker (loudly)."""
    path = f"{scratch}/t"
    _seed(spark, path, n=50)

    @F.udf("long")
    def boom(x):
        raise RuntimeError("injected staging failure")

    bad = spark.range(10).select(boom(F.col("id")).alias("id"))
    with pytest.raises(Exception, match="injected|Job aborted"):
        replace_table(bad, path)
    # claim released -> a clean writer succeeds immediately
    replace_table(spark.range(7).select(F.col("id")), path)
    assert spark.read.parquet(path).count() == 7


def test_standing_claim_marker_fails_loudly_before_writing(spark, scratch):
    """A crashed writer's leftover marker must stop the next writer
    BEFORE it writes anything, naming the marker."""
    from distributed_graph_db_c_spark.sinks import ConcurrentCommitError, _commit_claim

    path = f"{scratch}/t"
    _seed(spark, path, n=50)
    marker = _commit_claim(path)
    open(marker, "w").close()
    with pytest.raises(ConcurrentCommitError, match="__commit__"):
        replace_table(spark.range(3).select(F.col("id")), path)
    # table untouched, no staging left behind
    assert spark.read.parquet(path).count() == 50
    assert not os.path.exists(path + "__staging__")
    os.remove(marker)  # operator clears the dead writer's claim
    replace_table(spark.range(3).select(F.col("id")), path)
    assert spark.read.parquet(path).count() == 3
