"""Misra–Gries heavy-hitters sketch: exact regime, lossy-regime error
bound, merge (partitioning) invariance, and null handling."""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_graph_db_c_spark.operators.frequency import misra_gries


def _zipf_df(spark, n_items=200, n_rows=20_000, parts=8):
    """Deterministic skewed corpus: item i appears ~ n_rows/(i+1)/H times
    (Zipf-ish), generated engine-side with no RNG."""
    return (
        spark.range(0, n_rows, 1, parts)
        .select(
            # id -> rank via the inverse of the zipf CDF approximated by
            # floor(n_rows/(id+1)) bucketing: maps many ids to item 0,
            # fewer to item 1, etc.  Pure column expr, deterministic.
            F.least(
                F.floor(F.lit(float(n_items)) / (F.col("id") % 1000 + 1)).cast("long"),
                F.lit(n_items - 1),
            )
            .cast("string")
            .alias("item")
        )
    )


def test_exact_regime_matches_groupby(spark):
    df = _zipf_df(spark, n_items=50, n_rows=5_000, parts=4)
    exact = {
        r["item"]: r["n"]
        for r in df.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    # capacity >= distinct: sketch must be exact with err_ub == 0
    got = misra_gries(df, "item", capacity=len(exact)).collect()
    assert {r["item"]: r["est_count"] for r in got} == exact
    assert all(r["err_ub"] == 0 for r in got)


def test_lossy_regime_error_bound_and_coverage(spark):
    df = _zipf_df(spark, n_items=200, n_rows=20_000, parts=8)
    exact = {
        r["item"]: r["n"]
        for r in df.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    n = sum(exact.values())
    k = 16
    rows = misra_gries(df, "item", capacity=k).collect()
    got = [r for r in rows if r["item"] is not None]
    err_rows = [r for r in rows if r["item"] is None]
    assert 0 < len(got) <= k
    err_ub = got[0]["err_ub"]
    assert all(r["err_ub"] == err_ub for r in got)
    # lossy regime: the out-of-band error row rides along with the SAME
    # error mass, so the error survives even a zero-item truncation
    assert [ (r["est_count"], r["err_ub"]) for r in err_rows ] == [(0, err_ub)]
    for r in got:
        true = exact[r["item"]]
        # lower-bound estimate, within the advertised window
        assert r["est_count"] <= true <= r["est_count"] + err_ub
    # every item whose true count exceeds err_ub must survive the sketch
    surviving = {r["item"] for r in got}
    for item, true in exact.items():
        if true > err_ub:
            assert item in surviving, (item, true, err_ub)


def test_merge_invariance_exact_regime(spark):
    base = _zipf_df(spark, n_items=30, n_rows=4_000, parts=1)
    a = misra_gries(base, "item", capacity=40).collect()
    b = misra_gries(base.repartition(13), "item", capacity=40).collect()
    assert sorted((r["item"], r["est_count"]) for r in a) == sorted(
        (r["item"], r["est_count"]) for r in b
    )


def test_null_sentinel(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), (None,), (None,), ("b",)], ["item"]
    )
    got = {r["item"]: r["est_count"] for r in misra_gries(df, "item", 8).collect()}
    assert got == {"a": 2, "b": 1, "\x00null": 3}


def test_merge_summaries_matches_single_pass_exact(spark):
    import pyspark.sql.functions as F

    from distributed_graph_db_c_spark.operators.frequency import merge_summaries

    df = _zipf_df(spark, n_items=40, n_rows=6_000, parts=4)
    whole = {
        (r["item"], r["est_count"])
        for r in misra_gries(df, "item", capacity=64).collect()
    }
    # three "micro-batches" -> per-batch summaries -> merge
    parts = [
        misra_gries(df.filter(F.col("item").cast("long") % 3 == i), "item", 64)
        .withColumn("batch", F.lit(i).cast("long"))
        for i in range(3)
    ]
    summaries = parts[0].unionAll(parts[1]).unionAll(parts[2])
    merged = {
        (r["item"], r["est_count"])
        for r in merge_summaries(summaries, capacity=64).collect()
    }
    assert merged == whole


def test_merge_summaries_lossy_bound(spark):
    import pyspark.sql.functions as F

    from distributed_graph_db_c_spark.operators.frequency import merge_summaries

    df = _zipf_df(spark, n_items=200, n_rows=20_000, parts=8)
    exact = {
        r["item"]: r["n"]
        for r in df.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    k = 12
    parts = [
        misra_gries(df.filter(F.col("item").cast("long") % 2 == i), "item", k)
        .withColumn("batch", F.lit(i).cast("long"))
        for i in range(2)
    ]
    rows = merge_summaries(parts[0].unionAll(parts[1]), capacity=k).collect()
    got = [r for r in rows if r["item"] is not None]
    assert 0 < len(got) <= k
    err_ub = got[0]["err_ub"]
    for r in got:
        true = exact[r["item"]]
        assert r["est_count"] <= true <= r["est_count"] + err_ub


def test_streaming_replay_idempotent(spark, tmp_path):
    """Re-running a micro-batch overwrites its own summary partition, so
    the merged result is unchanged — the at-least-once safety of the
    summary-per-batch pattern."""
    import pyspark.sql.functions as F

    from distributed_graph_db_c_spark.streaming.frequency import (
        incremental_freq_items,
        read_merged_freq_items,
    )

    df = _zipf_df(spark, n_items=30, n_rows=3_000, parts=2)
    state = str(tmp_path / "state")
    handler = incremental_freq_items(state, "item", 64)
    b0 = df.filter(F.col("item").cast("long") % 2 == 0)
    b1 = df.filter(F.col("item").cast("long") % 2 == 1)
    handler(b0, 0)
    handler(b1, 1)
    once = sorted(
        (r["item"], r["est_count"])
        for r in read_merged_freq_items(spark, state, 64).collect()
    )
    handler(b1, 1)  # replayed batch
    twice = sorted(
        (r["item"], r["est_count"])
        for r in read_merged_freq_items(spark, state, 64).collect()
    )
    assert once == twice
    exact = {
        (r["item"], r["n"])
        for r in df.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    assert set(once) == exact


def test_capacity_one_and_empty_input(spark):
    import pyspark.sql.functions as F

    # capacity=1 on a skewed corpus must keep the majority item with a
    # valid bound window
    df = _zipf_df(spark, n_items=50, n_rows=5_000, parts=4)
    exact = {
        r["item"]: r["n"]
        for r in df.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    rows = misra_gries(df, "item", capacity=1).collect()
    got = [r for r in rows if r["item"] is not None]
    assert len(got) <= 1
    for r in got:
        true = exact[r["item"]]
        assert r["est_count"] <= true <= r["est_count"] + r["err_ub"]
    # empty input -> empty summary, no crash
    empty = df.filter(F.lit(False))
    assert misra_gries(empty, "item", capacity=8).collect() == []


def test_merge_single_summary_is_identity(spark):
    import pyspark.sql.functions as F

    from distributed_graph_db_c_spark.operators.frequency import merge_summaries

    df = _zipf_df(spark, n_items=30, n_rows=2_000, parts=2)
    one = misra_gries(df, "item", 64).withColumn("batch", F.lit(0).cast("long"))
    merged = {
        (r["item"], r["est_count"], r["err_ub"])
        for r in merge_summaries(one, capacity=64).collect()
    }
    direct = {
        (r["item"], r["est_count"], r["err_ub"])
        for r in misra_gries(df, "item", 64).collect()
    }
    assert merged == direct


def test_error_mass_survives_zero_item_truncation(spark):
    """ADVICE r6: a summary that truncates to ZERO item rows must still
    propagate its accumulated error.  Construct the degenerate case
    directly against merge_summaries: one group holds only the
    out-of-band error row (its counters all cancelled), the other a
    real item — the merged bound must include BOTH groups' error."""
    from distributed_graph_db_c_spark.operators.frequency import merge_summaries

    rows = [
        # group 0: zero-item summary, error carried out-of-band only
        (None, 0, 7, 0),
        # group 1: one surviving item with its own error
        ("a", 10, 3, 1),
        (None, 0, 3, 1),
    ]
    df = spark.createDataFrame(
        rows, "item string, est_count long, err_ub long, batch long"
    )
    out = merge_summaries(df, capacity=4).collect()
    items = {r["item"]: (r["est_count"], r["err_ub"]) for r in out if r["item"] is not None}
    err_rows = [r for r in out if r["item"] is None]
    # both groups' error mass (7 + 3) must appear in the merged bound
    assert items == {"a": (10, 10)}
    assert [(r["est_count"], r["err_ub"]) for r in err_rows] == [(0, 10)]


def test_zero_item_summary_emits_error_row(spark):
    """End-to-end degenerate lossy case: capacity 1 over a corpus where
    the two tracked values tie exactly — every counter cancels in the
    final sweep and the item set can be empty, but the error row must
    still carry the decrement mass (upper bounds stay valid)."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("a",)] * 8 + [("b",)] * 8, ["item"]
    ).coalesce(1)
    rows = misra_gries(df, "item", capacity=1).collect()
    err_rows = [r for r in rows if r["item"] is None]
    items = [r for r in rows if r["item"] is not None]
    total_err = err_rows[0]["err_ub"] if err_rows else 0
    # the true count of EVERY value must sit inside [est, est+err]:
    # absent items have est=0, so err_ub must cover the full 8
    bounds = {r["item"]: r["est_count"] for r in items}
    for v in ("a", "b"):
        est = bounds.get(v, 0)
        err = items[0]["err_ub"] if v in bounds else total_err
        assert est <= 8 <= est + err, (v, est, err, rows)
