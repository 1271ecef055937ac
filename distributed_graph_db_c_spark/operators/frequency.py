"""Mergeable heavy-hitters (frequent items) sketch — Misra–Gries.

The frequent-items question ("which keys exceed an n/k share of 100 TB?")
is the third classic sketch after cardinality (HLL, queries/sketches.py)
and quantiles (percentile_approx): an exact answer needs a full groupBy
shuffle of every distinct key, while a Misra–Gries summary of capacity k
is k rows per partition, merges associatively, and guarantees

    true_count - n/(k+1)  <=  estimate  <=  true_count

for every item (Misra & Gries 1982; merge + re-offset bound from the
"Mergeable Summaries" line of work, Agarwal et al., PODS 2012).  When k
is at least the number of distinct items no decrement ever fires and the
sketch is EXACT — that regime is what the DuckDB-oracle gate pins, while
tests/test_frequency.py pins the error bound and merge invariance in the
lossy regime.

Scale shape (100 TB): one ``mapInPandas`` pass emits <= k summary rows
per input partition (the only Python step, Arrow-batched, dict updates
per batch); the merge is a plain ``groupBy(item).sum`` over
n_partitions * k rows — partial-aggregatable, no driver collect, no
full-key shuffle.  The final re-offset (subtract the (k+1)-th largest
merged weight) is computed from the merged summary itself, which is
small by construction, with one scalar broadcast back across it.

No reference citation: the reference (1,550 LoC of C, SURVEY.md §2.2)
has no aggregation surface; this is driver-mandated extension surface
(SURVEY.md §2.3 sketches family).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def misra_gries(
    df: DataFrame,
    col: str,
    capacity: int = 64,
) -> DataFrame:
    """Frequent-items summary of ``df[col]`` with Misra–Gries capacity
    ``capacity``.

    Returns a DataFrame ``(item string, est_count long, err_ub long)``
    with at most ``capacity`` item rows: ``est_count`` is a LOWER bound
    on the item's true count and ``est_count + err_ub`` an upper bound,
    where ``err_ub`` is the total decrement weight (global, same value
    every row — kept per-row so the result is self-describing after a
    write).  In the lossy regime one extra OUT-OF-BAND row
    ``(item=NULL, est_count=0, err_ub=total)`` carries the error mass
    even when every counter truncates away (see :func:`_retruncate`);
    exact-regime output has no such row.
    Items surviving the sketch are every item whose true count exceeds
    ``err_ub``; when ``capacity`` >= distinct(col), ``err_ub`` is 0 and
    ``est_count`` is exact.

    Nulls are counted under the sentinel item ``"\\x00null"`` (a real
    NULL would conflate with the out-of-band decrement channel, which
    uses null-item rows).  Known caveat: a data value literally equal
    to that token conflates with the null count — acceptable for the
    text/categorical keys this targets; binary keys should be hex-
    encoded first.
    """
    if capacity < 1:
        raise ValueError(f"misra_gries: capacity must be >= 1, got {capacity}")

    src = df.select(F.col(col).cast("string").alias("item"))

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        decremented = 0
        for pdf in batches:
            vc = pdf["item"].fillna("\x00null").value_counts()
            for item, n in vc.items():
                counts[item] = counts.get(item, 0) + int(n)
            # One decrement sweep per Arrow batch amortizes the classic
            # per-row algorithm; correctness is unchanged (decrementing
            # the minimum from every tracked item any time the dict
            # exceeds capacity preserves the MG invariant).
            while len(counts) > capacity:
                # Subtract the (len-capacity)-th smallest weight from every
                # counter and drop the non-positive ones: any one item's
                # counter loses at most `spare`, so the per-item undercount
                # bound grows by `spare` per sweep.
                spare = sorted(counts.values())[len(counts) - capacity - 1]
                decremented += spare
                counts = {k: v - spare for k, v in counts.items() if v > spare}
        out = pd.DataFrame(
            {
                "item": list(counts.keys()),
                "est_count": list(counts.values()),
                "decr": [0] * len(counts),
            }
        )
        # Partition-level decrement weight rides along as one extra row
        # with item=NULL — an OUT-OF-BAND channel no string value can
        # collide with (real nulls were already mapped to the "\x00null"
        # token above, so a null item here is unambiguous).
        if decremented:
            out = pd.concat(
                [out, pd.DataFrame({"item": [None], "est_count": [0], "decr": [decremented]})],
                ignore_index=True,
            )
        yield out

    summaries = src.mapInPandas(
        summarize, schema="item string, est_count long, decr long"
    )
    merged = summaries.groupBy("item").agg(
        F.sum("est_count").alias("est_count"), F.sum("decr").alias("decr")
    )
    items = merged.filter(F.col("item").isNotNull()).select("item", "est_count")
    base_err = merged.filter(F.col("item").isNull()).agg(
        F.coalesce(F.sum("decr"), F.lit(0)).alias("base_err")
    )
    return _retruncate(items, base_err, capacity)


def _retruncate(items: DataFrame, base_err: DataFrame, capacity: int) -> DataFrame:
    """Re-truncate a merged (item, est_count) summary to ``capacity``
    items: subtract the (capacity+1)-th largest weight (0 when fewer
    items survive), which restores the <= capacity size bound and the
    n/(k+1) error bound after a merge (Agarwal et al. 2012, the MG
    merge lemma).  ``base_err`` is a 1-row (base_err long) DataFrame
    carrying the error already accumulated before this merge; the
    subtracted spare adds to it.

    The (capacity+1)-th largest weight is ONE SCALAR, so it is computed
    as ``orderBy.limit(capacity+1)`` (TakeOrderedAndProject — a
    per-partition heap + a bounded merge, never a global sort) followed
    by a conditional min, then broadcast back — the engine's standing
    broadcast-1-row-scalar idiom (r11 verdict item e).  The previous
    unpartitioned ``row_number`` window computed a full rank only to
    read this scalar off row capacity+1 and tripped the
    WindowExec-no-partition warning on every run; a rank is strictly
    more than the semantics need (survivors filter on VALUE, not rank).

    Error mass is ALSO emitted out-of-band: whenever the total error is
    nonzero, one extra row ``(item=NULL, est_count=0, err_ub=total)``
    rides along (mirroring the internal decr channel of
    :func:`misra_gries`).  Without it, a summary whose every counter
    cancels in truncation would ship ZERO rows and silently lose its
    accumulated error — after :func:`merge_summaries` the
    ``est_count + err_ub`` upper bound and the "true > err_ub survives"
    guarantee could then be violated in the lossy streaming regime.  In
    the exact regime (total error 0) the output is unchanged — item
    rows only."""
    # (capacity+1)-th largest est_count == min over the top-(capacity+1)
    # multiset, present only when that many items exist; 0 otherwise.
    top_k1 = items.orderBy(F.col("est_count").desc(), F.col("item")).limit(
        capacity + 1
    )
    kth = top_k1.agg(
        F.when(F.count("*") == capacity + 1, F.min("est_count"))
        .otherwise(F.lit(0))
        .alias("spare")
    )
    # Both scalars come from the (tiny) merged summary — broadcast-join
    # them back on.
    scalars = kth.crossJoin(base_err)
    survivors = (
        items.crossJoin(F.broadcast(scalars))
        .filter(F.col("est_count") > F.col("spare"))
        .select(
            "item",
            (F.col("est_count") - F.col("spare")).alias("est_count"),
            (F.col("base_err") + F.col("spare")).alias("err_ub"),
        )
    )
    err_row = scalars.filter(F.col("base_err") + F.col("spare") > 0).select(
        F.lit(None).cast("string").alias("item"),
        F.lit(0).cast("long").alias("est_count"),
        (F.col("base_err") + F.col("spare")).cast("long").alias("err_ub"),
    )
    return survivors.unionByName(err_row)


def merge_summaries(
    summaries: DataFrame, capacity: int, group_col: str = "batch"
) -> DataFrame:
    """Merge per-group Misra–Gries summaries — rows
    ``(item, est_count, err_ub, <group_col>)`` where ``err_ub`` is
    constant within a group — into one summary with the same schema as
    :func:`misra_gries`.  This is the READ side of the
    summary-per-micro-batch streaming pattern: each batch persists its
    own summary partition idempotently, and this merge (sum counts,
    sum per-group errors, re-truncate) reconstructs the corpus-level
    sketch without ever re-reading raw data.

    A group's error is read from ANY of its rows (err_ub is constant
    within a group, and the out-of-band ``item=NULL`` error row carries
    the same value) — so a group whose summary truncated to zero item
    rows still contributes its accumulated error through the null row
    alone."""
    counts = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est_count").alias("est_count"))
    )
    base_err = (
        summaries.groupBy(group_col)
        .agg(F.max("err_ub").alias("err"))
        .agg(F.coalesce(F.sum("err"), F.lit(0)).alias("base_err"))
    )
    return _retruncate(counts, base_err, capacity)
