"""Custom join operators the reference (and stock Spark SQL) lack:
as-of join and range join (SURVEY.md §2.2 'joins: absent in reference').

Both are built as compositions of existing DataFrame ops chosen for their
shuffle behavior at scale — not naive theta joins:

- ``asof_join``: the union-and-window formulation.  Tag both sides, union,
  one window pass per key ordered by (ts, seq) carrying the last left-side
  value forward.  ONE shuffle on the key (vs a per-row correlated probe);
  this is how kdb/Flink-style as-of joins are expressed on a batch engine.
- ``range_join``: bucketized band join.  Quantize time into buckets the
  width of the band, replicate each probe row into its 3 adjacent buckets
  (explode), equi-join on (key, bucket), then apply the exact band filter.
  Join fan-out is O(rows x 3) instead of O(rows^2) per key — the standard
  interval-join decomposition (Flink interval joins, Databricks range-join
  hints do the same under the hood).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    seq: str = "event_id",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    strict: bool = False,
) -> DataFrame:
    """For each right row, attach the most recent left row (same ``on``
    key) with (ts, seq) at-or-before the right row's (ts, seq).

    Tie semantics are explicit: with ``strict=False`` (default, kdb-style
    at-or-before) a left row whose (ts, seq) EXACTLY equals the right
    row's counts as prior; with ``strict=True`` (strictly-before) it does
    not.  Either way the tie order is pinned deterministically by the
    ``_is_left`` sort key — without it, output on full (ts, seq) ties
    would depend on shuffle order.

    Returns the right rows plus ``<ts><suffix>`` (and value columns
    suffixed) from the matched left row; nulls when no prior left row.
    """
    value_cols = value_cols or []
    lcols = [ts] + value_cols
    l_tag = left.select(
        on,
        F.col(ts),
        F.col(seq),
        F.lit(1).alias("_is_left"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(ts).alias(f"{ts}{suffix}"),
    )
    r_tag = right.withColumn("_is_left", F.lit(0))
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # at-or-before: left sorts FIRST on a full tie -> inside the prior
    # frame; strictly-before: left sorts LAST -> outside it
    tie_break = F.col("_is_left").asc() if strict else F.col("_is_left").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col(seq), tie_break)
        .rowsBetween(Window.unboundedPreceding, -1)  # prior rows only
    )
    carried = [
        F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in lcols
    ]
    out_cols = [c for c in right.columns]
    return (
        merged.select(*out_cols, F.col("_is_left"), *carried)
        .filter(F.col("_is_left") == 0)
        .drop("_is_left")
    )


def range_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    ts: str = "ts",
    band_seconds: int = 300,
    probe_id: str = "event_id",
    build_id: str = "event_id",
) -> DataFrame:
    """All (probe, build) pairs with the same ``on`` key and
    |build.ts - probe.ts| <= band_seconds (excluding identical ids).

    Bucketized: equi-join on (key, time-bucket) over the probe row
    replicated into its adjacent buckets, exact band filter after.
    """
    bucket = lambda c: F.expr(f"unix_timestamp({c}) DIV {band_seconds}")  # noqa: E731
    p = probe.select(
        F.col(on),
        F.col(probe_id).alias("probe_id"),
        F.col(ts).alias("probe_ts"),
        F.explode(
            F.array(bucket(ts) - 1, bucket(ts), bucket(ts) + 1)
        ).alias("_bucket"),
    )
    b = build.select(
        F.col(on),
        F.col(build_id).alias("build_id"),
        F.col(ts).alias("build_ts"),
        bucket(ts).alias("_bucket"),
    )
    return (
        p.join(b, on=[on, "_bucket"])
        .filter(
            (F.col("build_id") != F.col("probe_id"))
            & (
                F.abs(F.unix_micros("build_ts") - F.unix_micros("probe_ts"))
                <= band_seconds * 1_000_000
            )
        )
        .select(
            on,
            "probe_id",
            "build_id",
            (F.unix_micros("build_ts") - F.unix_micros("probe_ts")).alias("dt_micros"),
        )
        # No distinct needed: |build.ts - probe.ts| <= band implies the build
        # bucket is within +-1 of the probe bucket, so each qualifying pair
        # meets in exactly one of the 3 replicated buckets.
    )
