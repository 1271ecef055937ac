"""Time-series regularization: resample onto a fixed grid + gap-fill —
the feature-engineering step every training pipeline over event streams
needs (models want dense per-entity sequences; event tables are sparse
and irregular).

``resample_ffill`` is pure DataFrame composition, no UDF:

1. bucket observations to the grid (``unix_micros DIV bucket_us``) and
   aggregate per (key, bucket) — MAX here: deterministic with no
   tie-break ambiguity, bit-exact in any engine (downsample aggregates
   are a parameter in spirit; anything associative slots in);
2. per key, ``sequence(min_bucket, max_bucket)`` + ``explode`` generates
   the dense grid DISTRIBUTED (each key's grid is built where the key's
   bounds row lives — no driver loop, no cross-key data motion);
3. left-join observations onto the grid and forward-fill with
   ``last(value, ignorenulls=True)`` over an unbounded-preceding window.

Shuffle budget: one for the bucket aggregate (slim (key, bucket, agg)
rows — the raw events collapse map-side), one for the per-key fill
window.  Both key on the entity, so a 100 TB event table resamples with
shuffles proportional to (entities x buckets), not events.  Skewed
entities (one key with a huge span) cost one window partition — the
bucket rows are already aggregated, so even a year of seconds is ~31M
slim rows, and coarser grids shrink it linearly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_us: int,
) -> DataFrame:
    """(key, bucket, value, n_obs) on the dense per-key grid: bucket =
    epoch-us DIV ``bucket_us`` from the key's first to last observation;
    value = MAX within the bucket, forward-filled across empty buckets;
    n_obs = observations in the bucket (0 marks a filled gap)."""
    obs = (
        df.select(
            F.col(key_col).alias("key"),
            F.expr(f"unix_micros({ts_col}) DIV {bucket_us}").alias("bucket"),
            F.col(value_col).alias("v"),
        )
        .groupBy("key", "bucket")
        .agg(F.max("v").alias("v"), F.count("*").alias("n_obs"))
    )
    bounds = obs.groupBy("key").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = bounds.select(
        "key", F.explode(F.sequence("b0", "b1")).alias("bucket")
    )
    joined = grid.join(obs, on=["key", "bucket"], how="left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "key",
        "bucket",
        F.last("v", ignorenulls=True).over(w).alias("value"),
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
    )
