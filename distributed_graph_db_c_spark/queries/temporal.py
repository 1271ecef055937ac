"""Temporal join queries over the ``events`` stream table.

The reference has no joins at all (SURVEY.md §2.2 — its nearest analogue is
the frontier×adjacency lookup inside BFS, `secondary_server.c:504-537`);
as-of and range joins are part of the extension surface a time-series /
training-data pipeline needs.  Implementations live in
``operators.joins`` — both are single-shuffle compositions of built-in
DataFrame ops, not theta joins.

Oracles are written as correlated subqueries / exact band predicates so the
DuckDB side shares no code path with the Spark side (true differential
testing).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.joins import asof_join, range_join
from ..registry import register
from ..sources.tables import load_table

_ASOF_ORACLE = """
WITH l AS (SELECT * FROM events WHERE event_type = 'purchase')
SELECT r.event_id,
       r.user_id,
       (SELECT epoch_us(l.ts) FROM l
         WHERE l.user_id = r.user_id
           AND (l.ts < r.ts OR (l.ts = r.ts AND l.event_id < r.event_id))
         ORDER BY l.ts DESC, l.event_id DESC LIMIT 1) AS ts_asof_us,
       (SELECT l.value FROM l
         WHERE l.user_id = r.user_id
           AND (l.ts < r.ts OR (l.ts = r.ts AND l.event_id < r.event_id))
         ORDER BY l.ts DESC, l.event_id DESC LIMIT 1) AS value_asof
FROM events r
WHERE r.event_type = 'error'
"""


@register("asof_join_events", oracle=_ASOF_ORACLE)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every 'error' event, the most recent strictly-prior 'purchase'
    by the same user (its timestamp and value; nulls if none).  Spark side:
    union-and-window as-of join — ONE shuffle on user_id.

    ``strict=True`` matches the oracle's strictly-before predicate
    (``l.ts < r.ts OR (l.ts = r.ts AND l.event_id < r.event_id)``) exactly.
    On THIS gate the two tie semantics are unobservable (left/right come
    from disjoint event_id sets of the same table, so full (ts, seq) ties
    cannot occur), but the operator and oracle must still state the same
    contract — tests/test_joins.py pins both semantics on a constructed
    tie."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    errors = events.filter(F.col("event_type") == "error")
    out = asof_join(
        purchases,
        errors,
        on="user_id",
        ts="ts",
        seq="event_id",
        value_cols=["value"],
        strict=True,
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts_asof").alias("ts_asof_us"),
        F.col("value_asof"),
    )


_RANGE_ORACLE = """
SELECT p.user_id,
       p.event_id AS probe_id,
       b.event_id AS build_id,
       epoch_us(b.ts) - epoch_us(p.ts) AS dt_micros
FROM events p JOIN events b
  ON b.user_id = p.user_id AND b.event_id <> p.event_id
 AND abs(epoch_us(b.ts) - epoch_us(p.ts)) <= 300000000
WHERE p.event_type = 'error' AND b.event_type = 'purchase'
"""


@register("range_join_events", oracle=_RANGE_ORACLE)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (error, purchase) event pairs from the same user within a 300 s
    band.  Spark side: bucketized band join — equi-join on
    (user_id, time-bucket) with 3x probe replication, O(n) fan-out instead
    of an O(n^2)-per-key theta join."""
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error")
    purchases = events.filter(F.col("event_type") == "purchase")
    return range_join(errors, purchases, on="user_id", ts="ts", band_seconds=300)


_RESAMPLE_SQL = """
WITH obs AS (
    SELECT user_id AS key, epoch_us(ts) // 14400000000 AS bucket,
           MAX(value) AS v, COUNT(*) AS n_obs
    FROM events GROUP BY 1, 2
),
b AS (SELECT key, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM obs GROUP BY key),
grid AS (SELECT key, unnest(generate_series(b0, b1)) AS bucket FROM b),
j AS (SELECT g.key, g.bucket, o.v, COALESCE(o.n_obs, 0) AS n_obs
      FROM grid g LEFT JOIN obs o USING (key, bucket))
SELECT key, bucket,
       last_value(v IGNORE NULLS) OVER (PARTITION BY key ORDER BY bucket
                                        ROWS UNBOUNDED PRECEDING) AS value,
       n_obs
FROM j
"""


@register("ts_resample_ffill_4h", oracle=_RESAMPLE_SQL)
def ts_resample_ffill_4h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization (operators/timeseries.resample_ffill):
    every user's event stream resampled onto a dense 4-hour grid from
    first to last observation — MAX per bucket, gaps forward-filled,
    n_obs = 0 marking filled rows.  The grid generates distributed
    (sequence+explode per key); the oracle rebuilds it with
    generate_series + IGNORE NULLS last_value.  MAX (not last) per
    bucket keeps the downsample tie-free, so values hash bit-exact."""
    from ..operators.timeseries import resample_ffill

    ev = load_table(spark, sf_dir, "events")
    return resample_ffill(ev, "user_id", "ts", "value", 14_400_000_000)
