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


_ROLLING_SQL = """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1)
SELECT CAST(day AS BIGINT) AS day,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(CAST(rev AS DECIMAL(38,2)) AS DOUBLE) AS revenue_day,
       CAST(CAST(SUM(rev) OVER (ORDER BY day
                                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS DECIMAL(38,2)) AS DOUBLE) AS revenue_7d
FROM daily
"""


@register("ts_rolling_7d_revenue", oracle=_ROLLING_SQL)
def ts_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed rolling aggregate (round 5): daily order revenue with
    a trailing-7-calendar-day rolling sum.  The frame is VALUE-based
    (rangeBetween on epoch-day), not row-based — calendar gaps contribute
    nothing, which a ROWS frame would get wrong.  Revenue rides the
    decimal ladder to the final cast so the rolling sums hash bit-exact.

    Scale shape: the raw table first collapses to one row per day
    (map-side partial agg), so the unpartitioned window orders only
    ~years x 365 rows — bounded by the calendar, not the data; the same
    plan at 100 TB still windows thousands of rows, never billions.  A
    per-entity rolling window would partition by the entity key instead
    (the ts_resample_ffill_4h shape)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).cast("long").alias("day")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
    )
    # INTENTIONALLY unpartitioned: the RANGE frame runs over the daily
    # rollup (calendar-bounded — thousands of rows at 100 TB, never
    # billions) and a trailing-calendar-window is a total date order —
    # the WindowExec no-partition warning is expected here (r11 sweep).
    w = Window.orderBy("day").rangeBetween(-6, 0)
    return daily.select(
        "day",
        "n_orders",
        F.col("rev").cast("decimal(38,2)").cast("double").alias("revenue_day"),
        F.sum("rev").over(w).cast("decimal(38,2)").cast("double").alias("revenue_7d"),
    )


_ZSCORE_SQL = """
WITH st AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS s,
         SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
             AS DECIMAL(38,12))) AS q
  FROM events GROUP BY 1)
SELECT e.event_id, e.event_type, e.value,
       round((e.value - CAST(st.s AS DOUBLE) / st.n)
         / sqrt(CAST(st.q AS DOUBLE) / st.n
                - (CAST(st.s AS DOUBLE) / st.n) * (CAST(st.s AS DOUBLE) / st.n)), 6)
         AS z
FROM events e JOIN st USING (event_type)
WHERE CAST(st.q AS DOUBLE) / st.n
      - (CAST(st.s AS DOUBLE) / st.n) * (CAST(st.s AS DOUBLE) / st.n) > 0
  AND abs((e.value - CAST(st.s AS DOUBLE) / st.n)
          / sqrt(CAST(st.q AS DOUBLE) / st.n
                 - (CAST(st.s AS DOUBLE) / st.n) * (CAST(st.s AS DOUBLE) / st.n)))
      > 2.5
"""


@register("ts_zscore_outliers", oracle=_ZSCORE_SQL)
def ts_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection (round 5): events whose value is more
    than 2.5 population standard deviations from their event_type's mean.
    The moments (n, sum, sum-of-squares) ride the decimal ladder — exact
    regardless of partitioning; the z itself is double math whose last
    bit is engine-dependent (observed 1-ulp drift vs DuckDB), so the
    OUTPUT z is rounded to 6 decimals on both sides while the 2.5-sigma
    filter uses the raw value.  Spark side: one map-side partial agg to
    5 moment rows, broadcast back over the stream — no second shuffle of
    the events."""
    ev = load_table(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(18,6)")
    st = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(vdec).alias("s"),
        F.sum((vdec * vdec).cast("decimal(38,12)")).alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    z = (F.col("value") - mean) / F.sqrt(
        F.col("q").cast("double") / F.col("n") - mean * mean
    )
    variance = F.col("q").cast("double") / F.col("n") - mean * mean
    return (
        ev.join(F.broadcast(st), "event_type")
        # zero-variance guard, mirrored in the oracle: without it a
        # degenerate group diverges across engines (Spark's non-ANSI
        # x/0.0 is NULL and the rows silently drop; DuckDB's IEEE
        # division is ±inf and the rows stay)
        .filter((variance > 0) & (F.abs(z) > 2.5))
        .select("event_id", "event_type", "value", F.round(z, 6).alias("z"))
    )


_INTERP_SQL = """
WITH obs AS (
    SELECT user_id AS key, epoch_us(ts) // 14400000000 AS bucket,
           MAX(value) AS v, COUNT(*) AS n_obs
    FROM events GROUP BY 1, 2
),
b AS (SELECT key, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM obs GROUP BY key),
grid AS (SELECT key, unnest(generate_series(b0, b1)) AS bucket FROM b),
j AS (SELECT g.key, g.bucket, o.v, COALESCE(o.n_obs, 0) AS n_obs,
             CASE WHEN o.v IS NOT NULL THEN g.bucket END AS ob
      FROM grid g LEFT JOIN obs o USING (key, bucket)),
f AS (SELECT key, bucket, v, n_obs,
             last_value(v IGNORE NULLS) OVER wb AS prev_v,
             last_value(ob IGNORE NULLS) OVER wb AS prev_b,
             first_value(v IGNORE NULLS) OVER wf AS next_v,
             first_value(ob IGNORE NULLS) OVER wf AS next_b
      FROM j
      WINDOW wb AS (PARTITION BY key ORDER BY bucket ROWS UNBOUNDED PRECEDING),
             wf AS (PARTITION BY key ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT key, bucket,
       CASE WHEN v IS NOT NULL THEN v
            ELSE prev_v + (next_v - prev_v)
                 * (CAST(bucket - prev_b AS DOUBLE) / CAST(next_b - prev_b AS DOUBLE))
       END AS value,
       n_obs
FROM f
"""


@register("ts_interpolate_linear", oracle=_INTERP_SQL)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resample (round 5): every user's event stream
    on the dense 4-hour grid, gaps filled by linear interpolation between
    the surrounding observations — the continuous-signal complement to
    ts_resample_ffill_4h's step fill (operators/timeseries.resample_interpolate).

    Hash-exactness: the fill value is prev + (next-prev) * (Δb/Δspan) with
    the SAME expression tree on both sides — three correctly-rounded IEEE
    double ops on identical inputs are bit-identical in any engine, so no
    output rounding is needed.  The Spark side is SEGMENT-based (one LEAD
    window over slim observation rows, gaps exploded map-side with both
    endpoints in hand); the oracle deliberately takes the other route —
    dense grid + IGNORE NULLS windows — so the two formulations check
    each other."""
    from ..operators.timeseries import resample_interpolate

    ev = load_table(spark, sf_dir, "events")
    return resample_interpolate(ev, "user_id", "ts", "value", 14_400_000_000)


def _ewma_sql(k: int = 8, alpha: float = 0.5) -> str:
    """Generated LAG-chain EWMA with the same left-associative term order
    as the Spark side — doubles bit-identical."""
    num = []
    den = []
    for j in range(k):
        w = alpha ** j
        x = "value" if j == 0 else f"LAG(value, {j}) OVER w"
        num.append(f"CASE WHEN {x} IS NULL THEN 0.0 ELSE {x} * {w!r} END")
        den.append(f"CASE WHEN {x} IS NULL THEN 0.0 ELSE {w!r} END")
    num_chain, den_chain = num[0], den[0]
    for t in num[1:]:
        num_chain = f"({num_chain} + {t})"
    for t in den[1:]:
        den_chain = f"({den_chain} + {t})"
    return f"""
SELECT event_id, user_id, ({num_chain}) / ({den_chain}) AS ewma8
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("ts_ewma8_value", oracle=_ewma_sql())
def ts_ewma8_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated EWMA (round 5): per user, the exponentially weighted
    moving average of the last 8 observations (alpha=0.5, weights
    renormalized over the terms actually present near the series head) —
    the recursive EWMA y_t = a·x + (1-a)·y_{t-1} is not a closed-form
    window, but its 8-term truncation (residual weight 0.4%) IS: a
    codegen LAG chain over one per-key sort, the standard smoothing
    feature a training pipeline derives per entity.

    Bit-exactness: weights are powers of 1/2 (exact binary), and both
    sides evaluate the SAME left-associated chain of fused terms, so the
    division inputs are IEEE-identical — no rounding needed.  One
    shuffle (the per-user window); at 100 TB cost is the sort, exactly
    like every other per-entity window here."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for j in range(8):
        wt = 0.5 ** j
        x = F.col("value") if j == 0 else F.lag("value", j).over(w)
        t_num = F.when(x.isNull(), F.lit(0.0)).otherwise(x * wt)
        t_den = F.when(x.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
        num = t_num if num is None else num + t_num
        den = t_den if den is None else den + t_den
    return ev.select("event_id", "user_id", (num / den).alias("ewma8"))


# -- round 8: time-weighted average ------------------------------------------

_TWA_SQL = """
WITH iv AS (
  SELECT user_id,
         CAST(value AS DECIMAL(18,6)) AS v,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dt_us
  FROM events)
SELECT user_id,
       COUNT(*) AS n_intervals,
       CAST(SUM(dt_us) AS BIGINT) AS span_us,
       round(CAST(SUM(CAST(v * dt_us AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(CAST(SUM(dt_us) AS BIGINT) AS DOUBLE), 9) AS twa
FROM iv WHERE dt_us IS NOT NULL
GROUP BY user_id
"""


@register("ts_time_weighted_avg", oracle=_TWA_SQL)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED AVERAGE per user (round 8): each observation holds
    its value until the next one (step interpolation), so the mean is
    sum(value * dt) / sum(dt) — the correct average for irregular
    telemetry, where the naive row mean over-weights chatty periods.
    The sensor/metrics aggregate every monitoring stack keys on.

    Bit-exactness: dt rides EXACT integer microseconds (epoch_us of a
    LEAD over the total (ts, event_id) order), the weighted sum rides
    the decimal ladder (DECIMAL(18,6) value x BIGINT dt, summed at
    (38,6)); the one engine seam is the ~20-significant-digit
    decimal -> double conversion (not correctly rounded identically on
    both engines — observed one-ULP drift), so the quotient is rounded
    to 9 decimals on BOTH sides.  Scale: one per-user window
    sort plus a partial-agg groupBy, the per-entity-window class every
    ts_ gate shares; users with a single event carry no interval and
    drop out on both sides."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt_us = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    iv = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
        dt_us.alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return iv.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum("dt_us").alias("span_us"),
        F.round(
            F.sum((F.col("v") * F.col("dt_us")).cast("decimal(38,6)")).cast("double")
            / F.sum("dt_us").cast("double"),
            9,
        ).alias("twa"),
    )
