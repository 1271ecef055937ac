"""Watermarked window aggregations over the events stream (SURVEY.md §2.2:
absent in the reference — its queue is a transport with no time model;
these are the driver-mandated streaming analytics).

Every builder takes an events-shaped DataFrame — batch OR streaming — and
returns the aggregated frame.  Batch mode is the oracle path (DuckDB
hash-check in queries/streaming.py); streaming mode is exercised by
tests/test_streaming.py with the SAME builder, so the checked semantics
carry over to the streaming plan.

Window starts are emitted as epoch MICROSECONDS (long) — timestamps
compare bit-exactly against the oracle with no format/timezone ambiguity.
Money-ish double sums go through DECIMAL (associative) then cast back.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _maybe_watermark(events: DataFrame, watermark: str | None) -> DataFrame:
    # withWatermark is legal (and inert) on batch frames, but keeping the
    # branch explicit documents that batch callers may pass None.
    return events.withWatermark("ts", watermark) if watermark else events


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str | None = "2 hours"
) -> DataFrame:
    """(window_start_us, event_type, n, total_value): tumbling event-time
    window.  One shuffle on (window, event_type); partial aggregation
    map-side.  Late rows beyond the watermark are dropped in streaming."""
    ev = _maybe_watermark(events, watermark)
    return (
        ev.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "30 minutes",
    slide: str = "15 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """(window_start_us, event_type, n): sliding window — each event lands
    in window/slide overlapping windows (Spark explodes them internally,
    same fan-out the DuckDB oracle writes as an explicit unnest)."""
    ev = _maybe_watermark(events, watermark)
    return (
        ev.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros("w.start").alias("window_start_us"), "event_type", "n")
    )


def session_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = "2 hours"
) -> DataFrame:
    """(user_id, session_start_us, session_end_us, n_events): gap-based
    sessions via the native ``session_window`` operator (dynamic-length
    windows that merge while events arrive within ``gap``).

    session_window's end = last event + gap; emitted here as
    last_event_us so the oracle (lag/cumsum island detection, a completely
    different formulation) compares on observable event times only."""
    ev = _maybe_watermark(events, watermark)
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.unix_micros("first_ts").alias("session_start_us"),
            F.unix_micros("last_ts").alias("session_end_us"),
            "n_events",
        )
    )
