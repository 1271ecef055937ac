"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.2 'UDF surface: absent in reference'; the driver-mandated
stateful-op extension).

Per-user running totals carried across micro-batches: the state is the
(event_count, value_cents) pair, updated per batch, emitted per batch in
Update mode.  Values accumulate in integer CENTS so the running sum is
bit-exact under any batch split / arrival order (double addition is not
associative; the oracle compares against a batch aggregate).

Scale: state lives in the state store partitioned by user_id — the same
hash-shuffle as a batch groupBy; Arrow moves each group's batch rows to
Python in one block, not row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long"
STATE_SCHEMA = "n long, cents long"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_cents": [cents]})


def user_running_totals(events: DataFrame) -> DataFrame:
    """Streaming-only: (user_id, n_events, total_cents) re-emitted every
    micro-batch with cumulative values.  The final emission per user (max
    n_events — counts are monotone) equals the batch groupBy aggregate,
    which is exactly what the oracle checks."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- round 8: streaming last-touch attribution -------------------------------

ATTRIB_OUTPUT = "event_id long, user_id long, click_id long, gap_us long"
ATTRIB_STATE = "last_ts_us long, last_id long"


def _update_attribution(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last_ts, last_id = state.get if state.exists else (None, None)
    out: list[tuple] = []
    changed = False
    for pdf in pdfs:
        # total (ts, event_id) order inside the batch; batches arrive in
        # event-time order (the gate stages them that way), so the state
        # from earlier batches is always strictly older
        pdf = pdf.sort_values(["ts", "event_id"])
        for r in pdf.itertuples():
            ts_us = r.ts.value // 1000  # pandas ns -> exact integer us
            if r.event_type == "click":
                if last_ts is None or (ts_us, r.event_id) > (last_ts, last_id):
                    last_ts, last_id = int(ts_us), int(r.event_id)
                    changed = True
            elif r.event_type == "purchase":
                out.append(
                    (
                        int(r.event_id),
                        int(key[0]),
                        last_id,
                        None if last_ts is None else int(ts_us) - last_ts,
                    )
                )
    if changed:
        state.update((last_ts, last_id))
    yield pd.DataFrame(
        {
            "event_id": pd.array([o[0] for o in out], dtype="Int64"),
            "user_id": pd.array([o[1] for o in out], dtype="Int64"),
            "click_id": pd.array([o[2] for o in out], dtype="Int64"),
            "gap_us": pd.array([o[3] for o in out], dtype="Int64"),
        }
    )


def attribution_stream(events: DataFrame) -> DataFrame:
    """Streaming last-touch attribution: per-user state is the single
    (last_click_ts_us, last_click_id) pair — CONSTANT per user, the
    smallest possible state for this semantics (contrast a
    stream-stream interval join, whose click-side state grows with the
    attribution horizon) — and every purchase is emitted exactly once,
    in the micro-batch it arrives in.  With event-time-ordered batch
    arrival the emissions equal the batch window form
    (rel_events_attribution) row for row: within a batch the rows are
    processed in total (ts, event_id) order, and across batches the
    state is strictly older than everything in the current batch.  The
    per-row Python loop runs per user-batch group (tens of rows) inside
    the Arrow-transferred block."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_attribution,
        outputStructType=ATTRIB_OUTPUT,
        stateStructType=ATTRIB_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
