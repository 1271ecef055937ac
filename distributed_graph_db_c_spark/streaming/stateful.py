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


# -- round 13: transformWithState twins ---------------------------------------
#
# Spark 4.1 ships the Python transformWithStateInPandas API surface (the
# r9-r12 standing watch item — previously unshipped), but its RUNTIME is
# still capability-gated here: the TransformWithStateInPySpark driver
# worker speaks protobuf to the JVM state server, and ``google.protobuf``
# is absent in this container (pip-unreachable, same tier class as
# Pillow/soundfile — probed, never assumed; verified r13: the stream
# fails with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE naming the
# protobuf import).  These are SEMANTICALLY IDENTICAL twins of the two
# applyInPandasWithState operators above, expressed as StatefulProcessor
# classes: same per-key state schema, same emissions, pytest-pinned
# equal on the same staged batches wherever the runtime tier is present.
# The gates stay on the applyInPandasWithState form (works everywhere;
# the r9 A/B bounded the tws upside ~10%); the twins make the migration
# a one-line swap once the dependency ships — and transformWithState's
# richer runtime (timers, TTL'd state, list/map state) is where new
# stateful operators should land then.


def tws_runtime_available() -> bool:
    """True when transformWithStateInPandas can actually RUN: the API
    classes import AND the protobuf runtime its driver worker needs is
    present.  Probe, never assume (the multimodal capability-tier
    discipline)."""
    try:
        from google.protobuf import descriptor  # noqa: F401, PLC0415
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401, PLC0415
            StatefulProcessor,
        )
    except ImportError:
        return False
    return True


def _tws():
    """Import guard: the class definitions need the shipped API; keep
    the module importable if a future Spark moves it again."""
    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    return StatefulProcessor, StatefulProcessorHandle


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of :func:`user_running_totals` —
    identical emissions per micro-batch (pytest-pinned)."""
    StatefulProcessor, _ = _tws()

    class _RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            got = self._totals.get() if self._totals.exists() else None
            n, cents = got if got is not None else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int((pdf["value"] * 100).round().astype("int64").sum())
            self._totals.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


def attribution_stream_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of :func:`attribution_stream` —
    identical emissions per micro-batch (pytest-pinned)."""
    StatefulProcessor, _ = _tws()

    class _Attribution(StatefulProcessor):
        def init(self, handle) -> None:
            self._last = handle.getValueState("last_click", ATTRIB_STATE)

        def handleInputRows(self, key, rows, timerValues):
            got = self._last.get() if self._last.exists() else None
            last_ts, last_id = got if got is not None else (None, None)
            out: list[tuple] = []
            changed = False
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"])
                for r in pdf.itertuples():
                    ts_us = r.ts.value // 1000
                    if r.event_type == "click":
                        if last_ts is None or (ts_us, r.event_id) > (
                            last_ts,
                            last_id,
                        ):
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
                self._last.update((last_ts, last_id))
            yield pd.DataFrame(
                {
                    "event_id": pd.array([o[0] for o in out], dtype="Int64"),
                    "user_id": pd.array([o[1] for o in out], dtype="Int64"),
                    "click_id": pd.array([o[2] for o in out], dtype="Int64"),
                    "gap_us": pd.array([o[3] for o in out], dtype="Int64"),
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Attribution(),
        outputStructType=ATTRIB_OUTPUT,
        outputMode="update",
        timeMode="none",
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
