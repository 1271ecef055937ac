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
