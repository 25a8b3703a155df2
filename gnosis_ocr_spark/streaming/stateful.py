"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's closest analog is client-side monotonic progress tracking —
progress never regresses across status polls
(/root/reference/app/static/js/app.js:231-237) and session state is rebuilt
from durable files (app/jobs.py:204-271). Here that becomes a genuinely
streaming stateful operator: per-session running high-water progress with a
processing-time timeout that finalizes idle sessions.

State schema: (hwm INT, n_events LONG). Emits one row per (session, batch)
with the current high-water mark; on timeout emits a final 'closed' row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "session string, progress_hwm int, n_events long, closed boolean"
STATE_SCHEMA = "hwm int, n_events long"


def _make_update(timeout_ms: int | None):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (session,) = key
        if timeout_ms is not None and state.hasTimedOut:
            hwm, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"session": [session], "progress_hwm": [hwm], "n_events": [n],
                 "closed": [True]}
            )
            return
        hwm, n = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf):
                # monotonic: max() over the batch and the carried state (A7)
                hwm = max(hwm, int(pdf["progress"].max()))
                n += len(pdf)
        state.update((hwm, n))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"session": [session], "progress_hwm": [hwm], "n_events": [n],
             "closed": [False]}
        )

    return _update


def running_progress_stream(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """(session string, progress int) stream → stateful high-water output.

    ``timeout_ms`` enables idle-session finalization (emits a closed=True
    row). Leave None for availableNow/backfill runs — pending processing-time
    timeouts keep scheduling micro-batches, which defeats run-to-completion
    triggers."""
    return events.groupBy("session").applyInPandasWithState(
        _make_update(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
