"""Custom stateful streaming operator: gap-based sessionization.

The reference has no stream processing (SURVEY.md §2.9); this is the
engine's template for custom stateful operators the north star requires
(``applyInPandasWithState``): per-key state lives in the state store,
events arrive as Arrow batches, and the operator decides what to emit and
what to carry — the same shape used for streaming entity resolution or
incremental advisory correlation.

Semantics: events for a key belong to one session while consecutive events
are ≤ ``gap_seconds`` apart. Closed sessions are emitted; the open tail
session is carried in state across micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = ("user_id bigint, session_start timestamp, "
                 "session_end timestamp, n_events bigint")
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def sessionize(events: DataFrame, gap_seconds: int = 60,
               key_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Streaming DataFrame of (key, ts, …) → closed-session rows."""
    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state):
        import pandas as pd

        times = []
        for pdf in pdfs:
            times.extend(int(t.value // 1000) for t in pd.to_datetime(pdf[ts_col]))
        times.sort()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        closed = []
        for t in times:
            if last_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us <= gap_us:
                last_us, n = t, n + 1
            else:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = t, t, 1
        if start_us is not None:
            state.update((start_us, last_us, n))
        if closed:
            yield pd.DataFrame({
                "user_id": [key[0]] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
            })

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update, OUTPUT_SCHEMA, STATE_SCHEMA, "append",
            GroupStateTimeout.NoTimeout,
        )
    )
