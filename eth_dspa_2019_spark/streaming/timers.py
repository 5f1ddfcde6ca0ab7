"""Event-time TIMERS for keyed streaming state — the reference's timer
pattern (PostIdResolver registers an event-time timer and retries
unresolved replies when the watermark passes,
`SN/task/postidresolution/PostIdResolver.java:99-225`) as a native Spark
stateful operator.

The demonstration operator is a keyed SESSION CLOSER: per-user session
state (start, last, count) extends on every event; a gap between events
closes the running session inline; the event-time TIMER closes the
TRAILING session — the case only a timer can handle, because no further
event will ever arrive to observe the gap. Closed sessions are
equality-tested against the batch ``session_window`` semantics in
``tests/test_timers.py``.

API note: Spark 4's ``transformWithStateInPandas`` (value/list/map state +
``registerTimer``) is the designed home for this operator, but its Python
worker requires the ``protobuf`` package, which this container does not
ship — so the implementation below uses ``applyInPandasWithState`` with
``GroupStateTimeout.EventTimeTimeout`` (same engine mechanism: the state
store schedules the key for a callback once the watermark passes the
registered timestamp). The two APIs are semantically interchangeable for
single-value-state + single-timer operators like this one; porting is a
mechanical swap once protobuf is available.

State is one fixed-width row per ACTIVE user (cleared on close), and the
timeout is a per-key singleton — bounded by concurrently-active users,
not stream length, and spillable via the RocksDB state store
(`streaming/windows.py::ROCKSDB_STATE_CONF`).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long"
)
_STATE_SCHEMA = "start_ms long, last_ms long, n long"


def _gap_ms(gap: str) -> int:
    qty, unit = gap.split()
    return int(qty) * {
        "seconds": 1000,
        "minutes": 60_000,
        "hours": 3_600_000,
    }[unit]


def _session_fn(gap_ms: int):
    def fn(
        key, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def closed(start: int, last: int, n: int) -> dict:
            return {
                "user_id": key[0],
                "session_start": start // 1000,
                "session_end": (last + gap_ms) // 1000,
                "n_events": n,
            }

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([closed(start, last, n)])
            return

        ts_ms: list[int] = []
        for pdf in pdf_iter:
            ts_ms.extend(
                int(v) // 1_000_000
                for v in pd.to_datetime(pdf["ts"]).astype("int64")
            )
        ts_ms.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        out: list[dict] = []
        for t in ts_ms:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_ms:
                out.append(closed(start, last, n))
                start, last, n = t, t, 1
            else:
                last = max(last, t)
                n += 1
        if start is not None:
            wm = state.getCurrentWatermarkMs()
            if last + gap_ms <= wm:
                # deadline already behind the watermark: close immediately
                # (setTimeoutTimestamp would reject a past timestamp)
                out.append(closed(start, last, n))
                if state.exists:
                    state.remove()
            else:
                state.update((start, last, n))
                state.setTimeoutTimestamp(last + gap_ms)
        if out:
            yield pd.DataFrame(out)

    return fn


def session_close_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Closed sessions (user_id, session_start, session_end, n_events;
    epoch seconds, end = last event + gap, matching ``session_window``)
    from a streaming frame with ``ts``/``user_id`` columns. Sessions close
    inline when a later event reveals the gap, or by event-time timeout
    once the watermark passes the trailing deadline."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(_gap_ms(gap)),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
