"""Streaming funnel tracking with real per-key state (O1/O7 applied to the
behavioral family): each user's funnel progress is a ValueState-sized
(stage, last_ts) pair advanced by a one-directional state machine — the
streaming form of `plans/behavior.py::funnel_counts`, which is its batch
oracle (the same dual-implementation golden methodology as
`streaming/features.py` vs `operators/anomaly.py`).

Semantics: a user completes stage k at the FIRST event of the k-th step
type strictly after their stage-(k-1) completion. With events processed in
per-user event-time order (batches sorted internally; ordered replay
across batches, the resolution-test discipline), the state machine emits
exactly the batch funnel's first-qualifying occurrences, one row per
stage completion — and the per-user state is two longs FOREVER, no
event history (the bounded-state property that makes funnels streamable
at any scale).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.behavior import FUNNEL_STEPS

_STATE_SCHEMA = "stage integer, last_ts long"
_OUT_SCHEMA = "user_id bigint, step integer, step_name string, ts_ms long"


def _make_advance(late_counter=None):
    def _advance(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        stage, last_ts = state.get if state.exists else (0, -1)
        start_last_ts = last_ts
        out = []
        # A large per-user group arrives as MULTIPLE Arrow chunks
        # (maxRecordsPerBatch); event-time order only holds after
        # concatenating the whole group — sorting chunks independently
        # would advance last_ts past events still sitting in a later chunk
        # and silently drop stages.
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        # Ordered-replay violation detector (ADVICE r5): an event strictly
        # before the stage clock held at batch START arrived after this
        # user's state already advanced past it — it could have been a
        # first-qualifying occurrence the state machine can no longer see.
        # (Ties at exactly last_ts can never qualify — the advance is
        # strict — so they are not violations.) Under the documented
        # ordered-replay precondition this count is 0; a broken replay
        # surfaces as a nonzero accumulator instead of a silent undercount.
        n_late = int((pdf["ts_ms"] < start_last_ts).sum())
        if n_late and late_counter is not None:
            late_counter.add(n_late)
        pdf = pdf.sort_values(["ts_ms", "event_type"])
        for row in pdf.itertuples(index=False):
            if stage >= len(FUNNEL_STEPS):
                break
            if row.event_type == FUNNEL_STEPS[stage] and row.ts_ms > last_ts:
                stage += 1
                last_ts = int(row.ts_ms)
                out.append((key[0], stage, FUNNEL_STEPS[stage - 1], last_ts))
        state.update((stage, last_ts))
        yield pd.DataFrame(
            out, columns=["user_id", "step", "step_name", "ts_ms"]
        )

    return _advance


def funnel_stream(events: DataFrame, late_counter=None) -> DataFrame:
    """Per-user stage completions from a streaming events frame carrying
    (user_id, event_type, ts_ms). Pass a SparkContext accumulator as
    ``late_counter`` to count ordered-replay violations (events arriving
    at or before a user's already-advanced stage clock) — 0 on a correct
    replay."""
    return (
        events.select("user_id", "event_type", "ts_ms")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_advance(late_counter),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
