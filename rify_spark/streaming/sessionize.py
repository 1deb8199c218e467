"""Stateful streaming sessionization: applyInPandasWithState.

The streaming form of ops/events.sessionize: per-user gap-based sessions
maintained as explicit group state across micro-batches. A session closes
(and is emitted) when an event arrives more than ``gap_min`` minutes after
the previous one; the open session rides in the state store, so sessions
split across micro-batches are stitched correctly.

This is the custom-stateful-operator pattern the engine uses wherever
built-in windowing can't express the semantics: Arrow-batched per-group
pandas, explicit state schema, bounded memory per group.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30

OUTPUT_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "session_start long, session_end long"
)
STATE_SCHEMA = (
    "session_id long, session_start long, last_ts long, n_events long"
)


def _make_fn(gap_s: int):
    def fn(
        key: Tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            session_id, session_start, last_ts, n_events = state.get
        else:
            session_id, session_start, last_ts, n_events = 0, None, None, 0

        closed = []
        # a large group arrives as MULTIPLE Arrow chunks with no global
        # order: accumulate them all, then sort once, so an earlier
        # timestamp in a later chunk can't create a negative gap or a
        # phantom session split.
        chunks = [pdf["ts_epoch"] for pdf in pdf_iter]
        if chunks:
            ts = sorted(int(t) for t in pd.concat(chunks, ignore_index=True))
            for t in ts:
                if last_ts is not None and t - last_ts > gap_s:
                    closed.append(
                        (user_id, session_id, n_events, session_start, last_ts)
                    )
                    session_id += 1
                    session_start, n_events = t, 0
                if session_start is None:
                    session_start = t
                last_ts = t
                n_events += 1

        state.update((session_id, session_start, last_ts, n_events))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_id", "n_events",
                    "session_start", "session_end",
                ],
            )

    return fn


def sessionize_stream(events_stream, gap_min: int = SESSION_GAP_MIN):
    """events stream (user_id, ts_epoch) -> stream of CLOSED sessions.

    The open session per user stays in state until a later event closes it
    (production deployments add a state timeout to flush idle sessions;
    the semantics under test are the cross-batch stitching).
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _make_fn(gap_min * 60),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
