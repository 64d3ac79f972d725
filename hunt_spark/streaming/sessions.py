"""Stateful streaming sessionization — the applyInPandasWithState
custom operator over a live event stream.

Semantics match ``operators/events.sessionize_batch`` (the declarative
replay/backfill twin, pinned by tests/test_streaming_sessions.py):
per user_id, events more than ``gap_minutes`` apart start a new
session; a session is EMITTED when

- a later event of the same user arrives past the gap (closed by the
  data itself), or
- the event-time watermark passes session_end + gap (closed by
  timeout — GroupStateTimeout.EventTimeTimeout), so an idle user's
  last session still flushes once the stream's watermark advances.

State per key is one open session (5 scalars) — bounded regardless of
stream length; the watermark bounds how long it is held.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, start_ts timestamp, end_ts timestamp, "
    "n_events long, value_sum_x100 long"
)
_STATE_SCHEMA = "start long, end long, n long, v long"


def _cents(val: float) -> int:
    """value -> integer cents, half away from zero — matches Spark
    F.round (BigDecimal HALF_UP) and DuckDB round() on doubles, so the
    streaming sum is bit-identical to the batch/oracle integer sum."""
    x = float(val) * 100.0
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _close(start_us: int, end_us: int, n: int, v: int, user_id: int):
    return pd.DataFrame(
        {
            "user_id": pd.Series([user_id], dtype="int64"),
            "start_ts": pd.Series([pd.Timestamp(start_us, unit="us")]),
            "end_ts": pd.Series([pd.Timestamp(end_us, unit="us")]),
            "n_events": pd.Series([n], dtype="int64"),
            "value_sum_x100": pd.Series([v], dtype="int64"),
        }
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """events (ts timestamp, user_id long, value double, ...) ->
    stream of CLOSED sessions."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                s, e, n, v = state.get
                state.remove()
                yield _close(s, e, n, v, user_id)
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = rows["ts"].astype("int64") // 1000  # ns -> us
        vals = rows["value"].to_numpy()
        if state.exists:
            s, e, n, v = state.get
        else:
            s = e = n = v = 0
        out = []
        for t, val in zip(ts_us.to_numpy(), vals):
            t = int(t)
            if n == 0:
                s, e, n, v = t, t, 1, _cents(val)
            elif t - e > gap_us:
                out.append(_close(s, e, n, v, user_id))
                s, e, n, v = t, t, 1, _cents(val)
            else:
                # t can precede e (a late event from an earlier batch,
                # still inside the watermark): bounds only ever widen —
                # rewinding e would shift the gap origin backward and
                # split the session early on the next in-order event,
                # and s must absorb a pre-start late event. A straggler
                # older than s - gap also merges here (conservative:
                # the batch twin would emit it as its own session; the
                # stream cannot, retroactively, without unbounded
                # state). In-order and within-gap-disordered streams
                # match sessionize_batch exactly (pinned by test).
                s, e, n, v = min(s, t), max(e, t), n + 1, v + _cents(val)
        state.update((s, e, n, v))
        # flush the open session once event time passes end + gap
        state.setTimeoutTimestamp((e + gap_us) // 1000 + 1)
        for df in out:
            yield df

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
