"""Streaming per-key rate limiting — the stateful spelling of qx163.

Batch qx163 caps each (user, hour) at RATE_LIMIT_N events with a
row_number window; on a live stream the per-window count must carry
across micro-batches. State per user is TWO longs — the hour currently
being counted (epoch micros of its start) and how many events of that
hour have been SEEN — so an hour rollover resets the counter without
per-window keys: state is bounded by the live-user domain, not by
stream length × windows (production adds a GroupState TTL for idle
users).

Admission is deterministic with ts-ordered arrival per key: an event's
slot is its 1-based position within its (user, hour) by (ts, event_id)
— exactly the batch window's row_number — and it survives iff
slot ≤ RATE_LIMIT_N. Wave-slicing invariance of the kernel is
hypothesis-tested; cross-wave carry is pytest-asserted with ts-split
waves; the bounded one-file replay shares qx163's full oracle.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bqfetch_spark.operators.events import RATE_LIMIT_N

OUTPUT_SCHEMA = (
    "event_id bigint, user_id bigint, ts timestamp, slot bigint, window_start timestamp"
)
STATE_SCHEMA = "hour_us long, seen long"

_HOUR_US = 3_600 * 1_000_000


def rate_limit_kernel(
    state: tuple[int, int] | None, pdf: pd.DataFrame
) -> tuple[tuple[int, int] | None, pd.DataFrame]:
    """Pure admission kernel for ONE user's micro-batch (rows any
    order; sorted internally by (ts, event_id)). Returns
    ((hour_us, seen), kept_rows)."""
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    us = pdf["ts"].astype("int64") // 1_000
    hour = (us // _HOUR_US) * _HOUR_US
    # position within each hour of THIS batch
    slot = hour.groupby(hour).cumcount() + 1
    if state is not None:
        prev_hour, prev_seen = state
        slot = slot + (hour == prev_hour) * prev_seen
    keep = slot <= RATE_LIMIT_N
    kept = pdf.loc[keep].copy()
    kept["slot"] = slot[keep].astype("int64")
    kept["window_start"] = pd.to_datetime(hour[keep] * 1_000)
    if len(pdf):
        last_hour = int(hour.iloc[-1])
        seen_last = int((hour == last_hour).sum())
        if state is not None and state[0] == last_hour:
            seen_last += state[1]
        new_state = (last_hour, seen_last)
    else:
        new_state = state
    return new_state, kept


def _rate_limit_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    st = tuple(state.get) if state.exists else None
    batch = pd.concat(list(batches), ignore_index=True)
    new_state, kept = rate_limit_kernel(st, batch)
    if new_state is not None:
        state.update(new_state)
    if len(kept):
        yield kept[["event_id", "user_id", "ts", "slot", "window_start"]]


def rate_limit_stream(events_stream: DataFrame) -> DataFrame:
    """Wire the rate limiter onto a streaming events frame."""
    return events_stream.select("event_id", "user_id", "ts").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _rate_limit_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
