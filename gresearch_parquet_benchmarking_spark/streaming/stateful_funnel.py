"""Custom stateful streaming operator: per-user funnel state machine.

The streaming face of operators/analytics.py::event_funnel_conversion —
an unbounded event stream where each user's view→click→purchase
progression must survive micro-batch boundaries. Implemented with
applyInPandasWithState (the engine's second arbitrary-stateful
operator next to streaming/stateful_dedup.py): state is keyed by
user_id and holds three nullable epoch-µs stage timestamps
(first view, first click ≥ view, first purchase ≥ click).

Semantics contract: within a micro-batch the stage timestamps are
computed with the exact min-based batch semantics (vectorized — no
scan-order tie sensitivity); ACROSS batches the machine assumes each
user's events arrive in event-time order (stages only advance), the
standard contract for streaming funnels — an out-of-order deployment
buffers per-user events to the watermark before feeding the machine.
The oracle equality below is exact because the batch-driven harness
delivers the file as one ordered batch.

Scale: state is three BIGINTs per user, hash-partitioned by user_id
across executors; RocksDB state store spills when the user space
outgrows memory (same posture as stateful_dedup).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, v long, c long, p long"
STATE_SCHEMA = "v long, c long, p long"


def _advance(v, c, p, pdf: pd.DataFrame):
    """Exact min-based stage advancement over one batch's events."""
    et, ts = pdf["event_type"], pdf["ts_us"]
    if v is None:
        views = ts[et == "view"]
        if len(views):
            v = int(views.min())
    if v is not None and c is None:
        clicks = ts[(et == "click") & (ts >= v)]
        if len(clicks):
            c = int(clicks.min())
    if c is not None and p is None:
        purchases = ts[(et == "purchase") & (ts >= c)]
        if len(purchases):
            p = int(purchases.min())
    return v, c, p


def _funnel_group(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    v = c = p = None
    if state.exists:
        sv, sc, sp = state.get
        v = None if sv is None else int(sv)
        c = None if sc is None else int(sc)
        p = None if sp is None else int(sp)
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        v, c, p = _advance(v, c, p, pd.concat(chunks))
    state.update((v, c, p))
    yield pd.DataFrame({"user_id": [key[0]], "v": [v], "c": [c], "p": [p]})


def streaming_funnel(stream: DataFrame) -> DataFrame:
    """stream must carry (user_id long, event_type string, ts_us long).
    Emits each user's current (v, c, p) stage timestamps every batch
    the user appears in (update mode)."""
    keyed = stream.select("user_id", "event_type", "ts_us")
    return keyed.groupBy("user_id").applyInPandasWithState(
        _funnel_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
