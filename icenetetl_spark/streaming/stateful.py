"""Custom stateful streaming operator via ``applyInPandasWithState``:
running per-user aggregates that survive across micro-batches.

This is the Spark primitive for operators the built-in windowed aggs can't
express (per-key accumulators with arbitrary update logic). State lives in
the state store (checkpointed, partitioned by key) — each executor holds only
its keys' state, so state scales horizontally with the cluster, and a
watermark/timeout policy bounds it in unbounded streams.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = "n_events LONG, sum_value DOUBLE"
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Accumulate (count, sum) per user across micro-batches; emit the
    running totals after each batch that touches the key."""
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-user running totals (update semantics)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- gap-based streaming sessionization -----------------------------------
#
# The streaming twin of the batch ev_sessionize / sessionize_two_phase plans
# (SCALING.md's skew table names this as the third sessionize lever): state
# per user is ONE open session (start_s, last_s, n_events) — constant-size
# regardless of how many events the user has produced, so a hot user costs
# O(batch share) per micro-batch instead of serializing a window task over
# their full history. Sessions closed by a >gap_s silence are emitted with
# open=false and leave the state store; the still-open session is re-emitted
# each batch with open=true (update semantics), so a consumer's final row
# per (user_id, session_start_s) converges to the batch answer: closed
# sessions union the final open emission == ev_sessionize's gaps-and-islands
# output on the same events.

SESSION_STATE_SCHEMA = "start_s LONG, last_s LONG, n_events LONG"
SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_s", LongType()),
        StructField("n_events", LongType()),
        StructField("duration_s", LongType()),
        StructField("open", BooleanType()),
    ]
)


def _make_sessionizer(gap_s: int):
    def _sessionize_user(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        ev = pd.concat(pdfs)
        # micro-batches are unordered within themselves; per-user event-time
        # order is what the gap test is defined over
        secs = sorted(
            ev["ts"].astype("datetime64[us]").astype("int64") // 1_000_000
        )
        cur = list(state.get) if state.exists else None
        closed = []
        for t in secs:
            t = int(t)
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] > gap_s:
                closed.append(cur)
                cur = [t, t, 1]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
        state.update(tuple(cur))
        rows = closed + [cur]
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(rows),
                "session_start_s": [r[0] for r in rows],
                "n_events": [r[2] for r in rows],
                "duration_s": [r[1] - r[0] for r in rows],
                "open": [False] * len(closed) + [True],
            }
        )

    return _sessionize_user


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Streaming gap-based sessionization over (user_id, ts) with
    constant-size per-key state. Emits closed sessions (open=false, final)
    and the current open session (open=true, superseded by later emissions
    with the same (user_id, session_start_s)). Cross-batch late data is the
    standard streaming caveat: an event older than the open session's
    last_s - gap_s would belong to an already-closed session; feed the
    stream through a watermark-bounded source if that matters upstream."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_s),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
