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
