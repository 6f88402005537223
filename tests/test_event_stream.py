"""Watermarked windowed aggregation: batch/stream plan equivalence and
late-data eviction semantics."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from icenetetl_spark.streaming.event_stream import (
    start_windowed_stream,
    windowed_event_counts,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _events(spark, base: datetime, n: int = 60):
    rows = [
        (i, base + timedelta(seconds=30 * i), "click" if i % 2 else "view", float(i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_batch_plan_runs_on_static_frame(spark):
    base = datetime(2024, 1, 1, 12, 0, 0)
    out = windowed_event_counts(_events(spark, base)).collect()
    # 60 events * 30s = 30 min -> 6 windows x 2 types
    assert len(out) == 12
    total = sum(r["n_events"] for r in out)
    assert total == 60
    starts = {r["window_start"].minute for r in out}
    assert starts == {0, 5, 10, 15, 20, 25}


def test_stream_windows_match_batch(spark, tmp_path):
    base = datetime(2024, 1, 1, 12, 0, 0)
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    df = _events(spark, base)
    df.coalesce(1).write.parquet(os.path.join(input_dir, "chunk1"))

    q = start_windowed_stream(
        spark,
        input_dir + "/*/",
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        SCHEMA,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    want = windowed_event_counts(df)
    # append mode emits only watermark-closed windows; every emitted row must
    # exactly match the batch result for its window
    want_map = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in want.collect()
    }
    rows = got.collect()
    assert rows, "stream emitted no closed windows"
    for r in rows:
        key = (r["window_start"], r["event_type"])
        assert want_map[key] == (r["n_events"], r["sum_value"])