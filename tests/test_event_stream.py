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

def test_dedup_stream_first_arrival_only(spark, tmp_path):
    """Streaming exact-dedup: duplicates across micro-batches within the
    watermark emit once; output matches batch dropDuplicates on the union."""
    from icenetetl_spark.streaming.event_stream import dedup_stream

    base = datetime(2024, 1, 1, 12, 0, 0)
    doc_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("fingerprint", StringType()),
        ]
    )
    # 2 chunks = 2 micro-batches; fingerprints f0..f9, every one duplicated
    # within and across chunks
    c1 = spark.createDataFrame(
        [(i, base + timedelta(seconds=i), f"f{i % 10}") for i in range(20)],
        doc_schema,
    )
    c2 = spark.createDataFrame(
        [(100 + i, base + timedelta(seconds=60 + i), f"f{i % 10}") for i in range(10)],
        doc_schema,
    )
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    c1.coalesce(1).write.parquet(os.path.join(input_dir, "chunk1"))
    c2.coalesce(1).write.parquet(os.path.join(input_dir, "chunk2"))

    stream = spark.readStream.schema(doc_schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(input_dir + "/*/")
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    fps = [r["fingerprint"] for r in got.select("fingerprint").collect()]
    # exactly one row per distinct fingerprint — same cardinality as the
    # batch twin on the unioned input
    assert sorted(fps) == sorted(f"f{i}" for i in range(10))
    batch_twin = c1.unionByName(c2).dropDuplicates(["fingerprint"])
    assert got.count() == batch_twin.count()


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """The watermarked stream-stream join must produce exactly the batch
    range-join answer once both streams drain (availableNow)."""
    from icenetetl_spark.streaming.event_stream import (
        attribute_events,
        start_attribution_stream,
    )

    join_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    base = datetime(2024, 1, 1, 12, 0, 0)
    # triggers every minute per user; responses 0-7 min later (some outside
    # the 5-minute attribution window, some before any trigger)
    triggers = [
        (100 + i, i % 3, base + timedelta(minutes=i)) for i in range(12)
    ]
    responses = [
        (200 + i, i % 3, base + timedelta(minutes=i, seconds=30 + 60 * (i % 7)))
        for i in range(12)
    ] + [(299, 0, base - timedelta(minutes=1))]
    t_df = spark.createDataFrame(triggers, join_schema)
    r_df = spark.createDataFrame(responses, join_schema)

    batch = sorted(
        map(str, attribute_events(t_df, r_df, max_delay="5 minutes").collect())
    )
    assert batch, "fixture must produce attributions"

    t_dir, r_dir = str(tmp_path / "t"), str(tmp_path / "r")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    t_df.coalesce(1).write.parquet(os.path.join(t_dir, "c1"))
    r_df.coalesce(1).write.parquet(os.path.join(r_dir, "c1"))
    q = start_attribution_stream(
        spark, t_dir + "/*/", r_dir + "/*/", out, ckpt, join_schema
    )
    q.awaitTermination(120)
    streamed = sorted(map(str, spark.read.parquet(out).collect()))
    assert streamed == batch


def test_drift_monitor_flags_shifted_batch_only(spark, tmp_path):
    from icenetetl_spark.streaming.event_stream import start_drift_monitor

    base = datetime(2024, 1, 1, 12, 0, 0)
    input_dir = str(tmp_path / "drift-in")
    os.makedirs(input_dir)

    def _batch(vals, tag):
        rows = [
            (i, base + timedelta(seconds=i), "click", float(v))
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        df.coalesce(1).write.parquet(os.path.join(input_dir, tag))
        return df

    # baseline: uniform over [0, 500)
    baseline = spark.createDataFrame(
        [(i, base, "click", float((i * 37) % 500)) for i in range(400)],
        SCHEMA,
    )
    _batch([float((i * 91) % 500) for i in range(200)], "batch-ok")
    _batch([float(480 + i % 20) for i in range(200)], "batch-shifted")

    q = start_drift_monitor(
        spark,
        input_dir + "/*/",
        baseline,
        report_dir=str(tmp_path / "report"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema=SCHEMA,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    report = spark.read.parquet(str(tmp_path / "report")).collect()
    # one row per (batch, group): two batches, one group
    assert len(report) == 2
    by_drift = {r["drifted"]: r for r in report}
    assert set(by_drift) == {True, False}
    assert by_drift[True]["psi"] > 1.0  # concentrated tail vs uniform
    assert by_drift[False]["psi"] < 0.2
    assert {r["batch_id"] for r in report} == {0, 1}


def test_drift_monitor_restart_is_noop(spark, tmp_path):
    from icenetetl_spark.streaming.event_stream import start_drift_monitor

    base = datetime(2024, 1, 1, 12, 0, 0)
    input_dir = str(tmp_path / "drift-in2")
    os.makedirs(input_dir)
    baseline = spark.createDataFrame(
        [(i, base, "click", float(i % 500)) for i in range(100)], SCHEMA
    )
    df = spark.createDataFrame(
        [(i, base, "click", float(i % 500)) for i in range(50)], SCHEMA
    )
    df.coalesce(1).write.parquet(os.path.join(input_dir, "b0"))

    def _run():
        q = start_drift_monitor(
            spark,
            input_dir + "/*/",
            baseline,
            report_dir=str(tmp_path / "report2"),
            checkpoint_dir=str(tmp_path / "ckpt2"),
            schema=SCHEMA,
        )
        q.awaitTermination(120)

    _run()
    n1 = spark.read.parquet(str(tmp_path / "report2")).count()
    _run()  # restart with no new files: checkpoint replays nothing
    n2 = spark.read.parquet(str(tmp_path / "report2")).count()
    assert n1 == n2 == 1
