"""applyInPandasWithState: state persists across micro-batches."""

from __future__ import annotations

import os

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from icenetetl_spark.streaming.stateful import running_user_totals

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def test_state_accumulates_across_batches(spark, tmp_path):
    from datetime import datetime

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    t0 = datetime(2024, 1, 1)
    # two chunks; maxFilesPerTrigger=1 forces two micro-batches
    spark.createDataFrame(
        [(1, t0, 10.0), (1, t0, 5.0), (2, t0, 1.0)], SCHEMA
    ).coalesce(1).write.parquet(os.path.join(input_dir, "c1"))
    spark.createDataFrame(
        [(1, t0, 2.0), (3, t0, 7.0)], SCHEMA
    ).coalesce(1).write.parquet(os.path.join(input_dir, "c2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir + "/*/")
    )
    out_rows = []

    def sink(df, batch_id):
        out_rows.extend((r["user_id"], r["n_events"], r["sum_value"]) for r in df.collect())

    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # final emission per user must be the cross-batch cumulative total
    final = {}
    for u, n, s in out_rows:
        final[u] = (n, s)
    assert final[1] == (3, 17.0)  # 2 events in batch1 + 1 in batch2
    assert final[2] == (1, 1.0)
    assert final[3] == (1, 7.0)
    # user 1 must have emitted an intermediate (2, 15.0) before the final
    assert (1, 2, 15.0) in out_rows


def test_sessionize_stream_matches_batch_gaps_and_islands(spark, tmp_path):
    """Streaming sessionize (constant-size per-user state) must converge to
    the batch ev_sessionize answer: closed emissions + the FINAL open
    emission per user == the gaps-and-islands sessions over the union of
    all micro-batches. Real fixture events, split into 3 time-ordered
    micro-batches so sessions span batch boundaries."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from icenetetl_spark.sources.testdata import load_table
    from icenetetl_spark.streaming.stateful import sessionize_stream

    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .filter(F.col("user_id") % 7 == 0)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    )
    static = ev.orderBy("ts").cache()
    n = static.count()
    rows = static.collect()

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    third = (n + 2) // 3
    for i in range(3):
        chunk = rows[i * third:(i + 1) * third]
        if chunk:
            spark.createDataFrame(chunk, static.schema).coalesce(1).write.parquet(
                os.path.join(input_dir, f"c{i}")
            )

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir + "/*/")
    )
    emissions = []

    def sink(df, batch_id):
        emissions.extend(
            (batch_id, r["user_id"], r["session_start_s"], r["n_events"],
             r["duration_s"], r["open"])
            for r in df.collect()
        )

    q = (
        sessionize_stream(stream, gap_s=1800)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    closed = [
        (u, s, ne, d) for _, u, s, ne, d, is_open in emissions if not is_open
    ]
    last_open = {}
    for bid, u, s, ne, d, is_open in emissions:
        if is_open:
            last_open[u] = (u, s, ne, d)
    # the same (user, session_start) must never appear both closed and open
    # AFTER the close (closed sessions are final)
    streamed = sorted(closed + list(last_open.values()))

    w = Window.partitionBy("user_id").orderBy("ts")
    secs = F.unix_timestamp(F.col("ts"))
    prev = F.lag(secs).over(w)
    new_sess = F.when(prev.isNull() | ((secs - prev) > 1800), 1).otherwise(0)
    sess = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    batch = (
        static.select("user_id", secs.alias("s"), sess.alias("sid"))
        .groupBy("user_id", "sid")
        .agg(
            F.min("s").alias("session_start_s"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max("s") - F.min("s")).alias("duration_s"),
        )
        .select("user_id", "session_start_s", "n_events", "duration_s")
    )
    expected = sorted(tuple(r) for r in batch.collect())
    assert n > 0 and len(expected) > len(set(u for u, *_ in expected))
    assert streamed == expected
