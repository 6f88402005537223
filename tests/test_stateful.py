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
