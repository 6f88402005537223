"""Event-time streaming analytics: the watermark + tumbling-window side of
SURVEY.md §2.8 (the reference needs none of this — its late data is handled
by idempotent upserts — but any events-shaped workload on this engine does).

``windowed_event_counts`` is the streaming twin of
queries/events.py::ev_window_rollup: same logical aggregation, plus a
watermark bounding state so the operator can run forever (state for windows
older than the watermark is evicted — without it, a 100 TB stream would
accumulate unbounded state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Works on both a batch and a streaming ``events`` DataFrame (one plan,
    two modes). Late rows beyond ``watermark`` are dropped in streaming mode.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    docs: DataFrame,
    key_cols: tuple[str, ...] = ("fingerprint",),
    watermark_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact-dedup: emit only the FIRST arrival of each key,
    with state bounded by the watermark.

    The batch twin is ``dropDuplicates(key_cols)``. In streaming mode a
    plain dropDuplicates keeps every key seen forever — unbounded state on
    an endless corpus feed — so this uses ``dropDuplicatesWithinWatermark``:
    a duplicate arriving within the watermark of its first occurrence is
    dropped, and key state older than the watermark is evicted. The
    trade-off is explicit and standard for streaming ingest dedup: a
    duplicate arriving LATER than the watermark delay re-emits, and the
    idempotent batch-layer dedup (catalog.append_missing, the same anti-join
    the reference's ON CONFLICT performs) catches it downstream — streaming
    dedup bounds the volume, the sink guarantees exactness.
    """
    return docs.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def attribute_events(
    triggers: DataFrame,
    responses: DataFrame,
    key_col: str = "user_id",
    max_delay: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream INNER join with event-time bounds — the attribution
    shape (view -> click, send -> open): each response joins the trigger
    it followed within ``max_delay``. One plan, two modes: on batch frames
    it is an ordinary range join; on streams the watermarks plus the
    two-sided time-range predicate are exactly what lets Spark bound and
    evict join state (without them a 100 TB stream accumulates state
    forever — the query would be rejected in append mode).

    Returns (key, trigger_id, trigger_ts, response_id, response_ts,
    delay_seconds); a response matching several triggers inside the window
    attributes to EACH (downstream pick-first is a groupBy-min away —
    kept out of the operator so the join's semantics stay symmetric).
    """
    t = (
        triggers.withWatermark("ts", watermark)
        .select(
            F.col(key_col).alias("key"),
            F.col("event_id").alias("trigger_id"),
            F.col("ts").alias("trigger_ts"),
        )
    )
    r = (
        responses.withWatermark("ts", watermark)
        .select(
            F.col(key_col).alias("rkey"),
            F.col("event_id").alias("response_id"),
            F.col("ts").alias("response_ts"),
        )
    )
    joined = t.join(
        r,
        (F.col("key") == F.col("rkey"))
        & (F.col("response_ts") >= F.col("trigger_ts"))
        & (
            F.col("response_ts")
            <= F.col("trigger_ts") + F.expr(f"INTERVAL {max_delay}")
        ),
    )
    return joined.select(
        "key",
        "trigger_id",
        "trigger_ts",
        "response_id",
        "response_ts",
        (
            F.unix_timestamp("response_ts") - F.unix_timestamp("trigger_ts")
        ).alias("delay_seconds"),
    )


def start_attribution_stream(
    spark,
    trigger_dir: str,
    response_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    key_col: str = "user_id",
    available_now: bool = True,
) -> StreamingQuery:
    """Two file-source streams -> watermarked stream-stream join ->
    append parquet sink."""
    t = spark.readStream.schema(schema).parquet(trigger_dir)
    r = spark.readStream.schema(schema).parquet(response_dir)
    joined = attribute_events(t, r, key_col=key_col)
    writer = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_windowed_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    available_now: bool = True,
) -> StreamingQuery:
    """File-source stream -> watermarked window agg -> append parquet sink."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_counts(stream)
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_drift_monitor(
    spark,
    input_dir: str,
    baseline,
    report_dir: str,
    checkpoint_dir: str,
    schema,
    group_col: str = "event_type",
    value_col: str = "value",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Streaming data-quality drift monitor: every micro-batch's value
    histogram is PSI-scored against a STATIC baseline frame
    (operators/quality.drift_psi — the batch operator reused verbatim
    under foreachBatch, the same batch/stream split as the ingest
    pipeline), and one report row per (batch_id, group) is appended to
    ``report_dir``. A drifted batch is visible in the report sink the
    moment it commits — the alerting hook a training-data feed needs to
    quarantine a bad source before it reaches the corpus.

    Scale notes: the baseline stays a DataFrame (re-evaluated per batch
    against its source — point it at a compact aggregated table in
    production); the per-batch cost is drift_psi's one data-sized groupBy
    over the BATCH, not the corpus. Exactly-once: the parquet append is
    idempotent per (batch_id, group) under checkpoint replay semantics.
    """
    from pyspark.sql import functions as F

    from icenetetl_spark.operators.quality import drift_psi

    base_slice = baseline.select(group_col, value_col).withColumn(
        "is_b", F.lit(False)
    )

    def _on_batch(batch_df, batch_id: int) -> None:
        cur = batch_df.select(group_col, value_col).withColumn(
            "is_b", F.lit(True)
        )
        report = drift_psi(
            base_slice.unionByName(cur),
            group_col,
            value_col,
            period=F.col("is_b"),
        ).withColumn("batch_id", F.lit(batch_id))
        report.write.mode("append").parquet(report_dir)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    writer = stream.writeStream.foreachBatch(_on_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
