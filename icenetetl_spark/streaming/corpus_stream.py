"""Streaming corpus ingest: the LLM-training-data twin of ingest_stream.

A document feed lands as parquet drops; each micro-batch is scored,
filtered, exact-deduped, and appended to the ``corpus`` catalog table.
Two-layer dedup, mirroring the reference's queue-once + ON CONFLICT split
(SURVEY.md §2.8):

1. IN-STREAM: ``dedup_stream`` (dropDuplicatesWithinWatermark) drops repeats
   arriving within the watermark — bounds the volume that reaches the sink
   with state that is itself bounded by the watermark.
2. AT THE SINK: ``catalog.append_missing`` (anti-join on the content
   fingerprint ≙ INSERT ... ON CONFLICT DO NOTHING) guarantees exactness —
   late duplicates past the watermark, and replays after a checkpoint
   restart, land as no-ops.

Scale notes: every stage is a projection or the watermark-bounded dedup
state; the sink anti-join prunes to the fingerprint column of the existing
table (projection pushdown). No stage holds unbounded state; no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from icenetetl_spark.catalog import ParquetCatalog
from icenetetl_spark.operators.text import (
    fingerprint,
    pii_counts,
    quality_score,
    redact_pii,
    token_count,
)
from icenetetl_spark.streaming.event_stream import dedup_stream

QUALITY_MIN = 0.5


def prepare_documents(docs: DataFrame) -> DataFrame:
    """The per-batch transform — works identically on batch and streaming
    frames (one plan, two modes): redact -> score -> filter -> project the
    columns the corpus table keeps. PII is scrubbed BEFORE fingerprinting
    (two documents differing only in the redacted spans dedup as one, and
    raw PII never reaches the stored table), with the per-category match
    total kept as an auditable column."""
    counts = pii_counts(F.col("text"))
    n_pii = sum(counts.values(), F.lit(0))
    return (
        docs.withColumn("n_pii", n_pii)
        .withColumn("text", redact_pii(F.col("text")))
        .withColumn("fingerprint", fingerprint(F.col("text")))
        .withColumn("quality", quality_score(F.col("text")))
        .withColumn("n_tokens", token_count(F.col("text")))
        .filter(F.col("quality") >= QUALITY_MIN)
        .select(
            "doc_id", "ts", "fingerprint", "quality", "n_tokens", "n_pii", "text"
        )
    )


def start_corpus_stream(
    spark: SparkSession,
    input_dir: str,
    warehouse: str,
    checkpoint_dir: str,
    schema,
    watermark: str = "10 minutes",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Watch ``input_dir`` for document parquet drops; maintain the deduped,
    quality-filtered ``corpus`` table. ``max_files_per_trigger`` bounds each
    micro-batch (the ingest_stream serial-queue knob; None = all available
    files per trigger)."""
    catalog = ParquetCatalog(spark, warehouse)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # exactness layer: fingerprint-keyed ON CONFLICT DO NOTHING
        catalog.append_missing("corpus", batch_df, ["fingerprint"])

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    prepared = dedup_stream(
        prepare_documents(stream),
        key_cols=("fingerprint",),
        watermark_col="ts",
        watermark=watermark,
    )
    writer = (
        prepared.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
