"""Structured Streaming shell over the batch pipeline.

The reference's trigger model — one Azure Function invocation per blob landed
in ``input/`` with serial processing (function.json:4-10, host.json:4-8) —
is exactly Spark's file-source stream + ``foreachBatch``:

- file source discovers new files per micro-batch (≙ blob-created events),
- ``foreachBatch`` runs the SAME batch pipeline (one code path, two
  execution modes),
- checkpointing makes each file processed exactly once across restarts; the
  pipeline's idempotent upserts additionally make replays harmless — the
  same two-layer safety the reference gets from queue-once + ON CONFLICT
  (§2.8 of SURVEY.md).
- ``Trigger.AvailableNow`` drains the backlog then stops (the batch-catchup
  mode); omit it for continuous ingest.

Late/duplicate data: no watermarks are needed for parity (the reference has
none — late files simply upsert). The event-analytics extensions show the
watermarked variants (queries/events.py docstrings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from icenetetl_spark.catalog import ParquetCatalog
from icenetetl_spark.plans.icenet import FileAttrs, IceNetPipeline
from icenetetl_spark.schemas import ICENET_RAW


def start_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    warehouse: str,
    checkpoint_dir: str,
    attrs: FileAttrs,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Watch ``input_dir`` for long-form parquet drops; run the five-stage
    pipeline on each micro-batch. (For raw NetCDF, swap the source for
    ``binaryFile`` + sources.netcdf.melt_netcdf_files — same foreachBatch.)

    ``max_files_per_trigger=1`` (default) reproduces the reference's
    serial queue (host.json:4-8: one blob per invocation). Raising it is
    the concurrent-ingest scale mode the reference cannot express: one
    micro-batch unions N files, so the chain (grid dedup, anti-join
    append, latest/meta recompute) runs once per N files instead of once
    per file — the pipeline's idempotent upserts make the two modes land
    the identical warehouse (measured in tools/icenet_stress.py)."""
    pipeline = IceNetPipeline(ParquetCatalog(spark, warehouse))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pipeline.run(batch_df, attrs)

    stream = (
        spark.readStream.schema(ICENET_RAW)
        .option("maxFilesPerTrigger", int(max_files_per_trigger))
        .parquet(input_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
