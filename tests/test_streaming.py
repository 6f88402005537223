"""Streaming shell test: drop long-form parquet 'files' into a watched
directory, run the AvailableNow stream, assert the warehouse tables match a
direct batch run (one code path, two execution modes)."""

from __future__ import annotations

import os

from icenetetl_spark.catalog import ParquetCatalog
from icenetetl_spark.plans.icenet import FileAttrs, IceNetPipeline
from icenetetl_spark.sources.fixtures import make_raw_file
from icenetetl_spark.streaming.ingest_stream import start_ingest_stream
from tests.test_icenet_pipeline import table_fingerprint


def test_stream_matches_batch(spark, tmp_path):
    input_dir = str(tmp_path / "input")
    os.makedirs(input_dir)
    ckpt = str(tmp_path / "ckpt")
    wh_stream = str(tmp_path / "wh_stream")
    wh_batch = str(tmp_path / "wh_batch")

    f1, attrs = make_raw_file(spark, "2024-03-01", "north", grid_side=8, seed=1)
    f2, _ = make_raw_file(spark, "2024-03-08", "north", grid_side=8, seed=2)
    # one parquet drop per 'blob'
    f1.coalesce(1).write.parquet(os.path.join(input_dir, "file1"))
    f2.coalesce(1).write.parquet(os.path.join(input_dir, "file2"))
    # the file source reads a flat dir of files; point it at the dir glob
    q = start_ingest_stream(
        spark, input_dir + "/*/", wh_stream, ckpt, attrs, available_now=True
    )
    q.awaitTermination(120)

    batch = IceNetPipeline(ParquetCatalog(spark, wh_batch))
    # Stream micro-batches may group files; batch twin processes both files
    # in one run for comparison of final state.
    for f in (f1, f2):
        batch.run(f, attrs)

    cs, cb = ParquetCatalog(spark, wh_stream), ParquetCatalog(spark, wh_batch)
    for t in ["cells", "forecasts", "forecast_latest", "forecast_meta"]:
        assert table_fingerprint(cs.read(t)) == table_fingerprint(cb.read(t)), t


def test_stream_restart_is_noop(spark, tmp_path):
    """Restarting with the same checkpoint reprocesses nothing (exactly-once
    per file), and the idempotent sinks would absorb replays anyway."""
    input_dir = str(tmp_path / "input")
    os.makedirs(input_dir)
    ckpt = str(tmp_path / "ckpt")
    wh = str(tmp_path / "wh")
    f1, attrs = make_raw_file(spark, "2024-03-01", "north", grid_side=8, seed=1)
    f1.coalesce(1).write.parquet(os.path.join(input_dir, "file1"))

    q = start_ingest_stream(spark, input_dir + "/*/", wh, ckpt, attrs)
    q.awaitTermination(120)
    cat = ParquetCatalog(spark, wh)
    fp = table_fingerprint(cat.read("forecasts"))

    q2 = start_ingest_stream(spark, input_dir + "/*/", wh, ckpt, attrs)
    q2.awaitTermination(120)
    assert table_fingerprint(cat.read("forecasts")) == fp
