from icenetetl_spark.streaming.event_stream import (
    start_windowed_stream,
    windowed_event_counts,
)
from icenetetl_spark.streaming.ingest_stream import start_ingest_stream
from icenetetl_spark.streaming.stateful import running_user_totals

__all__ = [
    "running_user_totals",
    "start_ingest_stream",
    "start_windowed_stream",
    "windowed_event_counts",
]
