"""Multimodal column handling: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode step itself (PIL/ffmpeg/librosa) is NOT available in this
container, so the actual byte->pixels/samples conversion is stubbed behind a
deterministic fake (``_fake_decode``) with the real production shape clearly
marked. Everything Spark-side — schema contracts, Arrow batch iteration,
partition sizing, UDF signatures — is real and tested.

Scale notes (100 TB of media):
- Binary payloads ride ordinary parquet binary columns (or are referenced by
  URI + fetched inside the partition fn to keep shuffle sizes down — at 100 TB
  you shuffle METADATA, never payload bytes).
- ``mapInPandas`` streams Arrow record batches: memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` × payload size, not by
  partition row count — size partitions by bytes (maxPartitionBytes), not rows.
- Decoded features (fixed-size arrays) are far smaller than payloads; emit
  them and DROP the payload column before any join/shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
    ]
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary 'media payload' column (UTF-8 bytes of
    the text stand in for image bytes — the testdata has no media column)."""
    return docs.withColumn("payload", F.col(text_col).cast("binary"))


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for an image decoder.

    PRODUCTION: replace with e.g.
        from PIL import Image;  im = Image.open(io.BytesIO(payload))
        return im.format.lower(), im.width, im.height
    (library not present in this container). The fake derives dimensions
    from byte statistics so the plumbing has nontrivial, checkable output.
    """
    n = len(payload)
    width = 1 + n % 64
    height = 1 + (n // 64) % 64
    fmt = "png" if n % 2 == 0 else "jpeg"
    return fmt, width, height


def decode_media(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode: binary payload -> typed metadata/features.

    The partition function receives an iterator of pandas DataFrames (one per
    Arrow batch) and yields result batches — constant memory per batch, no
    per-row Python overhead beyond the decoder itself.
    """
    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            meta = [_fake_decode(bytes(p)) for p in payloads]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "format": [m[0] for m in meta],
                    "width": pd.Series([m[1] for m in meta], dtype="int32"),
                    "height": pd.Series([m[2] for m in meta], dtype="int32"),
                }
            )
            out["n_pixels"] = (
                out["width"].astype("int64") * out["height"].astype("int64")
            )
            yield out

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        decode_batches, DECODED_SCHEMA
    )


def binary_metadata(docs_with_payload: DataFrame) -> DataFrame:
    """Payload metadata via pure JVM expressions (no Python): byte length and
    a hex header probe — the cheap pre-filter you run BEFORE the expensive
    decode to drop corrupt/empty payloads early."""
    return docs_with_payload.select(
        "doc_id",
        F.octet_length(F.col("payload")).cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring(F.col("payload"), 1, 8))).alias("header_hex"),
        (F.octet_length(F.col("payload")) > 0).alias("is_nonempty"),
    )


def frame_sample_plan(
    media: DataFrame, every_nth: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame-sampling *plan*: expand each media row into frame-index
    rows (the decode of each frame happens in decode_media-style UDFs).
    Pure relational expansion — sequence + explode, no UDF."""
    n_frames = (F.octet_length(F.col("payload")) % 256 + 1).alias("n_frames")
    with_frames = media.select(F.col(id_col), F.col("payload"), n_frames)
    return with_frames.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )
