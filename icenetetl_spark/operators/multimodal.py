"""Multimodal column handling: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

Two decode paths coexist:

- REAL (``attach_image_payload`` + ``decode_images``): genuine PNG/BMP
  bytes produced and parsed by the pure-stdlib codecs in
  :mod:`icenetetl_spark.sources.images` — actual pixels, actual filter
  reconstruction, pixel statistics value-checked against an arithmetic
  oracle. This is the production shape for formats the container can
  decode without third-party libs.
- STUB (``_fake_decode`` / ``decode_media``): the original plumbing test
  for formats that DO need absent libraries (JPEG/ffmpeg/librosa); it
  keeps the Arrow batch iteration and schema contract exercised with a
  deterministic fake, clearly marked.

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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
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


REAL_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("pixel_sum", LongType()),
    ]
)


def attach_image_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL image bytes per document (the testdata ships no
    media column, so the fixture raster is derived from the id): a
    ``(1 + id%16) x (1 + (id//16)%16)`` grayscale ramp with pixel ``i``
    (row-major) valued ``(id + i) % 256``; even ids encode as grayscale
    PNG, odd ids as 24-bit BMP with the value replicated across RGB. The
    id-only derivation is what makes the decoded statistics expressible
    as an arithmetic SQL oracle."""
    from icenetetl_spark.sources.images import write_bmp, write_png

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for d in ids:
                d = int(d)
                w, h = 1 + d % 16, 1 + (d // 16) % 16
                v = ((d + np.arange(w * h)) % 256).astype(np.uint8)
                v = v.reshape(h, w)
                if d % 2 == 0:
                    payloads.append(write_png(v))
                else:
                    payloads.append(write_bmp(np.repeat(v[:, :, None], 3, 2)))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def decode_images(media: DataFrame) -> DataFrame:
    """REAL Arrow-batched decode: PNG/BMP payload bytes -> pixel metadata
    and an exact channel-0 pixel sum (BIGINT, aggregation-order-free).
    Same batch-streaming shape as :func:`decode_media`, but the decoder is
    the stdlib-spec codec, not a fake — a corrupt payload raises."""
    from icenetetl_spark.sources.images import decode_image

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                fmt, px = decode_image(bytes(p))
                gray = px if px.ndim == 2 else px[:, :, 0]
                h, w = gray.shape
                recs.append(
                    (int(d), fmt, w, h, w * h, int(gray.sum(dtype=np.int64)))
                )
            out = pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "format", "width", "height",
                    "n_pixels", "pixel_sum",
                ],
            )
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    return media.select("doc_id", "payload").mapInPandas(
        dec, REAL_DECODE_SCHEMA
    )


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


AUDIO_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("sample_sum", LongType()),
    ]
)


def attach_audio_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL WAV bytes per document (same fixture idea as
    attach_image_payload): ``64 + id%64`` frames of ``1 + id%2`` channels
    at ``8000 + (id%4)*4000`` Hz, with interleaved sample ``i`` valued
    ``(id*31 + i*7) % 65536 - 32768`` — an id-only derivation whose decoded
    statistics an arithmetic SQL oracle reproduces exactly."""
    from icenetetl_spark.sources.audio import write_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for d in ids:
                d = int(d)
                n, ch = 64 + d % 64, 1 + d % 2
                rate = 8000 + (d % 4) * 4000
                i = np.arange(n * ch, dtype=np.int64)
                v = ((d * 31 + i * 7) % 65536 - 32768).astype(np.int16)
                payloads.append(write_wav(v.reshape(n, ch), rate))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def decode_audio(media: DataFrame) -> DataFrame:
    """REAL Arrow-batched WAV decode: payload bytes -> stream metadata,
    duration, and the exact all-channel sample sum (BIGINT, order-free).
    The decoder is the stdlib RIFF parser (sources/audio.py); corrupt or
    non-PCM payloads raise rather than passing garbage downstream."""
    from icenetetl_spark.sources.audio import read_wav

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                rate, arr = read_wav(bytes(p))
                n, ch = arr.shape
                recs.append(
                    (
                        int(d),
                        rate,
                        ch,
                        n,
                        float(n) / float(rate),
                        int(arr.sum(dtype=np.int64)),
                    )
                )
            out = pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "sample_rate", "n_channels",
                    "n_samples", "duration_s", "sample_sum",
                ],
            )
            out["sample_rate"] = out["sample_rate"].astype("int32")
            out["n_channels"] = out["n_channels"].astype("int32")
            yield out

    return media.select("doc_id", "payload").mapInPandas(
        dec, AUDIO_DECODE_SCHEMA
    )


VIDEO_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("luma_sum", LongType()),
    ]
)


def attach_video_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL Y4M bytes per document: ``1 + id%12`` frames of
    ``(4 + (id%3)*2) x (2 + (id//3%3)*2)`` luma with pixel ``(f, i)``
    (row-major i) valued ``(id + f*7 + i) % 256`` at 25 fps — id-only
    arithmetic, so decoded frame statistics have an exact SQL oracle."""
    from icenetetl_spark.sources.video import write_y4m

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for d in ids:
                d = int(d)
                n = 1 + d % 12
                w = 4 + (d % 3) * 2
                h = 2 + (d // 3 % 3) * 2
                f = np.arange(n)[:, None] * 7 + np.arange(w * h)[None, :]
                frames = ((d + f) % 256).astype(np.uint8).reshape(n, h, w)
                payloads.append(write_y4m(frames))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


def decode_video_frames(media: DataFrame, every_nth: int = 3) -> DataFrame:
    """REAL frame sampling: parse the Y4M container (sources/video.py),
    keep every ``every_nth`` frame, and emit per-sampled-frame luma sums —
    the decode→sample→feature pass of a video curation pipeline. The
    sampling happens INSIDE the decode batch so unsampled frames never
    leave the Python worker, and payload bytes never shuffle (the
    mapInPandas output is metadata-sized)."""
    from icenetetl_spark.sources.video import read_y4m

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                params, frames = read_y4m(bytes(p))
                n = frames.shape[0]
                for idx in range(0, n, every_nth):
                    recs.append(
                        (
                            int(d),
                            n,
                            idx,
                            params["width"],
                            params["height"],
                            int(frames[idx].sum(dtype=np.int64)),
                        )
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "n_frames", "frame_idx",
                    "width", "height", "luma_sum",
                ],
            ).astype(
                {
                    "n_frames": "int32",
                    "frame_idx": "int32",
                    "width": "int32",
                    "height": "int32",
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        dec, VIDEO_DECODE_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixel_sum", LongType()),
    ]
)


def resize_images(
    media: DataFrame, out_w: int = 5, out_h: int = 3
) -> DataFrame:
    """REAL resize (nearest neighbor) over decoded PNG/BMP payloads: the
    normalize-resolution step of an image curation pipeline. Source pixel
    for output (r, c) is ``(floor(r*h/out_h), floor(c*w/out_w))`` — the
    canonical NN mapping, chosen because it is exactly reproducible as
    integer arithmetic in the SQL oracle. Emits the resized raster's
    channel-0 sum rather than the pixels (metadata-sized output; payloads
    never shuffle)."""
    from icenetetl_spark.sources.images import decode_image

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                _, px = decode_image(bytes(p))
                gray = px if px.ndim == 2 else px[:, :, 0]
                h, w = gray.shape
                rows = (np.arange(out_h) * h) // out_h
                cols = (np.arange(out_w) * w) // out_w
                resized = gray[np.ix_(rows, cols)]
                recs.append(
                    (int(d), w, h, out_w, out_h,
                     int(resized.sum(dtype=np.int64)))
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "src_width", "src_height",
                    "width", "height", "pixel_sum",
                ],
            ).astype(
                {c: "int32" for c in
                 ("src_width", "src_height", "width", "height")}
            )

    return media.select("doc_id", "payload").mapInPandas(dec, RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("zero_crossings", LongType()),
        StructField("peak", IntegerType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction over decoded WAV payloads: channel-0
    zero-crossing count (strict sign product < 0 — the deterministic ZCR
    convention) and peak |amplitude| — the cheap signal stats an audio
    curation pipeline thresholds on (silence/clipping detection). Decode
    and features run in one Arrow batch pass; output is metadata-sized."""
    from icenetetl_spark.sources.audio import read_wav

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                _, arr = read_wav(bytes(p))
                ch0 = arr[:, 0].astype(np.int64)
                zcr = int(np.sum(ch0[:-1] * ch0[1:] < 0))
                peak = int(np.abs(ch0).max()) if len(ch0) else 0
                recs.append((int(d), len(ch0), zcr, peak))
            yield pd.DataFrame(
                recs,
                columns=["doc_id", "n_samples", "zero_crossings", "peak"],
            ).astype({"peak": "int32"})

    return media.select("doc_id", "payload").mapInPandas(
        dec, AUDIO_FEATURES_SCHEMA
    )


DHASH_W, DHASH_H = 5, 8  # 4 column comparisons x 8 rows = 32-bit dHash


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference hash (dHash, Krawetz's public algorithm) over
    the REAL decoded payloads: NN-resize the grayscale raster to
    DHASH_W x DHASH_H, then bit (r*4 + c) = 1 iff pixel[r][c] <
    pixel[r][c+1]. 32 bits in a positive BIGINT — the image twin of the
    text SimHash fingerprint, and the pairs query reuses the SAME Manku
    pigeonhole segment join (operators/dedup.simhash_near_pairs) for
    near-duplicate detection. Metadata-sized output; payloads never
    shuffle."""
    from icenetetl_spark.sources.images import decode_image

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(
            DHASH_H * (DHASH_W - 1), dtype=np.int64
        ).reshape(DHASH_H, DHASH_W - 1)
        for pdf in batches:
            recs = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                _, px = decode_image(bytes(p))
                gray = px if px.ndim == 2 else px[:, :, 0]
                h, w = gray.shape
                rows = (np.arange(DHASH_H) * h) // DHASH_H
                cols = (np.arange(DHASH_W) * w) // DHASH_W
                rs = gray[np.ix_(rows, cols)].astype(np.int64)
                bits = (rs[:, :-1] < rs[:, 1:]).astype(np.int64)
                recs.append((int(d), int((bits * weights).sum())))
            yield pd.DataFrame(recs, columns=["doc_id", "dhash"])

    return media.select("doc_id", "payload").mapInPandas(
        dec, "doc_id long, dhash long"
    )


AHASH_POINTS = 33  # 32 adjacent comparisons = 32-bit audio fingerprint


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """1-D difference fingerprint over the REAL WAV decode — the audio
    twin of :func:`image_dhash`: NN-downsample channel 0 to AHASH_POINTS
    samples, bit k = 1 iff sample[k] < sample[k+1]. With the image and
    text fingerprints this puts all three modalities behind the same
    near-dup machinery (operators/dedup.simhash_near_pairs)."""
    from icenetetl_spark.sources.audio import read_wav

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(AHASH_POINTS - 1, dtype=np.int64)
        for pdf in batches:
            recs = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                _, arr = read_wav(bytes(p))
                c0 = arr[:, 0].astype(np.int64) % 256
                n = c0.shape[0]
                idx = (np.arange(AHASH_POINTS) * n) // AHASH_POINTS
                ds = c0[idx]
                bits = (ds[:-1] < ds[1:]).astype(np.int64)
                recs.append((int(d), int((bits * weights).sum())))
            yield pd.DataFrame(recs, columns=["doc_id", "afp"])

    return media.select("doc_id", "payload").mapInPandas(
        dec, "doc_id long, afp long"
    )
