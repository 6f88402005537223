"""Pure-stdlib WAV codec (RIFF/WAVE, PCM 16-bit LE), reader AND writer —
the third instance of the close-the-format-gap pattern
(:mod:`~icenetetl_spark.sources.netcdf3` for NetCDF classic,
:mod:`~icenetetl_spark.sources.images` for PNG/BMP): both directions from
the public container spec (Microsoft/IBM RIFF WAVE) so round-trip property
tests pin the byte layout without any audio library in the container.

This upgrades the audio half of the multimodal surface from a stub to a
real decode: `operators.multimodal.decode_audio` parses genuine WAV bytes
and its sample statistics are value-checked against an arithmetic oracle.

Scope (bounded, loud errors): PCM format 1, 16-bit samples, any channel
count/sample rate; chunk walking skips unknown chunks (LIST/INFO etc.) as
the spec requires; compressed formats (IEEE float, A-law, MP3-in-WAV)
raise with the format tag named.
"""

from __future__ import annotations

import struct

import numpy as np


def write_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 PCM samples as a canonical RIFF/WAVE byte string.

    ``samples``: shape (n_frames,) mono or (n_frames, n_channels);
    channels interleave per frame, little-endian, exactly as the spec's
    block alignment dictates.
    """
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError(f"write_wav wants int16 samples, got {s.dtype}")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got shape {s.shape}")
    n_frames, n_channels = s.shape
    block_align = 2 * n_channels
    byte_rate = sample_rate * block_align
    data = s.astype("<i2").tobytes()  # interleaved row-major == per-frame
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def read_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode RIFF/WAVE bytes -> (sample_rate, int16 array of shape
    (n_frames, n_channels)). Walks the chunk list (skipping unknown
    chunks, honoring the odd-size pad byte) rather than assuming the
    canonical fmt-then-data layout — real encoders emit LIST/fact chunks
    between them."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt_fields = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt_fields = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_fields is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt_fields
    if audio_format != 1:
        raise ValueError(f"unsupported WAVE format tag {audio_format} (PCM=1)")
    if bits != 16:
        raise ValueError(f"unsupported bit depth {bits} (16 only)")
    if n_channels < 1:
        raise ValueError("channel count must be >= 1")
    if sample_rate < 1:
        raise ValueError("sample rate must be >= 1")
    frame_bytes = 2 * n_channels
    if len(pcm) % frame_bytes:
        raise ValueError("data chunk is not a whole number of frames")
    arr = np.frombuffer(pcm, dtype="<i2").reshape(-1, n_channels)
    return sample_rate, arr
