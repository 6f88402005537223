"""Pure-stdlib image codecs: PNG (RFC 2083, stdlib ``zlib``) and BMP
(Windows BITMAPINFOHEADER, uncompressed 24-bit), reader AND writer — the
same close-the-format-gap pattern as :mod:`icenetetl_spark.sources.netcdf3`:
both directions implemented from the public specs so round-trip property
tests pin the byte layout without any third-party decoder in the container.

This is what makes the multimodal path real: `operators.multimodal` used to
stub bytes->pixels behind a deterministic fake; with these codecs the
`mm_decode` query decodes genuine PNG/BMP payloads and its pixel statistics
are value-checked against an arithmetic oracle.

Scope (explicitly bounded, errors are loud):
- PNG: bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA); all five filter types (None/Sub/Up/Average/Paeth) on both
  read and write; non-interlaced only (Adam7 raises). CRCs are written
  and verified.
- BMP: BITMAPINFOHEADER, 24 bpp, BI_RGB (uncompressed); bottom-up and
  top-down row orders; 4-byte row padding.

Reference parity: the reference pipeline has no image path (it is an
ice-forecast ETL); this module serves SURVEY §2's multimodal extension
surface (binary columns + decode UDFs) demanded of a training-data engine.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> sample channels (RFC 2083 §4.1.1)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# ---------------------------------------------------------------------------
# PNG


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_scanline(
    ftype: int, line: bytes, prev: bytes, bpp: int
) -> bytes:
    """Apply filter ``ftype`` to a raw scanline (writer side, §6)."""
    n = len(line)
    out = bytearray(n)
    for i in range(n):
        x = line[i]
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return bytes(out)


def _reconstruct_scanline(
    ftype: int, line: bytes, prev: bytes, bpp: int
) -> bytes:
    """Invert filter ``ftype`` (reader side, §6.5-6.6). Sequential along
    the row by construction (Sub/Average/Paeth reference the just-decoded
    left neighbor) — per-byte loop, bounded by the scanline width."""
    n = len(line)
    out = bytearray(n)
    for i in range(n):
        x = line[i]
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x + a) & 0xFF
        elif ftype == 2:
            out[i] = (x + b) & 0xFF
        elif ftype == 3:
            out[i] = (x + (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return bytes(out)


def write_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 array as a non-interlaced 8-bit PNG.

    Shape selects the color type: (h, w) -> grayscale, (h, w, 2) ->
    gray+alpha, (h, w, 3) -> RGB, (h, w, 4) -> RGBA. ``filter_type``
    applies one of the five RFC 2083 filters to every scanline (the spec
    allows per-line choice; a uniform one keeps output deterministic and
    lets tests exercise each reconstruction path)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        channels = arr.shape[2]
        color_type = {2: 4, 3: 2, 4: 6}[channels]
    else:
        raise ValueError(f"unsupported pixel array shape {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("zero-sized image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw_rows = arr.reshape(h, w * channels).tobytes()
    stride = w * channels
    prev = bytes(stride)
    body = bytearray()
    for r in range(h):
        line = raw_rows[r * stride : (r + 1) * stride]
        body.append(filter_type)
        body += _filter_scanline(filter_type, line, prev, channels)
        prev = line
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(body)))
        + _chunk(b"IEND", b"")
    )


def read_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a uint8 array ((h, w) for
    grayscale, else (h, w, channels)). Verifies chunk CRCs; multiple IDAT
    chunks concatenate per the spec."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, compression, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if compression != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlacing not supported")
    channels = _PNG_CHANNELS[color_type]
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG data length {len(raw)} != expected {h * (stride + 1)}"
        )
    prev = bytes(stride)
    rows = []
    for r in range(h):
        off = r * (stride + 1)
        line = _reconstruct_scanline(
            raw[off], raw[off + 1 : off + 1 + stride], prev, channels
        )
        rows.append(line)
        prev = line
    arr = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, w, channels)
    return arr[:, :, 0] if color_type == 0 else arr


# ---------------------------------------------------------------------------
# BMP


def write_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, bottom-up rows, BGR byte order, rows padded to 4)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"BMP writer wants (h, w, 3) RGB, got {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("zero-sized image")
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    bgr = arr[::-1, :, ::-1]  # bottom-up, RGB->BGR
    body = bytearray()
    for r in range(h):
        body += bgr[r].tobytes() + b"\x00" * pad
    image_size = len(body)
    offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", offset + image_size, 0, 0, offset
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    return header + bytes(body)


def read_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to an (h, w, 3) uint8 RGB array.
    Handles bottom-up (positive height) and top-down (negative) layouts."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad magic)")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    (offset,) = struct.unpack("<I", data[10:14])
    header_size, w, h_signed = struct.unpack("<Iii", data[14:26])
    planes, bpp, compression = struct.unpack("<HHI", data[26:34])
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP: bpp={bpp} compression={compression} "
            "(only 24-bit BI_RGB)"
        )
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = offset + stride * h
    if len(data) < need:
        raise ValueError(f"truncated BMP pixel data ({len(data)} < {need})")
    rows = np.frombuffer(
        data[offset : offset + stride * h], dtype=np.uint8
    ).reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ---------------------------------------------------------------------------
# sniffing decode


def decode_image(data: bytes) -> tuple[str, np.ndarray]:
    """(format, pixels): dispatch on the file magic. Raises ValueError for
    anything that is neither PNG nor BMP — corrupt payloads should fail
    loudly in the decode stage, not flow on as zeros."""
    if data[:8] == PNG_SIGNATURE:
        return "png", read_png(data)
    if data[:2] == b"BM":
        return "bmp", read_bmp(data)
    raise ValueError(f"unrecognized image magic {data[:8]!r}")
