"""Pure-stdlib PNG/BMP codecs and the REAL multimodal decode path:
round-trip properties over all filter types and color types, hand-built
golden bytes, cross-format agreement, and the Spark mm_decode query
value-checked against the id-arithmetic definition of the fixture raster."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from icenetetl_spark.sources.images import (
    PNG_SIGNATURE,
    decode_image,
    read_bmp,
    read_png,
    write_bmp,
    write_png,
)


def _ramp(h, w, c=None, seed=0):
    n = h * w * (c or 1)
    a = ((np.arange(n) * 31 + seed) % 256).astype(np.uint8)
    return a.reshape((h, w) if c is None else (h, w, c))


# ---------------------------------------------------------------------------
# PNG

@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [None, 2, 3, 4])
def test_png_roundtrip_all_filters_and_colortypes(filter_type, channels):
    px = _ramp(5, 7, channels, seed=filter_type)
    out = read_png(write_png(px, filter_type=filter_type))
    np.testing.assert_array_equal(out, px)


def test_png_filters_produce_distinct_bytes_same_pixels():
    """The five filters are genuinely different encodings of one image."""
    px = _ramp(6, 6, 3)
    encs = [write_png(px, filter_type=f) for f in range(5)]
    assert len({e for e in encs}) == 5
    for e in encs:
        np.testing.assert_array_equal(read_png(e), px)


def test_png_golden_handbuilt():
    """Decode a PNG assembled field-by-field (not by our writer): a 2x2
    grayscale image with rows [[1, 2], [3, 4]], filter 0 scanlines."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = b"\x00\x01\x02" + b"\x00\x03\x04"

    def chunk(t, p):
        return (
            struct.pack(">I", len(p)) + t + p
            + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
        )

    data = (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(read_png(data), [[1, 2], [3, 4]])


def test_png_multiple_idat_chunks_concatenate():
    px = _ramp(4, 4)
    enc = write_png(px)
    # split the single IDAT into two chunks by re-chunking its payload
    sig, rest = enc[:8], enc[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (ln,) = struct.unpack(">I", rest[pos : pos + 4])
        chunks.append((rest[pos + 4 : pos + 8], rest[pos + 8 : pos + 8 + ln]))
        pos += 12 + ln
    out = sig

    def chunk(t, p):
        return (
            struct.pack(">I", len(p)) + t + p
            + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
        )

    for t, p in chunks:
        if t == b"IDAT":
            out += chunk(b"IDAT", p[: len(p) // 2])
            out += chunk(b"IDAT", p[len(p) // 2 :])
        else:
            out += chunk(t, p)
    np.testing.assert_array_equal(read_png(out), px)


def test_png_crc_corruption_detected():
    enc = bytearray(write_png(_ramp(3, 3)))
    enc[40] ^= 0xFF  # flip a byte inside IDAT payload
    with pytest.raises(ValueError, match="CRC"):
        read_png(bytes(enc))


def test_png_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        read_png(b"\x88PNG\r\n\x1a\n" + b"x" * 30)


# ---------------------------------------------------------------------------
# BMP

@pytest.mark.parametrize("w", [1, 2, 3, 4, 5])  # all padding residues
def test_bmp_roundtrip_row_padding(w):
    px = _ramp(3, w, 3)
    out = read_bmp(write_bmp(px))
    np.testing.assert_array_equal(out, px)


def test_bmp_golden_handbuilt_topdown():
    """Decode a hand-assembled TOP-DOWN (negative height) BMP our writer
    never produces: 1x2, pixels RGB (10,20,30) then (40,50,60)."""
    row = bytes([30, 20, 10, 60, 50, 40]) + b"\x00\x00"  # BGR + pad to 8
    header = struct.pack("<2sIHHI", b"BM", 54 + len(row), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 24, 0, len(row), 0, 0, 0, 0)
    out = read_bmp(header + info + row)
    np.testing.assert_array_equal(out, [[[10, 20, 30], [40, 50, 60]]])


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError, match="magic"):
        read_bmp(b"XX" + b"\x00" * 60)
    header = struct.pack("<2sIHHI", b"BM", 62, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, 8, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="bpp=8"):
        read_bmp(header + info + b"\x00" * 8)


def test_cross_format_same_pixels():
    gray = _ramp(9, 5)
    rgb = np.repeat(gray[:, :, None], 3, 2)
    png_px = read_png(write_png(gray))
    bmp_px = read_bmp(write_bmp(rgb))
    np.testing.assert_array_equal(bmp_px[:, :, 0], png_px)
    fmt_p, _ = decode_image(write_png(gray))
    fmt_b, _ = decode_image(write_bmp(rgb))
    assert (fmt_p, fmt_b) == ("png", "bmp")


def test_decode_image_rejects_unknown_magic():
    with pytest.raises(ValueError, match="magic"):
        decode_image(b"GIF89a....")


# ---------------------------------------------------------------------------
# property: any uint8 raster survives the round trip

@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 8),
    w=st.integers(1, 8),
    c=st.sampled_from([None, 2, 3, 4]),
    f=st.integers(0, 4),
    data=st.data(),
)
def test_png_roundtrip_property(h, w, c, f, data):
    n = h * w * (c or 1)
    vals = data.draw(
        st.lists(st.integers(0, 255), min_size=n, max_size=n)
    )
    px = np.array(vals, dtype=np.uint8).reshape(
        (h, w) if c is None else (h, w, c)
    )
    np.testing.assert_array_equal(read_png(write_png(px, filter_type=f)), px)


@settings(max_examples=30, deadline=None)
@given(h=st.integers(1, 8), w=st.integers(1, 8), data=st.data())
def test_bmp_roundtrip_property(h, w, data):
    n = h * w * 3
    vals = data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    px = np.array(vals, dtype=np.uint8).reshape(h, w, 3)
    np.testing.assert_array_equal(read_bmp(write_bmp(px)), px)


# ---------------------------------------------------------------------------
# Spark path

def test_mm_decode_matches_arithmetic(spark):
    """decode_images over attach_image_payload reproduces the raster
    definition: dims and channel-0 sum from doc_id arithmetic alone."""
    from icenetetl_spark.queries.multimodal import mm_decode

    rows = mm_decode(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows:
        d = r["doc_id"]
        w, h = 1 + d % 16, 1 + (d // 16) % 16
        assert (r["width"], r["height"]) == (w, h)
        assert r["format"] == ("png" if d % 2 == 0 else "bmp")
        assert r["n_pixels"] == w * h
        assert r["pixel_sum"] == int(((d + np.arange(w * h)) % 256).sum())


def test_image_dhash_identical_rasters_collide_and_gradients_differ(spark):
    from icenetetl_spark.operators.multimodal import (
        attach_image_payload,
        image_dhash,
    )

    # ids 256 apart share (w, h) AND pixel values ((id + i) % 256 equal) ->
    # identical rasters -> identical dHash. For the difference case the
    # raster must contain the 255->0 wrap at distinct sampled positions
    # (a wrap-free ramp is monotone -> all-ones hash for any id): id 250
    # (11x16 raster, wrap at pixel 6) vs id 252 (13x16, wrap at pixel 4).
    df = spark.createDataFrame([(250,), (506,), (762,), (252,)], "doc_id long")
    fp = {
        r["doc_id"]: r["dhash"]
        for r in image_dhash(attach_image_payload(df)).collect()
    }
    assert fp[250] == fp[506] == fp[762]
    assert 0 <= fp[250] < (1 << 32)
    assert fp[252] != fp[250]


def test_image_dhash_pairs_match_allpairs_hamming(spark):
    from pyspark.sql import functions as F

    from icenetetl_spark.operators.dedup import simhash_near_pairs
    from icenetetl_spark.operators.multimodal import (
        attach_image_payload,
        image_dhash,
    )

    df = spark.range(60).select(F.col("id").alias("doc_id"))
    fp = image_dhash(attach_image_payload(df)).select(
        "doc_id", F.col("dhash").alias("simhash")
    )
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(fp, max_hamming=3, num_bits=32).collect()
    }
    rows = {r["doc_id"]: r["simhash"] for r in fp.collect()}
    want = {
        (a, b, bin(rows[a] ^ rows[b]).count("1"))
        for a in rows
        for b in rows
        if a < b and bin(rows[a] ^ rows[b]).count("1") <= 3
    }
    assert got == want and len(want) > 0
