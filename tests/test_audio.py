"""WAV codec: write/read round trips, chunk walking, and loud failures —
the sources/netcdf3.py / sources/images.py property-test pattern."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from icenetetl_spark.sources.audio import read_wav, write_wav


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("channels", [1, 2, 4])
@pytest.mark.parametrize("rate", [8000, 44100])
def test_roundtrip(channels, rate):
    s = _rng(channels * rate).integers(
        -32768, 32768, size=(37, channels), dtype=np.int16
    )
    rate_back, arr = read_wav(write_wav(s, rate))
    assert rate_back == rate
    assert arr.shape == (37, channels)
    assert np.array_equal(arr, s)


def test_mono_1d_input_roundtrips_as_one_channel():
    s = _rng(7).integers(-32768, 32768, size=50, dtype=np.int16)
    rate, arr = read_wav(write_wav(s, 16000))
    assert arr.shape == (50, 1)
    assert np.array_equal(arr[:, 0], s)


def test_extreme_sample_values_survive():
    s = np.array([[-32768], [32767], [0], [-1]], dtype=np.int16)
    _, arr = read_wav(write_wav(s, 8000))
    assert np.array_equal(arr, s)


def test_chunk_walk_skips_unknown_chunks_and_pad_byte():
    """Real encoders interleave LIST/fact chunks (odd sizes get a pad
    byte); the reader must walk, not assume canonical layout."""
    s = _rng(3).integers(-32768, 32768, size=(10, 1), dtype=np.int16)
    canonical = write_wav(s, 8000)
    # splice an odd-sized junk chunk between 'fmt ' and 'data'
    fmt_end = canonical.index(b"data")
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad to even
    spliced = canonical[:fmt_end] + junk + canonical[fmt_end:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    rate, arr = read_wav(spliced)
    assert rate == 8000 and np.array_equal(arr, s)


def test_header_layout_is_canonical():
    b = write_wav(np.zeros((4, 2), dtype=np.int16), 12000)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    assert b[12:16] == b"fmt " and struct.unpack_from("<I", b, 16)[0] == 16
    fmt, ch, rate, byte_rate, block, bits = struct.unpack_from("<HHIIHH", b, 20)
    assert (fmt, ch, rate, bits) == (1, 2, 12000, 16)
    assert block == 4 and byte_rate == 48000
    assert struct.unpack_from("<I", b, 4)[0] == len(b) - 8


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"JUNK" + b[4:], "RIFF"),
        (lambda b: b[:50], "truncated"),
        (lambda b: b[: b.index(b"data")], "missing fmt or data"),
        (
            lambda b: b[:20] + struct.pack("<H", 3) + b[22:],
            "format tag",
        ),
        (
            lambda b: b[:20] + b[20:34] + struct.pack("<H", 8) + b[36:],
            "bit depth",
        ),
    ],
)
def test_corrupt_inputs_raise(mutate, msg):
    good = write_wav(np.zeros((8, 1), dtype=np.int16), 8000)
    with pytest.raises(ValueError, match=msg):
        read_wav(mutate(good))


def test_non_int16_input_rejected_on_write():
    with pytest.raises(ValueError, match="int16"):
        write_wav(np.zeros(4, dtype=np.float32), 8000)


def test_audio_fingerprint_bits_and_near_dup_roundtrip(spark):
    from pyspark.sql import functions as F

    from icenetetl_spark.operators.dedup import simhash_near_pairs
    from icenetetl_spark.operators.multimodal import (
        attach_audio_payload,
        audio_fingerprint,
    )

    df = spark.range(80).select(F.col("id").alias("doc_id"))
    fp = audio_fingerprint(attach_audio_payload(df))
    rows = {r["doc_id"]: r["afp"] for r in fp.collect()}
    assert all(0 <= v < (1 << 32) for v in rows.values())
    assert len(set(rows.values())) > 1  # wrap positions vary with id
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(
            fp.select("doc_id", F.col("afp").alias("simhash")),
            max_hamming=2,
            num_bits=32,
        ).collect()
    }
    want = {
        (a, b, bin(rows[a] ^ rows[b]).count("1"))
        for a in rows
        for b in rows
        if a < b and bin(rows[a] ^ rows[b]).count("1") <= 2
    }
    assert got == want
