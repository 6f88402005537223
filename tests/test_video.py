"""Y4M codec: round trips, header parsing, frame walking, loud failures."""

from __future__ import annotations

import numpy as np
import pytest

from icenetetl_spark.sources.video import read_y4m, write_y4m


def _frames(seed, n=4, h=6, w=8):
    return np.random.default_rng(seed).integers(
        0, 256, size=(n, h, w), dtype=np.uint8
    )


@pytest.mark.parametrize("chroma", ["420", "444"])
def test_roundtrip(chroma):
    f = _frames(3)
    params, back = read_y4m(write_y4m(f, rate=(30, 1), chroma=chroma))
    assert np.array_equal(back, f)
    assert params == {"width": 8, "height": 6, "rate": (30, 1), "chroma": chroma}


def test_zero_frames_and_single_pixel_rows():
    params, back = read_y4m(write_y4m(np.zeros((0, 2, 2), np.uint8)))
    assert back.shape == (0, 2, 2)
    f = _frames(5, n=1, h=2, w=2)
    _, b = read_y4m(write_y4m(f))
    assert np.array_equal(b, f)


def test_header_is_spec_ascii():
    b = write_y4m(np.zeros((1, 2, 4), np.uint8), rate=(25, 1))
    header = b[: b.index(b"\n")].decode("ascii")
    assert header == "YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420"
    assert b[b.index(b"\n") + 1 :][:6] == b"FRAME\n"


def test_unknown_header_params_tolerated():
    b = write_y4m(_frames(9, n=2))
    nl = b.index(b"\n")
    spliced = b[:nl] + b" Xcustom=1" + b[nl:]
    params, back = read_y4m(spliced)
    assert back.shape == (2, 6, 8)


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"AVI1" + b[4:], "not a YUV4MPEG2"),
        (lambda b: b[:-5], "truncated frame"),
        (
            lambda b: b.replace(b"FRAME\n", b"FRAMX\n", 1),
            "expected FRAME marker",
        ),
        (lambda b: b.replace(b" C420", b" C422"), "unsupported chroma"),
        (lambda b: b.replace(b" W8", b" "), "missing W or H"),
    ],
)
def test_corrupt_inputs_raise(mutate, msg):
    good = write_y4m(_frames(11))
    with pytest.raises(ValueError, match=msg):
        read_y4m(mutate(good))


def test_odd_dims_rejected_for_420():
    with pytest.raises(ValueError, match="divisible"):
        write_y4m(np.zeros((1, 3, 4), np.uint8), chroma="420")
    # but fine for 4:4:4
    params, back = read_y4m(write_y4m(np.zeros((1, 3, 5), np.uint8), chroma="444"))
    assert (params["width"], params["height"]) == (5, 3)
