"""Zarr v2 store: round-trip, spec-literal hand-built stores, and melt
parity with the NetCDF-3 path (same content -> identical long form)."""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pandas as pd
import pytest

from icenetetl_spark.sources.netcdf3 import NC3Var, write_netcdf3
from icenetetl_spark.sources.zarrstore import (
    melt_zarr_dir,
    read_zarr,
    write_zarr,
)


def _vars():
    time = NC3Var(
        "time",
        ("time",),
        {"units": "days since 2020-01-01"},
        np.array([0, 1, 2], dtype=np.int32),
    )
    y = NC3Var("yc", ("yc",), {}, np.array([10.0, 20.0], dtype=np.float64))
    sic = NC3Var(
        "sic_mean",
        ("time", "yc"),
        {"_FillValue": -999.0},
        np.array(
            [[0.1, 0.2], [0.3, -999.0], [0.5, 0.6]], dtype=np.float64
        ),
    )
    return [time, y, sic]


def test_roundtrip_plain_and_zlib_and_chunked(tmp_path):
    for tag, comp, chunks in [
        ("plain", None, None),
        ("zlib", {"id": "zlib", "level": 6}, None),
        ("chunked", {"id": "zlib", "level": 1}, {"sic_mean": (2, 1)}),
    ]:
        p = str(tmp_path / tag)
        write_zarr(p, _vars(), {"hemisphere": "north"}, chunks, comp)
        nc = read_zarr(p)
        assert nc.attrs == {"hemisphere": "north"}
        assert nc.dims == {"time": 3, "yc": 2}
        assert nc.variables["sic_mean"].dims == ("time", "yc")
        np.testing.assert_array_equal(
            nc.variables["sic_mean"].data, _vars()[2].data
        )
        np.testing.assert_array_equal(
            nc.variables["time"].data, np.array([0, 1, 2], np.int32)
        )
        assert nc.variables["time"].attrs["units"] == "days since 2020-01-01"


def test_handbuilt_spec_literal_store(tmp_path):
    """Assembled from raw JSON + bytes per the v2 spec (not via the
    writer): F order, zlib, a 2x2 chunk grid with padded edge chunks, and
    one MISSING chunk resolving to fill_value."""
    root = tmp_path / "store"
    a = root / "t2m"
    os.makedirs(a)
    (root / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    meta = {
        "zarr_format": 2,
        "shape": [3, 3],
        "chunks": [2, 2],
        "dtype": "<f4",
        "compressor": {"id": "zlib", "level": 1},
        "fill_value": "NaN",
        "order": "F",
        "filters": None,
    }
    (a / ".zarray").write_text(json.dumps(meta))
    (a / ".zattrs").write_text(json.dumps({"_ARRAY_DIMENSIONS": ["y", "x"]}))

    def put(idx, block):  # block is the FULL 2x2 nominal chunk
        raw = np.asfortranarray(block.astype("<f4")).tobytes(order="F")
        (a / idx).write_bytes(zlib.compress(raw, 1))

    put("0.0", np.array([[1, 2], [4, 5]]))
    put("0.1", np.array([[3, 99], [6, 99]]))  # edge pad values ignored
    put("1.0", np.array([[7, 8], [99, 99]]))
    # chunk 1.1 deliberately missing -> fill (NaN)

    nc = read_zarr(str(root))
    got = nc.variables["t2m"].data
    want = np.array(
        [[1, 2, 3], [4, 5, 6], [7, 8, np.nan]], dtype=np.float32
    )
    np.testing.assert_array_equal(got, want)
    assert nc.dims == {"y": 3, "x": 3}


def test_unsupported_compressor_raises(tmp_path):
    a = tmp_path / "s" / "v"
    os.makedirs(a)
    (tmp_path / "s" / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    (a / ".zarray").write_text(
        json.dumps(
            {
                "zarr_format": 2,
                "shape": [1],
                "chunks": [1],
                "dtype": "<i4",
                "compressor": {"id": "blosc", "cname": "lz4"},
                "fill_value": 0,
                "order": "C",
                "filters": None,
            }
        )
    )
    (a / "0").write_bytes(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="blosc"):
        read_zarr(str(tmp_path / "s"))


def test_missing_chunk_without_fill_raises(tmp_path):
    a = tmp_path / "s" / "v"
    os.makedirs(a)
    (tmp_path / "s" / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    (a / ".zarray").write_text(
        json.dumps(
            {
                "zarr_format": 2,
                "shape": [2],
                "chunks": [2],
                "dtype": "<i4",
                "compressor": None,
                "fill_value": None,
                "order": "C",
                "filters": None,
            }
        )
    )
    with pytest.raises(ValueError, match="missing"):
        read_zarr(str(tmp_path / "s"))


def test_melt_parity_with_netcdf3(tmp_path):
    """The SAME dataset written as classic NetCDF and as a Zarr store
    melts to the identical long form — the format-agnostic ingest claim."""
    from icenetetl_spark.sources.netcdf import _melt_nc3

    variables = _vars()
    nc_bytes = write_netcdf3(
        {"time": 3, "yc": 2}, variables, {"hemisphere": "north"}
    )
    zdir = str(tmp_path / "store")
    write_zarr(zdir, variables, {"hemisphere": "north"})
    a = _melt_nc3(nc_bytes)
    b = melt_zarr_dir(zdir)
    pd.testing.assert_frame_equal(
        a.sort_index(axis=1), b.sort_index(axis=1)
    )
    # CF time decoded identically on both paths
    assert str(a["time"].iloc[0]) == "2020-01-01 00:00:00"


def test_spark_distributed_store_ingest(spark, tmp_path):
    from icenetetl_spark.sources.zarrstore import melt_zarr_stores

    paths = []
    for i in range(3):
        p = str(tmp_path / f"s{i}")
        write_zarr(p, _vars(), {"idx": i})
        paths.append(p)
    df = melt_zarr_stores(spark, paths)
    rows = df.collect()
    assert len(rows) == 3 * 6  # 3 stores x (3 time x 2 yc)
    assert set(df.columns) == {"time", "yc", "sic_mean"}


def test_zarr_ingest_end_to_end_matches_dataframe_path(spark, tmp_path):
    """Format-agnostic S2: Zarr stores on disk -> distributed melt ->
    pipeline produces the SAME catalog tables as the in-memory fixture
    path with identical parameters (the .nc e2e's Zarr twin)."""
    from icenetetl_spark.catalog import ParquetCatalog
    from icenetetl_spark.plans.icenet import IceNetPipeline
    from icenetetl_spark.sources.fixtures import make_raw_file, make_zarr_store
    from icenetetl_spark.sources.netcdf import file_attrs_from_mapping
    from icenetetl_spark.sources.zarrstore import melt_zarr_stores, read_zarr

    files = [
        ("2024-03-01", "north", 1),
        ("2024-03-08", "north", 2),
        ("2024-03-05", "south", 3),
    ]
    cat_z = ParquetCatalog(spark, str(tmp_path / "wh_z"))
    pipe_z = IceNetPipeline(cat_z)
    for date, hemi, seed in files:
        store = make_zarr_store(
            str(tmp_path / f"{hemi}_{date}"),
            date,
            hemi,
            grid_side=6,
            leadtimes=3,
            seed=seed,
            compressor={"id": "zlib", "level": 1},
        )
        attrs = file_attrs_from_mapping(read_zarr(store).attrs)
        pipe_z.run(melt_zarr_stores(spark, [store]), attrs)

    cat_df = ParquetCatalog(spark, str(tmp_path / "wh_df"))
    pipe_df = IceNetPipeline(cat_df)
    for date, hemi, seed in files:
        f, a = make_raw_file(spark, date, hemi, grid_side=6, leadtimes=3, seed=seed)
        pipe_df.run(f, a)

    for table in ["cells", "forecasts", "forecast_latest", "forecast_meta"]:
        a = sorted(map(str, cat_z.read(table).collect()))
        b = sorted(map(str, cat_df.read(table).collect()))
        assert a == b, f"{table}: Zarr path diverged from DataFrame path"


def test_export_forecasts_roundtrip(spark, tmp_path):
    """forecasts table -> per-date Zarr stores -> melt back: every
    exported value matches the table, absent grid cells read as NaN."""
    import math

    from icenetetl_spark.catalog import ParquetCatalog
    from icenetetl_spark.plans.icenet import IceNetPipeline
    from icenetetl_spark.sources.fixtures import make_raw_file
    from icenetetl_spark.sources.zarrstore import (
        export_forecasts_to_zarr,
        melt_zarr_dir,
    )

    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    pipe = IceNetPipeline(cat)
    for date, seed in [("2024-03-01", 1), ("2024-03-08", 2)]:
        f, a = make_raw_file(spark, date, "north", grid_side=5, leadtimes=3, seed=seed)
        pipe.run(f, a)

    out = str(tmp_path / "export")
    report = export_forecasts_to_zarr(
        cat.read("forecasts"),
        cat.read("cells"),
        out,
        compressor={"id": "zlib", "level": 1},
    ).collect()
    assert {r["date"] for r in report} == {"2024-03-01", "2024-03-08"}
    total = sum(r["n_values"] for r in report)
    assert total == cat.read("forecasts").count()

    # melt one store back and compare against the table slice
    store = next(r for r in report if r["date"] == "2024-03-01")["store"]
    melted = melt_zarr_dir(store)
    fc = (
        cat.read("forecasts")
        .filter("date_forecast_generated = DATE '2024-03-01'")
        .join(cat.read("cells").select("cell_id", "centroid_x", "centroid_y"), "cell_id")
        .collect()
    )
    want = {
        (r["centroid_x"], r["centroid_y"],
         (r["date_forecast_for"] - r["date_forecast_generated"]).days):
            (r["sea_ice_concentration_mean"], r["sea_ice_concentration_stddev"])
        for r in fc
    }
    got_present = {}
    n_nan = 0
    for row in melted.itertuples(index=False):
        key = (int(row.xc), int(row.yc), int(row.leadtime))
        if math.isnan(row.sic_mean):
            n_nan += 1
            assert key not in want  # NaN only where the pipeline filtered
        else:
            got_present[key] = (
                np.float32(row.sic_mean),
                np.float32(row.sic_stddev),
            )
    assert got_present == {
        k: (np.float32(a), np.float32(b)) for k, (a, b) in want.items()
    }
    assert n_nan == len(melted) - len(want)


def test_melt_preserves_storage_widths(spark, tmp_path):
    """A <f4 store column must surface as FloatType and an int32 as
    IntegerType — the round-5 driver gate went red because the melt
    widened float32 to double: numerically lossless, so every
    float()-normalizing local comparison passed, but the driver's value
    hash is dtype-sensitive and saw float64 renderings of float32 data."""
    from icenetetl_spark.sources.zarrstore import melt_zarr_stores

    variables = [
        NC3Var("xi", ("xi",), {}, np.array([1, 2], dtype=np.int32)),
        NC3Var(
            "v32", ("xi",), {}, np.array([0.5, 0.25], dtype=np.float32)
        ),
        NC3Var(
            "v64", ("xi",), {}, np.array([0.5, 0.25], dtype=np.float64)
        ),
    ]
    p = str(tmp_path / "widths")
    write_zarr(p, variables, {})
    df = melt_zarr_stores(spark, [p])
    types = dict(df.dtypes)
    assert types["v32"] == "float"
    assert types["v64"] == "double"
    assert types["xi"] == "int"
    pdf = df.toPandas()
    assert pdf["v32"].dtype == np.float32
    assert sorted(pdf["v32"].tolist()) == [0.25, 0.5]


def test_melt_uint32_values_above_int32_survive(spark, tmp_path):
    """uint32 does NOT fit Spark's int — a width-preserving map that sent
    kind 'u' itemsize 4 to IntegerType would wrap 3e9 negative under the
    Arrow cast. Unsigned needs the next width up (uint32 -> long,
    uint16 -> int)."""
    from icenetetl_spark.sources.zarrstore import _spark_type, melt_zarr_stores

    assert _spark_type(np.dtype("<u4")) == "long"
    assert _spark_type(np.dtype("<u2")) == "int"
    assert _spark_type(np.dtype("<i4")) == "int"
    big = np.array([3_000_000_000, 7], dtype=np.uint32)
    variables = [
        NC3Var("xi", ("xi",), {}, np.array([1, 2], dtype=np.int32)),
        NC3Var("u", ("xi",), {}, big),
    ]
    p = str(tmp_path / "u32")
    write_zarr(p, variables, {})
    pdf = melt_zarr_stores(spark, [p]).toPandas()
    assert sorted(pdf["u"].tolist()) == [7, 3_000_000_000]


def test_make_zarr_store_is_atomic(tmp_path):
    """The store root only appears by os.replace() of a fully-written tmp
    dir: root existence == completeness (no window where a .zgroup-keyed
    check could bless a half-written store), and a second creation into
    an existing path is a clean no-op with the tmp dir cleaned up."""
    from icenetetl_spark.sources.fixtures import make_zarr_store

    p = str(tmp_path / "store")
    make_zarr_store(p, "2024-03-01", grid_side=4, leadtimes=2)
    assert os.path.exists(os.path.join(p, ".zgroup"))
    first = read_zarr(p).variables["sic_mean"].data.copy()
    # re-create over the existing root: loses the os.replace race by
    # construction, must keep the (identical) winner and leave no tmp
    make_zarr_store(p, "2024-03-01", grid_side=4, leadtimes=2)
    assert [d for d in os.listdir(tmp_path) if "tmp" in d] == []
    np.testing.assert_array_equal(read_zarr(p).variables["sic_mean"].data, first)


def test_melt_twin_probe_refuses_scaled_input(spark):
    """The localizing twin-compare inside icenet_zarr_roundtrip localizes
    rows to the driver; it must hard-refuse anything bigger than the
    fixture so a future fixture swap can't silently turn it into a
    driver-side transfer of a scaled table."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from icenetetl_spark.queries.icenet import _assert_melt_matches_twin

    big = spark.range(10_001).select(F.col("id"))
    with _pytest.raises(AssertionError, match="10k bound"):
        _assert_melt_matches_twin(big, spark)
