"""NetCDF ingestion source (reference S2, processor.py:117-124).

The reference parses whole blob bytes with xarray inside the function worker.
Spark restatement: ``binaryFile`` scan -> ``mapInPandas`` partition function
that opens each file's bytes and emits the melted long form —
embarrassingly parallel across files, memory bounded per file (SURVEY.md §7
hard-part 4: chunk by leadtime inside the parser for very large files, or
standardize on a Parquet landing zone upstream).

Two parser backends, preferred in order:
1. xarray (any NetCDF flavor incl. NetCDF-4/HDF5) when installed — the
   reference pins these engines at azfunctions/requirements.txt:3-4;
2. the pure-numpy NetCDF-3 classic reader (``sources.netcdf3``) —
   always available, covers the classic format end-to-end, and raises a
   clear error on NetCDF-4 bytes.
"""

from __future__ import annotations

import io
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from icenetetl_spark.schemas import ICENET_RAW

try:  # optional dependency
    import xarray  # type: ignore

    HAS_XARRAY = True
except ImportError:
    xarray = None
    HAS_XARRAY = False

# CF time units: "<step>s since <timestamp>" (public CF conventions §4.4)
_CF_UNITS = re.compile(
    r"^\s*(day|hour|minute|second|millisecond|microsecond)s?\s+since\s+(.+)$",
    re.IGNORECASE,
)
_CF_STEP = {
    "day": "D",
    "hour": "h",
    "minute": "m",
    "second": "s",
    "millisecond": "ms",
    "microsecond": "us",
}


def read_binary_files(spark: SparkSession, path: str, glob: str = "*.nc") -> DataFrame:
    """The blob-container scan: one row per file with content bytes."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def _decode_cf(values: np.ndarray, attrs: dict) -> np.ndarray:
    """CF time decoding (units attr "days since ..."), matching xarray's
    default decode_times for integer offsets; non-time vars pass through."""
    units = attrs.get("units")
    m = _CF_UNITS.match(units) if isinstance(units, str) else None
    if not m:
        return values
    step = _CF_STEP[m.group(1).lower()]
    base = pd.Timestamp(m.group(2).strip()).to_datetime64()
    step_us = np.timedelta64(1, step).astype("timedelta64[us]")
    if values.dtype.kind in "iu":
        return base.astype("datetime64[us]") + values.astype("int64") * step_us
    # Float offsets (xarray parity): scale in float microseconds so
    # fractional steps survive, and map non-finite values (masked
    # _FillValue -> NaN) to NaT instead of int64-casting NaN (undefined).
    offs_us = values.astype("float64") * float(step_us.astype("int64"))
    out = base.astype("datetime64[us]") + np.where(
        np.isfinite(offs_us), np.round(offs_us), 0
    ).astype("int64") * np.timedelta64(1, "us")
    return np.where(np.isfinite(offs_us), out, np.datetime64("NaT", "us"))


def _melt_nc3(content: bytes) -> pd.DataFrame:
    """Classic-format bytes -> the same long form xarray's
    ``to_dataframe().reset_index()`` yields for these files: the cartesian
    index over the file's dims (in file order), every variable broadcast
    onto it, CF times decoded, float ``_FillValue`` masked to NaN."""
    from icenetetl_spark.sources.netcdf3 import parse_netcdf3

    return melt_ncfile(parse_netcdf3(content))


def melt_ncfile(nc) -> pd.DataFrame:
    """NC3File-shaped dataset (any backend: classic parser, Zarr store)
    -> the xarray-parity long form (cartesian dim index, variables
    broadcast, CF time decode, _FillValue masking)."""
    index_dims = [d for d in nc.dims if any(d in v.dims for v in nc.variables.values())]
    shape = tuple(nc.dims[d] for d in index_dims)
    axis_of = {d: i for i, d in enumerate(index_dims)}

    cols: dict[str, np.ndarray] = {}
    for d in index_dims:  # coordinate columns: the dim's own variable or 0..n
        if d in nc.variables:
            v = nc.variables[d]
            vals = _decode_cf(v.data, v.attrs)
        else:
            vals = np.arange(nc.dims[d])
        cols[d] = np.broadcast_to(
            vals.reshape([-1 if x == d else 1 for x in index_dims]), shape
        ).ravel()
    for name in nc.var_order:  # data vars broadcast onto the full index
        if name in index_dims:
            continue
        v = nc.variables[name]
        data = v.data
        if data.dtype.kind == "f" and "_FillValue" in v.attrs:
            data = np.where(data == v.attrs["_FillValue"], np.nan, data)
        # CF-dated DATA vars decode too (xarray parity — not only the
        # dimension coordinates handled above)
        data = _decode_cf(data, v.attrs)
        # transpose the var's axes into index order, then length-1 the rest
        order = sorted(range(len(v.dims)), key=lambda i: axis_of[v.dims[i]])
        data = np.transpose(data, order) if order != list(range(len(order))) else data
        tdims = [v.dims[i] for i in order]
        cols[name] = np.broadcast_to(
            data.reshape([nc.dims[x] if x in tdims else 1 for x in index_dims]),
            shape,
        ).ravel()
    return pd.DataFrame(cols)


def _melt_one(content: bytes) -> pd.DataFrame:
    """bytes -> long-form rows; mirrors processor.py:121-160 semantics
    (open, normalize names downstream, keep dense values — the sic_mean>0
    filter and dropna run in the pipeline, not the parser)."""
    if HAS_XARRAY:
        ds = xarray.open_dataset(io.BytesIO(content))
        return ds.to_dataframe().reset_index()
    return _melt_nc3(content)


def file_attrs(content: bytes):
    """Global attributes -> FileAttrs for hemisphere routing
    (processor.py:137-153). Genuinely header-only on the classic path
    (``load_data=False`` stops after the var list — O(header), no array
    materialization, so routing a multi-GB blob costs nothing)."""
    from icenetetl_spark.plans.icenet import FileAttrs

    if HAS_XARRAY:
        attrs = dict(xarray.open_dataset(io.BytesIO(content)).attrs)
    else:
        from icenetetl_spark.sources.netcdf3 import parse_netcdf3

        attrs = parse_netcdf3(content, load_data=False).attrs

    return file_attrs_from_mapping(attrs)


def file_attrs_from_mapping(attrs: dict):
    """Attribute dict (any backend: classic header, Zarr .zattrs, xarray)
    -> FileAttrs for hemisphere routing."""
    from icenetetl_spark.plans.icenet import FileAttrs

    def _f(key):
        v = attrs.get(key)
        return float(v) if v is not None else None

    return FileAttrs(
        geospatial_lat_max=_f("geospatial_lat_max"),
        geospatial_lat_min=_f("geospatial_lat_min"),
        keywords=str(attrs.get("keywords", "")),
    )


def melt_netcdf_files(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows -> melted long-form DataFrame (ICENET_RAW schema).

    Old-format variable names (``mean``/``stddev``) are normalized here,
    inside the parse — mirroring the reference, which renames immediately
    after opening the dataset (processor.py:125-133) — because the
    mapInPandas schema contract prunes to ICENET_RAW's columns and would
    otherwise reject old-format files before the pipeline's rename ran."""
    from icenetetl_spark.plans.icenet import RENAME_MAP

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                melted = _melt_one(bytes(content))
                renames = {
                    old: new
                    for old, new in RENAME_MAP.items()
                    if old in melted.columns and new not in melted.columns
                }
                if renames:
                    melted = melted.rename(columns=renames)
                yield melted[[f.name for f in ICENET_RAW.fields]]

    return binary_df.select("content").mapInPandas(parse, ICENET_RAW)
