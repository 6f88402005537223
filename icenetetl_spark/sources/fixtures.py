"""Deterministic IceNet-shaped fixtures (FIXTURES.md §1): the long-form
equivalent of one melted NetCDF file, generated with a fixed seed.

Includes the features the pipeline must exercise: ~20% rows with
``sic_mean <= 0`` (filtered), a few null ``sic_stddev`` (dropped by the
'any'-semantics dropna), droppable passthrough columns, and an old-format
variant (``mean``/``stddev`` names).

``write_raw_fixture`` persists the same frame as a parquet file both engines
can read — this is what gives the flagship ``icenet_pipeline_latest`` query
a DuckDB oracle (the fixture becomes a table the oracle can see, closing the
round-2 rows-only gap).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from icenetetl_spark.plans.icenet import FileAttrs
from icenetetl_spark.schemas import ICENET_RAW


def make_raw_pdf(
    generated: str,
    grid_side: int = 16,
    leadtimes: int = 5,
    step_km: float = 25.0,
    seed: int = 42,
) -> pd.DataFrame:
    """The fixture as a pandas frame — pure numpy/pandas so it can be built
    (and written to parquet) without a SparkSession."""
    rng = np.random.default_rng(seed)
    xs = np.arange(grid_side) * step_km
    ys = np.arange(grid_side) * step_km
    lead, yy, xx = np.meshgrid(
        np.arange(1, leadtimes + 1), ys, xs, indexing="ij"
    )
    n = lead.size
    sic_mean = rng.uniform(-0.25, 1.0, n).astype(np.float32)  # ~20% <= 0
    sic_stddev = rng.uniform(0.0, 0.5, n).astype(np.float32)
    null_mask = rng.uniform(size=n) < 0.02
    sic_stddev = np.where(null_mask, np.nan, sic_stddev).astype(np.float32)

    return pd.DataFrame(
        {
            # microsecond precision: parquet TIMESTAMP(NANOS) would need the
            # nanosAsLong shim on the Spark side (see sources/testdata.py)
            "time": pd.Series(
                [pd.Timestamp(generated)] * n, dtype="datetime64[us]"
            ),
            "leadtime": lead.ravel().astype(np.int32),
            "xc": xx.ravel(),
            "yc": yy.ravel(),
            "lat": rng.uniform(60, 90, n),
            "lon": rng.uniform(-180, 180, n),
            "Lambert_Azimuthal_Grid": np.int32(0),
            "sic_mean": sic_mean,
            "sic_stddev": sic_stddev,
        }
    )


def write_raw_fixture(path: str, generated: str, **kwargs) -> str:
    """Write the deterministic fixture to ``path`` (parquet), ALWAYS
    rewriting: a write-if-absent cache would silently desynchronize the
    DuckDB oracle's input from the Spark side's in-memory frame the moment
    the generator changes (same filename, stale bytes — a hash-gate
    mismatch that masquerades as an engine-semantics bug). The frame is
    ~1k rows, so regenerating per process costs milliseconds. Atomic
    (tmp + rename) so a concurrent reader never sees a partial file.
    Returns ``path``. Both Spark and the DuckDB oracle read this same file,
    so their inputs are byte-identical."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pdf = make_raw_pdf(generated, **kwargs)
    tmp = f"{path}.tmp-{os.getpid()}"
    pdf.to_parquet(tmp, engine="pyarrow", index=False)
    os.replace(tmp, path)
    return path


def make_netcdf_bytes(
    generated: str,
    hemisphere: str = "north",
    grid_side: int = 16,
    leadtimes: int = 5,
    step_km: float = 25.0,
    seed: int = 42,
    old_format: bool = False,
    as_dataset: bool = False,
) -> bytes:
    """The same fixture as a REAL NetCDF-3 classic file (sources.netcdf3
    writer): dims (time, leadtime, yc, xc), CF-dated time axis, 2-D lat/lon
    aux coords, hemisphere global attrs. The sic arrays are
    ``make_raw_pdf``'s columns reshaped, so a pipeline fed from these bytes
    must produce IDENTICAL catalog tables to one fed the in-memory fixture
    with the same parameters (lat/lon differ but are dropped before any
    output; neither carries nulls, so dropna row selection is unaffected).
    """
    from icenetetl_spark.sources.netcdf3 import NC3Var, write_netcdf3

    pdf = make_raw_pdf(generated, grid_side, leadtimes, step_km, seed)
    shape = (1, leadtimes, grid_side, grid_side)
    xs = (np.arange(grid_side) * step_km).astype(np.float64)
    days = np.array(
        [(pd.Timestamp(generated) - pd.Timestamp("1970-01-01")).days],
        dtype=np.int32,
    )
    lat_sign = 1.0 if hemisphere == "north" else -1.0
    yy, xx = np.meshgrid(np.arange(grid_side), np.arange(grid_side), indexing="ij")
    lat2d = lat_sign * (60.0 + 30.0 * yy / max(grid_side - 1, 1))
    lon2d = -180.0 + 360.0 * xx / grid_side
    mean_name = "mean" if old_format else "sic_mean"
    std_name = "stddev" if old_format else "sic_stddev"
    variables = [
        NC3Var("time", ("time",), {"units": "days since 1970-01-01"}, days),
        NC3Var(
            "leadtime",
            ("leadtime",),
            {},
            np.arange(1, leadtimes + 1, dtype=np.int32),
        ),
        NC3Var("yc", ("yc",), {"units": "km"}, xs.copy()),
        NC3Var("xc", ("xc",), {"units": "km"}, xs),
        NC3Var("lat", ("yc", "xc"), {}, lat2d),
        NC3Var("lon", ("yc", "xc"), {}, lon2d),
        NC3Var(
            "Lambert_Azimuthal_Grid", (), {}, np.array(0, dtype=np.int32)
        ),
        NC3Var(
            mean_name,
            ("time", "leadtime", "yc", "xc"),
            {},
            pdf["sic_mean"].to_numpy().reshape(shape),
        ),
        NC3Var(
            std_name,
            ("time", "leadtime", "yc", "xc"),
            {},
            pdf["sic_stddev"].to_numpy().reshape(shape),
        ),
    ]
    attrs = {
        "keywords": f"sea ice forecast {hemisphere}",
    }
    if hemisphere == "north":
        attrs["geospatial_lat_max"] = np.float64(85.0)
    else:
        attrs["geospatial_lat_min"] = np.float64(-85.0)
    dims = {"time": 1, "leadtime": leadtimes, "yc": grid_side, "xc": grid_side}
    if as_dataset:
        return dims, variables, attrs
    return write_netcdf3(dims, variables, attrs)


def make_zarr_store(
    path: str,
    generated: str,
    hemisphere: str = "north",
    grid_side: int = 16,
    leadtimes: int = 5,
    step_km: float = 25.0,
    seed: int = 42,
    compressor: dict | None = None,
) -> str:
    """The SAME fixture dataset as ``make_netcdf_bytes``, written as a
    Zarr v2 directory store (sources.zarrstore writer) — feeds the
    format-agnostic ingest e2e. Zarr JSON attrs must be plain Python
    scalars, so numpy attr values are converted."""
    from icenetetl_spark.sources.zarrstore import write_zarr

    _, variables, attrs = make_netcdf_bytes(
        generated, hemisphere, grid_side, leadtimes, step_km, seed,
        as_dataset=True,
    )
    attrs = {
        k: (float(v) if isinstance(v, np.floating) else v)
        for k, v in attrs.items()
    }
    # Atomic creation (the write_raw_fixture tmp+rename pattern, here for a
    # DIRECTORY): write_zarr lays .zgroup down FIRST, so an interrupted or
    # concurrently-observed in-place write looks like a complete store to
    # any .zgroup-keyed existence check and would be reused forever. Build
    # in a tmp dir and os.replace() it into place — the renamed ROOT is the
    # completeness marker. A lost race (target appeared meanwhile) is fine:
    # the content is deterministic, keep the winner.
    import shutil

    tmp = f"{path}.tmp-{os.getpid()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    write_zarr(tmp, variables, attrs, compressor=compressor)
    try:
        os.replace(tmp, path)
    except OSError:
        if os.path.isdir(os.path.join(path)) and os.path.exists(
            os.path.join(path, ".zgroup")
        ):
            shutil.rmtree(tmp)  # concurrent creator won; identical bytes
        else:
            raise
    return path


def make_raw_file(
    spark: SparkSession,
    generated: str,
    hemisphere: str = "north",
    grid_side: int = 16,
    leadtimes: int = 5,
    step_km: float = 25.0,
    seed: int = 42,
    old_format: bool = False,
) -> tuple[DataFrame, FileAttrs]:
    """One fixture file ≙ one blob event. ``generated`` is the forecast
    generation date (single distinct ``time`` per file, processor.py:368-370).
    """
    pdf = make_raw_pdf(generated, grid_side, leadtimes, step_km, seed)
    df = spark.createDataFrame(pdf, schema=ICENET_RAW)
    if old_format:
        df = (
            df.withColumnRenamed("sic_mean", "mean")
            .withColumnRenamed("sic_stddev", "stddev")
        )
    attrs = (
        FileAttrs(geospatial_lat_max=85.0)
        if hemisphere == "north"
        else FileAttrs(geospatial_lat_min=-85.0)
    )
    return df, attrs
