"""NetCDF ingestion source (reference S2, processor.py:117-124).

The reference parses whole blob bytes with xarray inside the function worker.
Spark restatement: ``binaryFile`` scan -> ``mapInPandas`` partition function
that opens each file's bytes with xarray and emits the melted long form —
embarrassingly parallel across files, memory bounded per file (SURVEY.md §7
hard-part 4: chunk by leadtime inside the parser for very large files, or
standardize on a Parquet landing zone upstream).

xarray/h5netcdf are NOT installed in this container, so the parse step is
gated: ``melt_netcdf_files`` raises ``NotImplementedError`` at *runtime* if
xarray is missing; plan construction and schema contracts are importable and
tested regardless. (Reference pins the engines at
azfunctions/requirements.txt:3-4.)
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from icenetetl_spark.schemas import ICENET_RAW

try:  # optional dependency
    import xarray  # type: ignore

    HAS_XARRAY = True
except ImportError:
    xarray = None
    HAS_XARRAY = False


def read_binary_files(spark: SparkSession, path: str, glob: str = "*.nc") -> DataFrame:
    """The blob-container scan: one row per file with content bytes."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def _melt_one(content: bytes) -> pd.DataFrame:
    """bytes -> long-form rows; mirrors processor.py:121-160 semantics
    (open, normalize names downstream, keep dense values — the sic_mean>0
    filter and dropna run in the pipeline, not the parser)."""
    if not HAS_XARRAY:
        raise NotImplementedError(
            "xarray/h5netcdf not installed in this environment; "
            "use the Parquet landing-zone path (sources.fixtures / parquet) "
            "or install xarray+h5netcdf to enable direct NetCDF ingest"
        )
    ds = xarray.open_dataset(io.BytesIO(content))
    pdf = ds.to_dataframe().reset_index()
    return pdf


def melt_netcdf_files(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows -> melted long-form DataFrame (ICENET_RAW schema)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                melted = _melt_one(bytes(content))
                yield melted[[f.name for f in ICENET_RAW.fields]]

    return binary_df.select("content").mapInPandas(parse, ICENET_RAW)
