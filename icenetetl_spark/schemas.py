"""Explicit StructType schemas for the IceNet data model (SURVEY.md §1.2,
FIXTURES.md) — the Spark restatement of the reference's hardcoded DDL
(processor.py:200-207, 276-289, 354-363).

Design decisions vs the reference:
- The per-hemisphere twin tables (processor.py:27-43) become ONE table with a
  ``hemisphere`` partition column.
- ``SERIAL`` surrogate keys become deterministic hashes (xxhash64 over the
  natural key) — ids differ from Postgres' sequences but uniqueness and join
  semantics are preserved (SURVEY.md §7 hard-part 1).
- PostGIS geometry columns become WKT strings + SRID ints (geometry is only
  constructed/stored/returned in the reference, never computed on).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Long-form melted NetCDF input (one row per (time, leadtime, yc, xc) cell),
# the shape produced by processor.py:158-160.
ICENET_RAW = StructType(
    [
        StructField("time", TimestampType()),
        StructField("leadtime", IntegerType()),
        StructField("xc", DoubleType()),          # km
        StructField("yc", DoubleType()),          # km
        StructField("lat", DoubleType()),          # dropped by pipeline
        StructField("lon", DoubleType()),          # dropped by pipeline
        StructField("Lambert_Azimuthal_Grid", IntegerType()),  # dropped
        StructField("sic_mean", FloatType()),
        StructField("sic_stddev", FloatType()),
    ]
)

CELLS = StructType(
    [
        StructField("cell_id", LongType()),
        StructField("hemisphere", StringType()),
        StructField("centroid_x", IntegerType()),  # metres
        StructField("centroid_y", IntegerType()),
        StructField("geom_laea_wkt", StringType()),
        StructField("srid_laea", IntegerType()),   # 6931 north / 6932 south
        StructField("geom_4326_wkt", StringType()),
    ]
)

FORECASTS = StructType(
    [
        StructField("forecast_id", LongType()),
        StructField("hemisphere", StringType()),
        StructField("date_forecast_generated", DateType()),
        StructField("date_forecast_for", DateType()),
        StructField("cell_id", LongType()),
        StructField("sea_ice_concentration_mean", FloatType()),
        StructField("sea_ice_concentration_stddev", FloatType()),
    ]
)

FORECAST_META = StructType(
    [
        StructField("forecast_meta_id", LongType()),
        StructField("date_forecast_generated", DateType()),
        StructField("date_forecast_first", DateType()),
        StructField("date_forecast_last", DateType()),
        StructField("hemisphere", StringType()),
        StructField("n_records", LongType()),
    ]
)

# EPSG codes per hemisphere, processor.py:44-47
SRID_BY_HEMISPHERE = {"north": 6931, "south": 6932}
