"""Lambert azimuthal equal-area (polar aspect, WGS84) <-> lon/lat, as
vectorized numpy inside an Arrow-batched pandas_udf.

Replaces the reference's PostGIS ``ST_Transform(geom, 4326)``
(processor.py:252) for the EASE-Grid 2.0 projections EPSG:6931 (north,
lat0=+90) / EPSG:6932 (south, lat0=-90), without a pyproj/Sedona dependency.

Formulas: Snyder, "Map Projections — A Working Manual", USGS Professional
Paper 1395 (1987), eqs. 3-11..3-18, 24-29..24-35 (ellipsoidal LAEA, polar
aspects, authalic-latitude series). Public domain.

Scale notes: the UDF is Arrow-batched and pure-numpy — O(batch) vectorized
math, no per-row Python. It runs once per *cell* (187k rows/hemisphere), not
per forecast row, and only at geometry-creation time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, functions as F
from pyspark.sql.types import StringType

# WGS84
_A = 6378137.0
_E2 = 0.00669437999014
_E = np.sqrt(_E2)

# q_p: Snyder eq. 3-12 evaluated at phi = 90deg
_QP = (1.0 - _E2) * (1.0 / (1.0 - _E2) - (1.0 / (2.0 * _E)) * np.log((1.0 - _E) / (1.0 + _E)))

# authalic -> geodetic latitude series coefficients (Snyder eq. 3-18)
_C1 = _E2 / 3.0 + 31.0 * _E2**2 / 180.0 + 517.0 * _E2**3 / 5040.0
_C2 = 23.0 * _E2**2 / 360.0 + 251.0 * _E2**3 / 3780.0
_C3 = 761.0 * _E2**3 / 45360.0


def _q(phi: np.ndarray) -> np.ndarray:
    """Snyder eq. 3-12."""
    s = np.sin(phi)
    return (1.0 - _E2) * (
        s / (1.0 - _E2 * s * s)
        - (1.0 / (2.0 * _E)) * np.log((1.0 - _E * s) / (1.0 + _E * s))
    )


def laea_forward(lon_deg: np.ndarray, lat_deg: np.ndarray, north: bool):
    """lon/lat (deg) -> polar-aspect LAEA x/y (m). Test harness twin."""
    lam = np.radians(lon_deg)
    phi = np.radians(lat_deg)
    q = _q(phi)
    if north:
        rho = _A * np.sqrt(np.maximum(_QP - q, 0.0))
        return rho * np.sin(lam), -rho * np.cos(lam)
    rho = _A * np.sqrt(np.maximum(_QP + q, 0.0))
    return rho * np.sin(lam), rho * np.cos(lam)


def laea_inverse(x: np.ndarray, y: np.ndarray, north: bool):
    """Polar-aspect LAEA x/y (m) -> (lon_deg, lat_deg). Snyder 24-31..35."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    rho = np.hypot(x, y)
    with np.errstate(invalid="ignore"):
        if north:
            q = _QP - (rho / _A) ** 2
            lam = np.arctan2(x, -y)
        else:
            q = (rho / _A) ** 2 - _QP
            lam = np.arctan2(x, y)
        beta = np.arcsin(np.clip(q / _QP, -1.0, 1.0))
    phi = (
        beta
        + _C1 * np.sin(2.0 * beta)
        + _C2 * np.sin(4.0 * beta)
        + _C3 * np.sin(6.0 * beta)
    )
    # at the exact pole (rho == 0) longitude is arbitrary -> 0
    lam = np.where(rho == 0.0, 0.0, lam)
    return np.degrees(lam), np.degrees(phi)


@F.pandas_udf(StringType())
def _ring_4326_udf(
    xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series,
    hemisphere: pd.Series,
) -> pd.Series:
    north = (hemisphere == "north").to_numpy()
    xs = np.stack(
        [xmin.to_numpy(float), xmax.to_numpy(float), xmax.to_numpy(float),
         xmin.to_numpy(float), xmin.to_numpy(float)]
    )  # (5, n) ring order matches functions.geo.cell_polygon_wkt
    ys = np.stack(
        [ymax.to_numpy(float), ymax.to_numpy(float), ymin.to_numpy(float),
         ymin.to_numpy(float), ymax.to_numpy(float)]
    )
    lon = np.empty_like(xs)
    lat = np.empty_like(ys)
    for mask, is_north in ((north, True), (~north, False)):
        if mask.any():
            lo, la = laea_inverse(xs[:, mask], ys[:, mask], is_north)
            lon[:, mask] = lo
            lat[:, mask] = la
    out = [
        "POLYGON((" + ", ".join(f"{lon[i, j]:.6f} {lat[i, j]:.6f}" for i in range(5)) + "))"
        for j in range(lon.shape[1])
    ]
    return pd.Series(out)


def ring_4326_wkt(
    centroid_x: Column, centroid_y: Column, half_step: Column, hemisphere: Column
) -> Column:
    """WGS84 WKT ring for a grid cell square (the ST_Transform twin)."""
    d = half_step.cast("double")
    return _ring_4326_udf(
        centroid_x.cast("double") - d,
        centroid_y.cast("double") - d,
        centroid_x.cast("double") + d,
        centroid_y.cast("double") + d,
        hemisphere,
    )
