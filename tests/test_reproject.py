"""LAEA (EPSG:6931/6932) reprojection tests: forward/inverse round trip,
pole behavior, hemisphere symmetry, and pipeline wiring."""

from __future__ import annotations

import numpy as np

from icenetetl_spark.functions.reproject import laea_forward, laea_inverse


def test_round_trip_north():
    rng = np.random.default_rng(0)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(35, 89.9, 200)  # EASE2-North domain
    x, y = laea_forward(lon, lat, north=True)
    lon2, lat2 = laea_inverse(x, y, north=True)
    assert np.allclose(lat, lat2, atol=1e-7)
    # wrap-safe longitude compare
    dlon = (lon - lon2 + 180) % 360 - 180
    assert np.allclose(dlon, 0, atol=1e-7)


def test_round_trip_south():
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-89.9, -35, 200)
    x, y = laea_forward(lon, lat, north=False)
    lon2, lat2 = laea_inverse(x, y, north=False)
    assert np.allclose(lat, lat2, atol=1e-7)
    dlon = (lon - lon2 + 180) % 360 - 180
    assert np.allclose(dlon, 0, atol=1e-7)


def test_pole_and_axes():
    lon, lat = laea_inverse(np.array([0.0]), np.array([0.0]), north=True)
    assert lat[0] > 89.999999 and lon[0] == 0.0
    # due-south along -y axis from north pole is the lon0=0 meridian
    lon, lat = laea_inverse(np.array([0.0]), np.array([-3000000.0]), north=True)
    assert abs(lon[0]) < 1e-9 and 60 < lat[0] < 64
    # EASE2 25km grid scale sanity: 3000 km from pole ~ 27 deg colatitude
    lon, lat = laea_inverse(np.array([3000000.0]), np.array([0.0]), north=True)
    assert abs(lon[0] - 90.0) < 1e-9


def test_equal_area_property():
    """The disc of radius rho(phi0) in the projected plane must equal the
    true WGS84 ellipsoid cap area above geodetic phi0 (numerical
    integration of dA = M*N*cos(phi) dphi dlambda)."""
    a, e2 = 6378137.0, 0.00669437999014
    phi0 = np.radians(80.0)
    x, y = laea_forward(np.array([0.0]), np.array([80.0]), north=True)
    disc = np.pi * float(np.hypot(x, y)) ** 2
    phi = np.linspace(phi0, np.pi / 2, 200001)
    s2 = np.sin(phi) ** 2
    integrand = (
        (a * (1 - e2) / (1 - e2 * s2) ** 1.5)
        * (a / np.sqrt(1 - e2 * s2))
        * np.cos(phi)
    )
    cap = 2 * np.pi * np.trapz(integrand, phi)
    assert abs(disc - cap) / cap < 1e-9


def test_pipeline_populates_4326(spark, warehouse):
    from icenetetl_spark.catalog import ParquetCatalog
    from icenetetl_spark.plans.icenet import IceNetPipeline
    from icenetetl_spark.sources.fixtures import make_raw_file

    cat = ParquetCatalog(spark, warehouse)
    pipe = IceNetPipeline(cat)
    f, a = make_raw_file(spark, "2024-03-01", "north", grid_side=4, seed=5)
    pipe.run(f, a)
    cells = cat.read("cells").collect()
    assert all(r["geom_4326_wkt"] is not None for r in cells)
    wkt = next(r["geom_4326_wkt"] for r in cells if r["centroid_x"] == 0 and r["centroid_y"] == 0)
    assert wkt.startswith("POLYGON((")
    # cell centered near the pole-origin -> corner latitudes high north
    lats = [float(pt.strip().split(" ")[1]) for pt in wkt[9:-2].split(",")]
    assert all(la > 89 for la in lats)
