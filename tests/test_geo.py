"""Geo reprojection tests: GEOS/TM projection math + area resampling
(reference satflow/data/utils/utils.py:48-96 capability, satpy-free)."""

import numpy as np
import pytest

from satflow_tpu.data.geo import (
    EUROPE_TM_AREA,
    MSG_FULL_DISC_3KM,
    AreaDefinition,
    Geostationary,
    TransverseMercator,
    resample_area,
)


def test_tmerc_roundtrip():
    proj = TransverseMercator(lon_0=10.0, k0=0.9996)
    lon = np.array([-5.0, 0.0, 10.0, 18.0, 25.0])
    lat = np.array([35.0, 45.0, 52.0, 60.0, 68.0])
    x, y = proj.forward(lon, lat)
    lon2, lat2 = proj.inverse(x, y)
    # The 4th-order Redfearn series truncates ~60 m at 15 degrees from the
    # central meridian — far sub-pixel for the 3 km SEVIRI grid (~0.03 deg).
    np.testing.assert_allclose(lon2, lon, atol=1e-3)
    np.testing.assert_allclose(lat2, lat, atol=1e-3)
    # near the central meridian the series is effectively exact
    x0, y0 = proj.forward(11.0, 50.0)
    lon3, lat3 = proj.inverse(x0, y0)
    assert abs(float(lon3) - 11.0) < 1e-7 and abs(float(lat3) - 50.0) < 1e-7


def test_tmerc_meridian_arc_matches_numeric_integral():
    """On the central meridian, northing = k0 * meridian arc length; check the
    closed-form series against a brute-force numerical integral (WGS84)."""
    proj = TransverseMercator(lon_0=3.0, k0=0.9996, false_easting=500_000.0)
    lat = 48.8584
    x, y = proj.forward(3.0, lat)
    assert abs(float(x) - 500_000.0) < 1e-6  # exactly on the central meridian
    a, e2 = proj.ell.a, proj.ell.e2
    phi = np.linspace(0.0, np.radians(lat), 200_001)
    integrand = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    arc = np.trapezoid(integrand, phi)
    assert abs(float(y) - 0.9996 * arc) < 0.01  # series vs integral: < 1 cm


def test_tmerc_symmetry_about_central_meridian():
    proj = TransverseMercator(lon_0=10.0, k0=1.0)
    x_e, y_e = proj.forward(14.0, 50.0)
    x_w, y_w = proj.forward(6.0, 50.0)
    assert abs(float(x_e) + float(x_w)) < 1e-6
    assert abs(float(y_e) - float(y_w)) < 1e-6


def test_geos_roundtrip_msg():
    proj = Geostationary(lon_0=0.0, satellite_height=35_785_831.0, sweep="y",
                         ellipsoid=None)
    lon = np.array([-20.0, 0.0, 15.0, 40.0])
    lat = np.array([-30.0, 10.0, 48.0, 5.0])
    x, y = proj.forward(lon, lat)
    assert np.all(np.isfinite(x))
    lon2, lat2 = proj.inverse(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-6)
    np.testing.assert_allclose(lat2, lat, atol=1e-6)


def test_geos_subsatellite_point_is_origin():
    proj = Geostationary(lon_0=9.5)
    x, y = proj.forward(9.5, 0.0)
    assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6


def test_geos_far_side_not_visible():
    proj = Geostationary(lon_0=0.0)
    x, _ = proj.forward(180.0, 0.0)
    assert np.isnan(x)


def test_area_lonlats_and_pixel_transform():
    lon, lat = EUROPE_TM_AREA.lonlats()
    assert lon.shape == (1024, 1024)
    # the area is centred on lon_0=10, covering Europe latitudes
    assert 0 < np.nanmean(lon) < 20
    assert 35 < np.nanmean(lat) < 70
    # pixel -> lonlat -> pixel round-trip
    col, row = EUROPE_TM_AREA.lonlat_to_pixel(lon[100, 200], lat[100, 200])
    # Redfearn series truncation grows toward the area's NW corner (~25 deg
    # from the central meridian at lat 67) but stays sub-pixel on the 3.5 km
    # grid (~0.16 px observed).
    assert abs(float(col) - 200) < 0.5 and abs(float(row) - 100) < 0.5


def test_resample_identity():
    """Resampling an area onto itself is the identity (inner pixels)."""
    area = AreaDefinition(
        projection={"proj": "tmerc", "lon_0": 10.0, "k": 0.9996},
        width=32, height=32,
        area_extent=(-400_000, 4_500_000, 400_000, 5_300_000),
    )
    rng = np.random.default_rng(0)
    data = rng.random((32, 32)).astype(np.float32)
    out = resample_area(data, area, area, fill_value=-1)
    np.testing.assert_allclose(out, data, atol=1e-6)


def test_resample_msg_to_mercator():
    """A SEVIRI-grid gradient resamples onto the TM Europe area: fully covered,
    values preserved within the source range, geography consistent."""
    src = MSG_FULL_DISC_3KM
    # synthetic full-disc field: linear in (row, col)
    rows = np.linspace(0, 1, src.height, dtype=np.float32)[:, None]
    cols = np.linspace(0, 1, src.width, dtype=np.float32)[None, :]
    data = rows + cols

    dst = AreaDefinition(
        projection=EUROPE_TM_AREA.projection, width=64, height=64,
        area_extent=EUROPE_TM_AREA.area_extent,
    )
    out = resample_area(data, src, dst, fill_value=np.nan)
    assert out.shape == (64, 64)
    assert np.isfinite(out).all(), "Europe must be fully visible from MSG"
    assert out.min() >= 0.0 and out.max() <= 2.0
    # northern Europe is nearer the disc edge: source row decreases northwards,
    # so the resampled field must decrease from bottom (south) to top (north)
    assert out[:8].mean() < out[-8:].mean()


def test_map_satellite_to_mercator_arrays_batched():
    from satflow_tpu.data.transforms import map_satellite_to_mercator

    src = MSG_FULL_DISC_3KM
    frames = np.random.default_rng(1).random((2, 3, src.height // 16, src.width // 16))
    small_src = AreaDefinition(
        projection=src.projection, width=src.width // 16, height=src.height // 16,
        area_extent=src.area_extent,
    )
    small_dst = AreaDefinition(
        projection=EUROPE_TM_AREA.projection, width=32, height=32,
        area_extent=EUROPE_TM_AREA.area_extent,
    )
    out = map_satellite_to_mercator(
        frames=frames, src_area=small_src, dst_area=small_dst
    )
    assert out.shape == (2, 3, 32, 32)
    assert np.isfinite(out).all()
