"""Geodesy kernel goldens (reference tests/test_equi7grid.py:50-117,177-211)."""

import numpy as np
import numpy.testing as nptest
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from equi7grid_spark.geodesy import (
    aeqd_forward,
    aeqd_inverse,
    length_distortion_ellipsoid,
    length_distortion_planar,
)

# (subgrid, lon, lat, x, y) — reference tests/test_equi7grid.py:50-99
GOLDENS = [
    ("EU", 15.1, 45.3, 5138743.127891, 1307029.157093),
    ("AS", -178.5, 67.75, 7048122.707876, 9238361.594967),
    ("NA", -178.0, 51.75, 3887311.532849, 7756934.345841),
    ("NA", 173.0, 53.0, 3865149.386282, 8432250.89933),
]


@pytest.mark.parametrize("cc,lon,lat,x_should,y_should", GOLDENS)
def test_forward_goldens(cc, lon, lat, x_should, y_should):
    x, y = aeqd_forward(cc, lon, lat)
    nptest.assert_allclose(x_should, x)
    nptest.assert_allclose(y_should, y)


@pytest.mark.parametrize("cc,lon_should,lat_should,x,y", GOLDENS)
def test_inverse_goldens(cc, lon_should, lat_should, x, y):
    lon, lat = aeqd_inverse(cc, x, y)
    nptest.assert_allclose(lon_should, lon)
    nptest.assert_allclose(lat_should, lat)


def test_distortion_planar():
    # reference tests/test_equi7grid.py:111-117
    k = length_distortion_planar("AF", 470916.85506916, 8289708.44085851)
    nptest.assert_almost_equal(float(k), 1.1432971727108836, decimal=6)


def test_distortion_ellipsoid():
    # reference tests/test_equi7grid.py:102-108
    k = length_distortion_ellipsoid("AF", -29.1, 24.0)
    nptest.assert_almost_equal(float(k), 1.1432971727108836, decimal=6)


def test_reprojection_accuracy_af_points():
    # reference test_proj4_reprojection_accuracy (:177-211)
    points = [
        (30.306273, -31.627336),
        (-43.880131, -14.589038),
        (-35.261658, 79.423313),
        (10.457987, 23.456413),
    ]
    for lon, lat in points:
        x, y = aeqd_forward("AF", lon, lat)
        lon2, lat2 = aeqd_inverse("AF", float(x), float(y))
        nptest.assert_allclose(lon, lon2)
        nptest.assert_allclose(lat, lat2)


@settings(max_examples=200, deadline=None)
@given(
    lon=st.floats(-179.999, 179.999),
    lat=st.floats(-89.5, 89.5),
    cc=st.sampled_from(["AF", "AN", "AS", "EU", "OC", "NA", "SA"]),
)
def test_roundtrip_property(lon, lat, cc):
    x, y = aeqd_forward(cc, lon, lat)
    lon2, lat2 = aeqd_inverse(cc, float(x), float(y))
    assert abs(lat2 - lat) < 1e-6
    dlon = (lon2 - lon + 180.0) % 360.0 - 180.0
    # longitude degenerates at the poles
    assert abs(dlon) * max(np.cos(np.radians(lat)), 1e-9) < 1e-6


def test_vectorized_shapes():
    lons = np.array([15.1, -178.5])
    lats = np.array([45.3, 67.75])
    x, y = aeqd_forward("EU", lons, lats)
    assert x.shape == (2,)
    nptest.assert_allclose(x[0], 5138743.127891)
