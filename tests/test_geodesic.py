"""Ellipsoidal geodesic length — golden parity with the reference's
GeodesicLength suite (autotest/ogr/ogr_geom.py:4936-4990, values from
GeographicLib; Vincenty agrees to ~1e-7 m here)."""

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.core.geodesic import geodesic_distance, geodesic_length_wkb


def test_segment_goldens():
    assert geodesic_distance(2, 49, 3, 49) == \
        pytest.approx(73171.26435678436)
    assert geodesic_distance(3, 49, 3, 48) == \
        pytest.approx(111200.0367623785)
    assert geodesic_distance(3, 48, 2, 49) == \
        pytest.approx(133514.4852804854)


def test_linestring_and_polygon_ring():
    ls = W.linestring([(2, 49), (3, 49), (3, 48), (2, 49)])
    assert geodesic_length_wkb(W.dumps(ls)) == \
        pytest.approx(317885.78639964823)
    poly = W.polygon([(2, 49), (3, 49), (3, 48)])
    assert geodesic_length_wkb(W.dumps(poly)) == \
        pytest.approx(317885.78639964823)
    # longitude invariance: same shape shifted 10° east
    poly2 = W.polygon([(12, 49), (13, 49), (13, 48)])
    assert geodesic_length_wkb(W.dumps(poly2)) == \
        pytest.approx(317885.78639964823)


def test_vectorized_and_edge_cases():
    d = geodesic_distance([0, 0], [0, 10], [1, 0], [0, 10])
    assert d.shape == (2,)
    # one degree of longitude at the equator ≈ 111.32 km
    assert d[0] == pytest.approx(111319.49, rel=1e-4)
    assert d[1] == 0.0                      # coincident points
    # symmetry
    assert geodesic_distance(2, 49, 3, 48) == \
        pytest.approx(geodesic_distance(3, 48, 2, 49), rel=1e-12)
    # near-antipodal still returns a finite sane value (~half meridian)
    ap = geodesic_distance(0, 0, 179.6, 0.4)
    assert 1.9e7 < ap < 2.1e7 and np.isfinite(ap)


def test_meridian_quarter():
    # equator to pole along a meridian: the meridian quadrant length
    assert geodesic_distance(0, 0, 0, 90) == \
        pytest.approx(10001965.729, abs=1.0)
