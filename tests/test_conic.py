"""Conic/polar projections (core/conic.py) — definitional points,
roundtrip identity, and the defining differential property of each
family (conformal scale=1 at standard parallels, Albers equal-area
Jacobian, polar scale at lat_ts)."""
import numpy as np
import pytest

from gdal_ray.core.conic import (_A, AlbersEqualArea, LambertConformal,
                                 PolarStereographic, _e_of, projection_for)

_F_GRS80 = 1.0 / 298.257222101
_F_WGS84 = 1.0 / 298.257223563


def _local_scales(proj, lon, lat, f):
    """Finite-difference scale along parallel (k) and meridian (h)."""
    e = _e_of(f)
    d = 1e-7
    phi = np.deg2rad(lat)
    s = np.sin(phi)
    W = np.sqrt(1 - e * e * s * s)
    N = _A / W                              # prime vertical radius
    M = _A * (1 - e * e) / W ** 3           # meridian radius
    x0, y0 = proj.forward(lon, lat)
    x1, y1 = proj.forward(lon + d, lat)
    x2, y2 = proj.forward(lon, lat + d)
    dlam = np.deg2rad(d)
    k = np.hypot(x1 - x0, y1 - y0) / (N * np.cos(phi) * dlam)
    h = np.hypot(x2 - x0, y2 - y0) / (M * dlam)
    return k, h


class TestLambert93:
    def test_definitional_origin(self):
        p = projection_for("EPSG:2154")
        x, y = p.forward(3.0, 46.5)
        assert abs(x - 700000.0) < 1e-6
        assert abs(y - 6600000.0) < 1e-6

    def test_roundtrip(self):
        p = projection_for("EPSG:2154")
        rng = np.random.default_rng(1)
        lon = rng.uniform(-5, 10, 200)
        lat = rng.uniform(41, 51, 200)
        x, y = p.forward(lon, lat)
        lon2, lat2 = p.inverse(x, y)
        assert np.allclose(lon, lon2, atol=1e-10)
        assert np.allclose(lat, lat2, atol=1e-10)

    def test_conformal_scale_at_standard_parallels(self):
        p = projection_for("EPSG:2154")
        for lat in (44.0, 49.0):
            k, h = _local_scales(p, 2.0, lat, _F_GRS80)
            assert abs(k - 1.0) < 1e-6
            assert abs(h - 1.0) < 1e-6     # conformal: k == h
        # between the parallels, scale < 1 (secant cone)
        k_mid, _ = _local_scales(p, 2.0, 46.5, _F_GRS80)
        assert k_mid < 1.0


class TestConusAlbers:
    def test_definitional_origin(self):
        p = projection_for("EPSG:5070")
        x, y = p.forward(-96.0, 23.0)
        assert abs(x) < 1e-6 and abs(y) < 1e-6

    def test_roundtrip(self):
        p = projection_for("EPSG:5070")
        rng = np.random.default_rng(2)
        lon = rng.uniform(-125, -66, 200)
        lat = rng.uniform(24, 50, 200)
        x, y = p.forward(lon, lat)
        lon2, lat2 = p.inverse(x, y)
        assert np.allclose(lon, lon2, atol=1e-9)
        assert np.allclose(lat, lat2, atol=1e-9)

    def test_equal_area_jacobian(self):
        # h * k == 1 for an equal-area projection (Snyder 14: hk=1)
        p = projection_for("EPSG:5070")
        for lon, lat in ((-100.0, 30.0), (-80.0, 42.0), (-96.0, 45.5)):
            k, h = _local_scales(p, lon, lat, _F_GRS80)
            assert abs(k * h - 1.0) < 1e-5

    def test_scale_one_at_standard_parallels(self):
        p = projection_for("EPSG:5070")
        for lat in (29.5, 45.5):
            k, _ = _local_scales(p, -96.0, lat, _F_GRS80)
            assert abs(k - 1.0) < 1e-6


class TestPolarStereographic:
    @pytest.mark.parametrize("code,pole_lat", [("EPSG:3031", -90.0),
                                               ("EPSG:3413", 90.0)])
    def test_pole_maps_to_origin(self, code, pole_lat):
        p = projection_for(code)
        x, y = p.forward(33.0, pole_lat)    # any longitude at the pole
        assert abs(x) < 1e-6 and abs(y) < 1e-6

    def test_south_roundtrip(self):
        p = projection_for("EPSG:3031")
        rng = np.random.default_rng(3)
        lon = rng.uniform(-180, 180, 200)
        lat = rng.uniform(-89.9, -60, 200)
        x, y = p.forward(lon, lat)
        lon2, lat2 = p.inverse(x, y)
        assert np.allclose(lat, lat2, atol=1e-9)
        dl = (lon - lon2 + 180) % 360 - 180
        assert np.allclose(dl, 0, atol=1e-9)

    def test_north_roundtrip(self):
        p = projection_for("EPSG:3413")
        rng = np.random.default_rng(4)
        lon = rng.uniform(-180, 180, 200)
        lat = rng.uniform(60, 89.9, 200)
        x, y = p.forward(lon, lat)
        lon2, lat2 = p.inverse(x, y)
        assert np.allclose(lat, lat2, atol=1e-9)
        dl = (lon - lon2 + 180) % 360 - 180
        assert np.allclose(dl, 0, atol=1e-9)

    def test_scale_one_at_lat_ts(self):
        p = projection_for("EPSG:3413")
        k, h = _local_scales(p, 10.0, 70.0, _F_WGS84)
        assert abs(k - 1.0) < 1e-6
        assert abs(h - 1.0) < 1e-6
        ps = projection_for("EPSG:3031")
        k, h = _local_scales(ps, 10.0, -71.0, _F_WGS84)
        assert abs(k - 1.0) < 1e-6
        assert abs(h - 1.0) < 1e-6

    def test_south_bearing_convention(self):
        # EPSG:3031: a point on lon0=0 south of the pole has x=0, y>0
        p = projection_for("EPSG:3031")
        x, y = p.forward(0.0, -80.0)
        assert abs(x) < 1e-6 and y > 0
        # lon=90E → +x axis
        x, y = p.forward(90.0, -80.0)
        assert x > 0 and abs(y) < 1e-6


class TestRegistryComposition:
    def test_lcc_to_mercator_chain(self):
        from gdal_ray.stages.warp import get_transform
        fwd = get_transform("EPSG:2154", "EPSG:3857")
        inv = get_transform("EPSG:3857", "EPSG:2154")
        x = np.array([700000.0, 650000.0])
        y = np.array([6600000.0, 6860000.0])
        mx, my = fwd(x, y)
        x2, y2 = inv(mx, my)
        assert np.allclose(x, x2, atol=1e-5)
        assert np.allclose(y, y2, atol=1e-5)

    def test_unknown_still_raises(self):
        from gdal_ray.stages.warp import get_transform
        with pytest.raises(ValueError):
            get_transform("EPSG:9999", "EPSG:4326")
