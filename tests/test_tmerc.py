"""Transverse-mercator (UTM) transform + general CRS registry tests.

Reference semantics: the Krüger-series transverse mercator PROJ uses
(etmerc); the reference's benchmark workload warps UTM EPSG:32631 →
EPSG:4326 (autotest/benchmark/test_gdalwarp.py:24-56)."""

import numpy as np
import pytest

from gdal_ray.core import tmerc


class TestTmercCore:
    def test_known_point_equator(self):
        # published UTM value for 0N 0E in zone 31 (lon0=3):
        # E = 166021.443, N = 0 (classic UTM test vector)
        E, N = tmerc.lonlat_to_tmerc(0.0, 0.0, 3.0)
        assert abs(float(E) - 166021.443) < 0.01
        assert abs(float(N)) < 1e-6

    def test_central_meridian(self):
        E, N = tmerc.lonlat_to_tmerc(3.0, 45.0, 3.0)
        assert abs(float(E) - 500000.0) < 1e-6   # on the CM
        # meridian arc to 45N scaled by k0: ~4982950.4 m
        assert 4.97e6 < float(N) < 5.0e6

    def test_roundtrip_nanometer(self):
        rng = np.random.default_rng(7)
        lon = rng.uniform(0, 6, 5000)
        lat = rng.uniform(-80, 84, 5000)
        E, N = tmerc.lonlat_to_tmerc(lon, lat, 3.0)
        lon2, lat2 = tmerc.tmerc_to_lonlat(E, N, 3.0)
        assert np.max(np.abs(lon2 - lon)) < 1e-11
        assert np.max(np.abs(lat2 - lat)) < 1e-11

    def test_south_zone_false_northing(self):
        E, N = tmerc.lonlat_to_tmerc(15.0, -30.0, 15.0, south=True)
        assert abs(float(E) - 500000.0) < 1e-6
        assert 6.0e6 < float(N) < 7.0e6   # 1e7 - arc(30S)*k0

    def test_parse_epsg(self):
        assert tmerc.parse_utm_epsg("EPSG:32631") == (3.0, False)
        assert tmerc.parse_utm_epsg("EPSG:32601") == (-177.0, False)
        assert tmerc.parse_utm_epsg("EPSG:32760") == (177.0, True)
        assert tmerc.parse_utm_epsg("EPSG:3857") is None
        assert tmerc.parse_utm_epsg("bogus") is None


class TestRegistry:
    def test_utm_to_wgs84(self):
        from gdal_ray.stages.warp import get_transform
        fwd = get_transform("EPSG:32631", "EPSG:4326")
        lon, lat = fwd(np.array([500000.0]), np.array([0.0]))
        assert abs(float(lon) - 3.0) < 1e-9
        assert abs(float(lat)) < 1e-9

    def test_utm_to_mercator_chained(self):
        from gdal_ray.core import mercator as merc
        from gdal_ray.stages.warp import get_transform
        fwd = get_transform("EPSG:32631", "EPSG:3857")
        inv = get_transform("EPSG:3857", "EPSG:32631")
        E = np.array([400000.0, 600000.0])
        N = np.array([4600000.0, 5400000.0])
        mx, my = fwd(E, N)
        E2, N2 = inv(mx, my)
        assert np.allclose(E2, E, atol=1e-6)
        assert np.allclose(N2, N, atol=1e-6)
        # sanity: mercator y of ~41.5N ≈ merc.latlon_to_meters value
        lon, lat = get_transform("EPSG:32631", "EPSG:4326")(E[:1], N[:1])
        ex, ey = merc.latlon_to_meters(lat, lon)
        assert np.allclose([mx[0], my[0]], [ex[0], ey[0]], atol=1e-6)

    def test_unknown_crs_raises(self):
        from gdal_ray.stages.warp import get_transform
        # 27700 is constructible since round 4 (core/srs.py); a code
        # with no built-in parameter set still raises
        with pytest.raises(ValueError):
            get_transform("EPSG:31370", "EPSG:4326")


class TestUtmWarp:
    def test_mesh_error_vs_exact(self):
        """The approximate transformer's output coordinates differ from
        the exact chain by < 0.125 source pixels (GDAL's default bound,
        alg/gdaltransformer.cpp:58-61) on the benchmark workload."""
        from gdal_ray.core import geotransform as gtr
        from gdal_ray.stages.warp import (approx_src_coords, get_transform,
                                          suggested_warp_output,
                                          _src_pixel_coords_exact)
        W = 256
        gt = (400000.0, 10.0, 0.0, 4800000.0, 0.0, -10.0)
        fwd = get_transform("EPSG:32631", "EPSG:4326")
        inv = get_transform("EPSG:4326", "EPSG:32631")
        dst_gt, dw, dh = suggested_warp_output(gt, W, W, fwd)
        ax, ay = approx_src_coords(dst_gt, gt, inv, dw, dh)
        cols = np.arange(dw, dtype=np.float64) + 0.5
        rows = np.arange(dh, dtype=np.float64) + 0.5
        C, R = np.meshgrid(cols, rows)
        ex, ey = _src_pixel_coords_exact(dst_gt, gtr.inverse(gt), inv, C, R)
        err = np.max(np.hypot(ax - ex, ay - ey))
        assert err < 0.125

    def test_reproject_array_utm(self):
        from gdal_ray.stages.warp import reproject_array
        x = np.arange(128)[None, :]
        y = np.arange(128)[:, None]
        px = (((3 * x + 5 * y) % 256).astype(np.uint8))[:, :, None]
        gt = (500000.0, 10.0, 0.0, 4500000.0, 0.0, -10.0)
        out, valid, dst_gt = reproject_array(px, gt, "EPSG:32631",
                                             "EPSG:4326", resampling="near")
        assert valid.any()
        # dst grid is in degrees around the CM
        assert 2.9 < dst_gt[0] < 3.1
        assert abs(dst_gt[1]) < 1e-3   # ~1e-4 deg/px
        # near-resampled valid pixels preserve the source value set
        vals = np.unique(out[valid])
        assert set(vals.astype(int)) <= set(((3 * x + 5 * y) % 256).ravel())

    def test_battery_query_runs(self):
        from gdal_ray.pipelines.queries import q_utm_warp
        df = q_utm_warp("unused").to_pandas()
        assert len(df) == 24
        assert (df["dst_w"] > 0).all()
        # deterministic checksums (stable under re-run)
        df2 = q_utm_warp("unused").to_pandas()
        m = df.sort_values("image_id").reset_index(drop=True)
        n = df2.sort_values("image_id").reset_index(drop=True)
        assert m.equals(n)


class TestReprojectLarge:
    def test_parity_with_single_task(self, ray_session):
        """Row-band parallel reprojection must equal the single-task
        path exactly (same mesh contract per chunk)."""
        import numpy as np
        from gdal_ray.stages.warp import reproject_array, reproject_large
        x, y = np.meshgrid(np.arange(300), np.arange(300))
        px = (((3 * x + 5 * y) % 256).astype(np.uint8))[:, :, None]
        gt = (500000.0, 10.0, 0.0, 4500000.0, 0.0, -10.0)
        a, va, ga = reproject_array(px, gt, "EPSG:32631", "EPSG:4326",
                                    resampling="bilinear")
        b, vb, gb = reproject_large(px, gt, "EPSG:32631", "EPSG:4326",
                                    resampling="bilinear", band_rows=64)
        assert ga == gb
        assert np.array_equal(va, vb)
        assert np.allclose(a, b)

    def test_sink_path_streams_to_parquet(self, ray_session, tmp_path):
        """With out_path the destination never assembles in memory:
        row bands stream to parquet; reading them back reproduces the
        array path bit for bit."""
        import numpy as np
        import pyarrow.parquet as pq
        from gdal_ray.stages.warp import reproject_array, reproject_large
        x, y = np.meshgrid(np.arange(200), np.arange(200))
        px = (((7 * x + 2 * y) % 256).astype(np.uint8))[:, :, None]
        gt = (500000.0, 10.0, 0.0, 4500000.0, 0.0, -10.0)
        a, va, ga = reproject_array(px, gt, "EPSG:32631", "EPSG:4326",
                                    resampling="bilinear")
        man = reproject_large(px, gt, "EPSG:32631", "EPSG:4326",
                              resampling="bilinear", band_rows=64,
                              out_path=str(tmp_path / "bands"))
        assert man["dst_gt"] == ga
        assert (man["dst_h"], man["dst_w"]) == a.shape[:2]
        t = pq.read_table(str(tmp_path / "bands"))
        acc = np.zeros((man["dst_h"], man["dst_w"], 1), np.float64)
        vacc = np.zeros((man["dst_h"], man["dst_w"]), bool)
        for i in range(t.num_rows):
            r0 = t["r0"][i].as_py()
            nr = t["rows"][i].as_py()
            acc[r0:r0 + nr] = np.frombuffer(
                t["data"][i].as_py(), np.float64).reshape(
                    nr, man["dst_w"], 1)
            vacc[r0:r0 + nr] = np.unpackbits(
                np.frombuffer(t["valid"][i].as_py(), np.uint8),
                count=nr * man["dst_w"]).reshape(
                    nr, man["dst_w"]).astype(bool)
        assert np.array_equal(va, vacc)
        assert np.allclose(a[:, :, None] if a.ndim == 2 else a, acc)
