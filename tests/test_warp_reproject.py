"""Reprojection warp vs closed-form oracles: mercator↔lonlat round
trips, suggested-output invariants, approximate-mesh error bound."""

import numpy as np
import pytest

from gdal_ray.core import geotransform as gtr
from gdal_ray.core import mercator as merc
from gdal_ray.stages import warp as wp


def lonlat_image(w=64, h=48):
    """Source image in EPSG:4326 over a mid-latitude box."""
    gt = gtr.from_bounds(-10.0, 40.0, 10.0, 55.0, w, h)
    y, x = np.mgrid[0:h, 0:w]
    px = ((x * 3 + y * 5) % 251).astype(np.float64)
    return px, gt


class TestTransformRegistry:
    def test_round_trip_vectorized(self):
        lon = np.array([-10.0, 0.0, 3.25, 120.0])
        lat = np.array([40.0, 0.0, -33.5, 70.0])
        f = wp.get_transform("EPSG:4326", "EPSG:3857")
        g = wp.get_transform("EPSG:3857", "EPSG:4326")
        mx, my = f(lon, lat)
        lon2, lat2 = g(mx, my)
        assert np.allclose(lon2, lon, atol=1e-9)
        assert np.allclose(lat2, lat, atol=1e-9)

    def test_identity_and_unknown(self):
        assert wp.get_transform("EPSG:3857", "EPSG:3857") is wp._identity
        # UTM is supported since round 2 (core/tmerc.py) — a truly
        # unknown CRS still raises
        assert wp.get_transform("EPSG:3857", "EPSG:32633") is not None
        # 27700 now resolves through core/srs.py; a code without a
        # built-in parameter set still raises
        assert wp.get_transform("EPSG:3857", "EPSG:27700") is not None
        with pytest.raises(ValueError):
            wp.get_transform("EPSG:3857", "EPSG:31370")


class TestSuggestedOutput:
    def test_bounds_cover_source(self):
        px, gt = lonlat_image()
        fwd = wp.get_transform("EPSG:4326", "EPSG:3857")
        dst_gt, dw, dh = wp.suggested_warp_output(gt, 64, 48, fwd)
        # corner (-10, 55) -> mercator must equal dst origin
        mx, my = merc.latlon_to_meters(55.0, -10.0)
        assert abs(dst_gt[0] - mx) < 1e-6
        assert abs(dst_gt[3] - my) < 1e-6
        # diagonal pixel count preserved (GDAL's sizing rule)
        assert abs(np.hypot(dw, dh) - np.hypot(64, 48)) / np.hypot(64, 48) < 0.1

    def test_square_pixels(self):
        px, gt = lonlat_image()
        fwd = wp.get_transform("EPSG:4326", "EPSG:3857")
        dst_gt, dw, dh = wp.suggested_warp_output(gt, 64, 48, fwd)
        assert abs(dst_gt[1] + dst_gt[5]) / dst_gt[1] < 0.02  # ~square


class TestApproxMesh:
    def test_error_bound_vs_exact(self):
        px, gt = lonlat_image()
        fwd = wp.get_transform("EPSG:4326", "EPSG:3857")
        inv = wp.get_transform("EPSG:3857", "EPSG:4326")
        dst_gt, dw, dh = wp.suggested_warp_output(gt, 64, 48, fwd)
        ax, ay = wp.approx_src_coords(dst_gt, gt, inv, dw, dh,
                                      max_error=0.125)
        inv_gt = gtr.inverse(gt)
        cols = np.arange(dw, dtype=np.float64) + 0.5
        rows = np.arange(dh, dtype=np.float64) + 0.5
        C, R = np.meshgrid(cols, rows)
        ex, ey = wp._src_pixel_coords_exact(dst_gt, inv_gt, inv, C, R)
        err = np.max(np.hypot(ax - ex, ay - ey))
        assert err <= 0.125 + 1e-9

    def test_identity_reproject_near_is_lossless(self):
        px, gt = lonlat_image()
        out, valid, dst_gt = wp.reproject_array(
            px, gt, "EPSG:4326", "EPSG:4326", resampling="near",
            dst_grid=(gt, 64, 48))
        assert valid.all()
        assert np.array_equal(out, px)


class TestReproject:
    def test_merc_round_trip_psnr(self):
        """4326 → 3857 → back; bilinear round trip should stay close
        (PSNR proxy: RMSE small relative to 0..255 range). Uses a
        smooth field — the modulo ramp is discontinuous and bilinear
        legitimately smears its seams."""
        _, gt = lonlat_image()
        y, x = np.mgrid[0:48, 0:64]
        px = 127.5 + 100.0 * np.sin(x / 9.0) * np.cos(y / 7.0)
        out, valid, merc_gt = wp.reproject_array(
            px, gt, "EPSG:4326", "EPSG:3857", resampling="bilinear")
        back, valid2, back_gt = wp.reproject_array(
            out, merc_gt, "EPSG:3857", "EPSG:4326", resampling="bilinear",
            dst_grid=(gt, 64, 48))
        inner = valid2 & valid2
        # trim a 2px boundary (edge kernels clip)
        core = np.zeros_like(inner)
        core[2:-2, 2:-2] = True
        sel = inner & core
        rmse = float(np.sqrt(np.mean((back[sel] - px[sel]) ** 2)))
        psnr = 20 * np.log10(251.0 / max(rmse, 1e-12))
        assert psnr >= 40.0, psnr

    def test_point_value_preserved(self):
        """A known world point keeps its value through reprojection
        (nearest-neighbor, interior point)."""
        px, gt = lonlat_image()
        out, valid, merc_gt = wp.reproject_array(
            px, gt, "EPSG:4326", "EPSG:3857", resampling="near")
        lon, lat = 1.37, 47.3
        col_s, row_s = gtr.apply_inverse(gt, lon, lat)
        v_src = px[int(row_s), int(col_s)]
        mx, my = merc.latlon_to_meters(lat, lon)
        col_d, row_d = gtr.apply_inverse(merc_gt, mx, my)
        v_dst = out[int(row_d), int(col_d)]
        # nearest-neighbor may land on an adjacent src pixel; accept the
        # 3×3 neighborhood of the source pixel
        r0, c0 = int(row_s), int(col_s)
        neigh = px[max(0, r0 - 1):r0 + 2, max(0, c0 - 1):c0 + 2]
        assert v_dst in neigh

    def test_mean_preserved(self):
        px, gt = lonlat_image()
        out, valid, _ = wp.reproject_array(
            px, gt, "EPSG:4326", "EPSG:3857", resampling="bilinear")
        assert abs(out[valid].mean() - px.mean()) / px.mean() < 0.02


class TestAreaReproject:
    def test_average_identity_downscale_matches_affine(self):
        """Identity CRS + 2x downscale: supersampled average must track
        the exact affine area warp closely."""
        from gdal_ray.core import resample as rs
        px, gt = lonlat_image(64, 48)
        dst_gt = (gt[0], gt[1] * 2, 0.0, gt[3], 0.0, gt[5] * 2)
        got, valid, _ = wp.reproject_array(
            px, gt, "EPSG:4326", "EPSG:4326", resampling="average",
            dst_grid=(dst_gt, 32, 24))
        exact, v2 = rs.warp(px, gt, dst_gt, (24, 32), "average")
        assert valid.all()
        # interior: 3x3 supersample of a 2x2 box — small quantization
        # error only (boundary pixels differ where sub-samples fall
        # outside the source and partial-coverage weights kick in)
        inner = np.abs(got - exact)[1:-1, 1:-1]
        assert inner.max() <= 30.0
        assert inner.mean() < 1.5

    def test_average_mercator_mean_preserved(self):
        px, gt = lonlat_image()
        out, valid, _ = wp.reproject_array(
            px, gt, "EPSG:4326", "EPSG:3857", resampling="average")
        assert abs(out[valid].mean() - px.mean()) / px.mean() < 0.02

    def test_sum_scales_with_area(self):
        """sum resampling at 2x downscale: total mass ~ preserved."""
        px, gt = lonlat_image(64, 48)
        dst_gt = (gt[0], gt[1] * 2, 0.0, gt[3], 0.0, gt[5] * 2)
        got, valid, _ = wp.reproject_array(
            px, gt, "EPSG:4326", "EPSG:4326", resampling="sum",
            dst_grid=(dst_gt, 32, 24))
        # each dst pixel covers 4 src pixels; sum/(s*s) * (dst/src area
        # ratio 4) ≈ 4 * mean of the 4 src px
        assert abs(got.sum() * 4 / 4 - px.sum() / 4) / (px.sum() / 4) < 0.05
