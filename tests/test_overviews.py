"""Overview build/read (codecs/overviews.py) — gdaladdo analog.

Goldens from the reference's own suite (autotest/gcore/tiff_ovr.py):
mfloat32 NEAREST [2,4] → band checksums 1087/328 at 10×10/5×5;
nodata_byte AVERAGE [2] → 1130; test_average_palette NEAREST [2] → 0.
"""

import numpy as np
import pytest

from gdal_ray.codecs.gtiff import decode_gtiff, encode_gtiff
from gdal_ray.codecs.overviews import (add_overviews, build_overviews,
                                       downsample_average,
                                       downsample_near, encode_ovr,
                                       read_overviews)
from gdal_ray.core.checksum import checksum

GCORE = "/root/reference/autotest/gcore/data"


def gdal_cs(a):
    # GDALChecksumImage reads as int via CopyWords: +0.5 floor
    return int(checksum(np.floor(np.asarray(a, np.float64) + 0.5)))


class TestKernelGoldens:
    def test_mfloat32_nearest_2_4(self):
        """tiff_ovr.py::tiff_ovr_check: 10×10 cs 1087, 5×5 cs 328."""
        px = decode_gtiff(open(f"{GCORE}/float32.tif", "rb").read()).pixels
        ov2, ov4 = build_overviews(px, [2, 4], "nearest")
        assert ov2.shape == (10, 10) and ov4.shape == (5, 5)
        assert gdal_cs(ov2) == 1087
        assert gdal_cs(ov4) == 328

    def test_nodata_byte_average(self):
        """tiff_ovr.py::test_tiff_ovr_5: AVERAGE [2] → cs 1130 with
        nodata-aware means."""
        g = decode_gtiff(open(f"{GCORE}/nodata_byte.tif", "rb").read())
        (ov,) = build_overviews(g.pixels, [2], "average", nodata=g.nodata)
        assert gdal_cs(ov) == 1130

    def test_palette_nearest_zero(self):
        """tiff_ovr.py::test_tiff_ovr_7: chessboard NEAREST [2] → 0."""
        g = decode_gtiff(
            open(f"{GCORE}/test_average_palette.tif", "rb").read())
        (ov,) = build_overviews(g.pixels, [2], "nearest")
        assert gdal_cs(ov) == 0

    def test_odd_sizes_ceil(self):
        px = np.arange(7 * 9, dtype=np.uint8).reshape(7, 9)
        ov = downsample_near(px, 2)
        assert ov.shape == (4, 5)
        av = downsample_average(px, 2)
        assert av.shape == (4, 5)
        # edge blocks average only existing pixels
        assert av[3, 4] == px[6, 8]

    def test_all_nodata_block_stays_nodata(self):
        px = np.full((4, 4), 7, np.uint8)
        px[:2, :2] = 0
        av = downsample_average(px, 2, nodata=0)
        assert av[0, 0] == 0 and av[0, 1] == 7


class TestOvrFileRoundtrip:
    def test_add_overviews_and_read_back(self, tmp_path):
        rng = np.random.default_rng(5)
        px = rng.integers(0, 256, (64, 48), dtype=np.uint8)
        p = str(tmp_path / "img.tif")
        gt = (100.0, 2.0, 0.0, 500.0, 0.0, -2.0)
        open(p, "wb").write(encode_gtiff(px, geotransform=gt))
        ovr_path = add_overviews(p, [2, 4], "average")
        assert ovr_path == p + ".ovr"

        from gdal_ray.sources.raster import overview_count, read_raster
        assert overview_count(p) == 2
        o0, gt0, _, _ = read_raster(p, overview=0)
        o1, gt1, _, _ = read_raster(p, overview=1)
        assert o0.shape[:2] == (32, 24) and o1.shape[:2] == (16, 12)
        np.testing.assert_array_equal(
            np.asarray(o0).squeeze(), downsample_average(px, 2))
        # geotransform rescaled to the overview grid
        assert gt0[1] == 4.0 and gt0[5] == -4.0
        assert gt1[1] == 8.0 and gt1[5] == -8.0
        assert gt0[0] == gt[0] and gt0[3] == gt[3]

    def test_reference_external_style_chain_parses(self):
        levels = build_overviews(
            np.arange(40 * 40, dtype=np.uint8).reshape(40, 40), [2, 4])
        buf = encode_ovr(levels)
        from gdal_ray.codecs.gtiff import decode_gtiff_all
        gs = decode_gtiff_all(buf)
        assert [g.pixels.shape[:2] for g in gs] == [(20, 20), (10, 10)]
        np.testing.assert_array_equal(gs[0].pixels, levels[0])

    def test_cog_internal_overviews_selected(self, tmp_path):
        from gdal_ray.codecs.cog import decode_cog, encode_cog
        rng = np.random.default_rng(6)
        px = rng.integers(0, 256, (600, 600), dtype=np.uint8)
        gt = (0.0, 1.0, 0.0, 600.0, 0.0, -1.0)
        buf = encode_cog(px, geotransform=gt)
        p = str(tmp_path / "c.tif")
        open(p, "wb").write(buf)
        from gdal_ray.sources.raster import overview_count, read_raster
        n = overview_count(p)
        assert n >= 1
        o0, gt0, _, _ = read_raster(p, overview=0)
        want = decode_cog(buf)[1].pixels
        np.testing.assert_array_equal(np.asarray(o0).squeeze(),
                                      np.asarray(want).squeeze())
        assert gt0[1] == pytest.approx(600.0 / o0.shape[1])

    def test_bad_level_raises(self, tmp_path):
        px = np.zeros((8, 8), np.uint8)
        p = str(tmp_path / "x.tif")
        open(p, "wb").write(encode_gtiff(px))
        from gdal_ray.sources.raster import read_raster
        with pytest.raises(ValueError, match="out of range"):
            read_raster(p, overview=0)
        with pytest.raises(ValueError, match="invalid"):
            build_overviews(px, [2, 0])
