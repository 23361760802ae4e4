"""RasterLite2 reader tests — parity with autotest/gdrivers/rl2.py.

Lossless (DEFLATE) coverages match GDAL's checksums exactly; JPEG
coverages are PSNR-gated because those golden checksums are
libjpeg-version artifacts (the reference suite itself branches per
libjpeg build elsewhere)."""

import os

import numpy as np
import pytest

from gdal_ray.core.checksum import checksum
from gdal_ray.sources.rasterlite2 import list_rl2_coverages, read_rl2

DATA = "/root/reference/autotest/gdrivers/data/rasterlite2"

pytestmark = pytest.mark.skipif(not os.path.exists(DATA),
                                reason="reference absent")


def test_rl2_byte():
    px, gt, nodata, meta = read_rl2(os.path.join(DATA, "byte.rl2"))
    assert px.shape == (20, 20)
    assert checksum(px) == 4672
    assert gt == pytest.approx((440720.0, 60.0, 0.0, 3751320.0, 0.0,
                                -60.0))
    assert meta["crs"] == "EPSG:26711"
    # 1:2 sub-resolution = nearest decimation (rl2_2's pyramid option)
    ovr, *_ = read_rl2(os.path.join(DATA, "byte.rl2"), scale=2)
    assert checksum(ovr) == 1087


def test_rl2_palette():
    px, gt, nodata, meta = read_rl2(
        os.path.join(DATA, "small_world_pct.rl2"))
    assert checksum(px) == 14890
    assert len(meta["palette"]) == 256
    assert meta["palette"][1] == (176, 184, 176, 255)
    ovr, *_ = read_rl2(os.path.join(DATA, "small_world_pct.rl2"),
                       scale=2)
    assert checksum(ovr) == 35614                # rl2_4 overview


MULTI = [("uint8", np.uint8, 4672), ("int8", np.int8, 4575),
         ("uint16", np.uint16, 4457), ("int16", np.int16, 4457),
         ("uint32", np.uint32, 4457), ("int32", np.int32, 4457),
         ("float", np.float32, 4457), ("double", np.float64, 4457),
         ("1bit", np.uint8, 4873)]


@pytest.mark.parametrize("name,dt,exp", MULTI)
def test_rl2_multi_type(name, dt, exp):
    px, gt, nodata, meta = read_rl2(
        os.path.join(DATA, "multi_type.rl2"), coverage=name)
    assert px.dtype == dt
    band = px.astype(np.float64) if px.dtype.kind == "f" else px
    assert checksum(band) == exp


def test_rl2_coverage_list():
    names = list_rl2_coverages(os.path.join(DATA, "multi_type.rl2"))
    assert names == ["uint8", "int8", "uint16", "int16", "uint32",
                     "int32", "float", "double", "1bit", "2bit",
                     "4bit"]


def test_rl2_jpeg_rgb_exact():
    # bit-exact libjpeg parity (islow IDCT + fancy upsampling + fixed
    # YCbCr tables) makes even the lossy-coverage goldens exact
    px, gt, nodata, meta = read_rl2(os.path.join(DATA,
                                                 "small_world.rl2"))
    assert px.shape == (200, 400, 3)
    assert checksum(px[:, :, 0]) == 25550        # rl2_3
    assert checksum(px[:, :, 1]) == 28146
    # overview at 1:4 (res 3.6, the driver's ovr(1)) via the reduced
    # 2x2 jidctred transform
    ovr, *_ = read_rl2(os.path.join(DATA, "small_world.rl2"), scale=4)
    assert checksum(ovr[:, :, 0]) == 51412
    # section subdataset + its 1:2 overview (4x4 jidctred)
    west, *_ = read_rl2(os.path.join(DATA, "small_world.rl2"),
                        section="world_west")
    assert checksum(west[:, :, 0]) == 3721
    wovr, *_ = read_rl2(os.path.join(DATA, "small_world.rl2"),
                        section="world_west", scale=2)
    assert checksum(wovr[:, :, 0]) == 35686


def test_rl2_section_subset():
    px, *_ = read_rl2(os.path.join(DATA, "small_world.rl2"),
                      section="world_west")
    assert px.shape == (200, 200, 3)
    full, *_ = read_rl2(os.path.join(DATA, "small_world.rl2"))
    np.testing.assert_array_equal(px, full[:, :200])


def test_rl2_dispatcher():
    from gdal_ray.sources.raster import read_raster
    px, gt, nodata, meta = read_raster(os.path.join(DATA, "byte.rl2"))
    assert checksum(px) == 4672
    assert meta["driver"] == "RasterLite2"


def test_rl2_writer_roundtrip(tmp_path):
    from gdal_ray.sources.rasterlite2 import write_rl2
    ref, gt, nd, m = __import__(
        "gdal_ray.sources.raster", fromlist=["read_raster"]
    ).read_raster("/root/reference/autotest/gcore/data/byte.tif")
    p = str(tmp_path / "w.rl2")
    write_rl2(ref, p, geotransform=gt, srid=26711)
    px, gt2, nd2, m2 = read_rl2(p)
    assert checksum(px) == 4672
    assert gt2 == pytest.approx(gt)


def test_rl2_writer_types(tmp_path):
    from gdal_ray.sources.rasterlite2 import write_rl2
    rgb = (np.arange(300 * 400 * 3) % 251).astype(np.uint8) \
        .reshape(300, 400, 3)
    p = str(tmp_path / "rgb.rl2")
    write_rl2(rgb, p, tile=256)
    out, *_ = read_rl2(p)
    np.testing.assert_array_equal(out, rgb)
    for arr in ((np.arange(100 * 130) % 60000).astype(np.uint16)
                .reshape(100, 130),
                np.linspace(-5, 5, 80 * 90).reshape(80, 90)):
        p2 = str(tmp_path / f"{arr.dtype}.rl2")
        write_rl2(arr, p2)
        out, *_ = read_rl2(p2)
        np.testing.assert_array_equal(out, arr)
