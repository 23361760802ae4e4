"""ISIS3 cube reader parity with the reference's own
autotest/gdrivers/isis.py — detached-payload label (test_isis_1,
checksum 9978 + gt + local-radius equirectangular SRS), tiled
SignedWord unit-test cube (test_isis_2, 42403 + Base/Multiplier),
GeoTIFF-delegated payload (test_isis_3), and the PointPerspective /
ObliqueCylindrical proj strings the reference asserts verbatim."""

import numpy as np

from gdal_ray.codecs.isis3 import decode_isis3
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

D = "/root/reference/autotest/gdrivers/data/isis3/"


def _gt_close(got, want):
    eps = (abs(want[0]) + abs(want[3])) / 10000.0
    return all(abs(g - w) <= max(eps, 1e-9) for g, w in zip(got, want))


def test_isis3_detached():
    px, gt, nd, meta = decode_isis3(D + "isis3_detached.lbl")
    assert checksum(px) == 9978
    assert _gt_close(gt, (-4766.96484375, 10.102499961853027, 0.0,
                          -872623.625, 0.0, -10.102499961853027))
    crs = meta["crs"]
    assert "+proj=eqc" in crs and "+lat_ts=-15.1470003" in crs
    assert "+lon_0=184.4129944" in crs
    # Mars local radius the reference embeds in the SPHEROID
    assert abs(float(crs.split("+R=")[1].split()[0])
               - 3394813.857978216) < 1e-3
    assert meta["TARGET_NAME"] == "Mars"


def test_isis3_tiled_signedword():
    px, gt, nd, meta = decode_isis3(D + "isis3_unit_test.cub")
    assert px.dtype == np.int16 and px.shape == (50, 150)
    assert checksum(px) == 42403
    assert _gt_close(gt, (653.1326414958, 0.38, 0.0,
                          -2298409.7101628, 0.0, -0.38))
    assert nd == -32768.0
    assert abs(meta["offset"] - 8190.1245134999) < 1e-9
    assert abs(meta["scale"] - 0.25006486667989) < 1e-12
    assert abs(float(meta["crs"].split("+R=")[1].split()[0])
               - 3388271.702979241) < 1e-3


def test_isis3_geotiff_payload():
    px, gt, nd, meta = decode_isis3(D + "isis3_geotiff.lbl")
    assert checksum(px) == 9978
    assert _gt_close(gt, (-4766.96484375, 10.102499961853027, 0.0,
                          -872623.625, 0.0, -10.102499961853027))


def test_isis3_pointperspective_srs():
    px, gt, nd, meta = decode_isis3(D + "isis3_pointperspective.cub")
    assert meta["crs"] == ("+proj=nsper +lat_0=-10 +lon_0=-90 "
                           "+h=31603810 +x_0=0 +y_0=0 +R=3396190 "
                           "+units=m +no_defs")
    assert px.shape == (1244, 1244, 3)


def test_isis3_obliquecylindrical_srs():
    px, gt, nd, meta = decode_isis3(D + "isis3_obliquecylindrical.cub")
    assert meta["crs"] == ("+proj=ob_tran +o_proj=eqc +o_lon_p=-90 "
                           "+o_lat_p=180 +lon_0=0 +R=3396190 "
                           "+units=m +no_defs")


def test_isis3_3band_truncated_real():
    px, gt, nd, meta = decode_isis3(
        D + "FC21B0037339_15142232818F1C_3bands_truncated.cub")
    assert px.shape == (1, 1, 3) and px.dtype == np.float32
    assert nd == float(np.float32(-3.4028226550889045e+38))


def test_isis3_read_raster_routing():
    px, gt, nd, meta = read_raster(D + "isis3_unit_test.cub")
    assert checksum(px) == 42403
    px2, *_ = read_raster(D + "isis3_detached.lbl")
    assert checksum(px2) == 9978
