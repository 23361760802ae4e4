"""Terrain / scientific grid drivers vs the reference's own autotest
goldens: Golden Software GSAG/GSBG/GS7BG (gsg.py, 4672 each),
Terragen (terragen.py 1128), Leveller (leveller.py 33441), PCRaster
CSF (pcraster.py 4528 + gt + nodata 255), ROI_PAC (roipac.py 64074 +
gt), SNODAS (snodas.py gt), and a BT 1.3 write/read roundtrip (the
reference's bt.py CreateCopy strategy, int16.tif → 4672)."""

import numpy as np
import pytest

from gdal_ray.codecs.gtiff import decode_gtiff
from gdal_ray.codecs.rawgrids import (decode_bt, decode_leveller,
                                      decode_pcraster, decode_roipac,
                                      decode_snodas, decode_surfer,
                                      decode_terragen, encode_bt)
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

A = "/root/reference/autotest/gdrivers/data/"
BYTE_GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


@pytest.mark.parametrize("name", ["gsg_binary.grd", "gsg_ascii.grd",
                                  "gsg_7binary.grd"])
def test_surfer_grids(name):
    px, gt, nd, meta = decode_surfer(open(A + "gsg/" + name,
                                          "rb").read())
    assert checksum(px) == 4672
    assert gt == BYTE_GT
    assert nd > 1.7e38


def test_surfer_routing():
    px, gt, nd, meta = read_raster(A + "gsg/gsg_binary.grd")
    assert checksum(px) == 4672 and meta["driver"] == "GSBG"


def test_terragen():
    px, gt, nd, meta = decode_terragen(
        open(A + "terragen/float32.ter", "rb").read())
    assert px.dtype == np.int16
    assert checksum(px) == 1128
    # hv' = hv * heightScale/65536 * SCAL + base * SCAL
    assert meta["scale"] == pytest.approx(60.0 * 6 / 65536.0)


def test_leveller():
    px, gt, nd, meta = decode_leveller(
        open(A + "leveller/ter6test.ter", "rb").read())
    assert px.dtype == np.float32 and px.shape == (96, 64)
    assert checksum(px) == 33441


def test_pcraster():
    px, gt, nd, meta = decode_pcraster(
        open(A + "pcraster/ldd.map", "rb").read())
    assert checksum(px) == 4528
    assert gt == (182140.0, 10.0, 0.0, 327880.0, 0.0, -10.0)
    assert nd == 255.0


def test_roipac():
    px, gt, nd, meta = decode_roipac(A + "roipac/srtm.dem")
    assert px.dtype == np.int16
    assert checksum(px) == 64074
    assert gt == pytest.approx((-180.0083333, 0.0083333333, 0.0,
                                -59.9916667, 0.0, -0.0083333333),
                               abs=1e-10)
    assert meta["crs"] == "EPSG:4326"
    assert meta["rsc"]["YMAX"] == "9"
    assert meta["scale"] == 2.0 and meta["offset"] == 1.0


def test_roipac_routing_over_usgsdem():
    px, gt, nd, meta = read_raster(A + "roipac/srtm.dem")
    assert meta["driver"] == "ROI_PAC"


def test_snodas():
    px, gt, nd, meta = decode_snodas(A + "snodas/fake_snodas.hdr")
    assert px.shape == (3351, 6935) and px.dtype == np.dtype(">i2")
    assert gt == pytest.approx(
        (-124.733749999995, 0.0083333333333330643, 0.0,
         52.874583333331302, 0.0, -0.0083333333333330054), abs=1e-12)
    assert nd == -9999.0
    assert meta["scale"] == 1.0


def test_bt_roundtrip():
    g = decode_gtiff(open("/root/reference/autotest/gcore/data/"
                          "int16.tif", "rb").read())
    bt = encode_bt(np.asarray(g.pixels), g.geotransform)
    px, gt, nd, meta = decode_bt(bt)
    assert checksum(px) == 4672
    assert (px == g.pixels).all()
    assert gt == pytest.approx(g.geotransform)


def test_bt_float_roundtrip():
    rng = np.random.default_rng(7)
    src = rng.normal(size=(13, 9)).astype(np.float32)
    px, gt, nd, meta = decode_bt(encode_bt(src, (0, 1, 0, 13, 0, -1)))
    assert (px == src).all()
