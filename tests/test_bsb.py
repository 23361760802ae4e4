"""BSB/KAP nautical-chart reader parity with the reference's own
autotest/gdrivers/bsb.py — rgbsmall.kap, the trailing-index variant
and the in-data line-break variant all checksum 30321; truncated
files raise."""

import pytest

from gdal_ray.codecs.bsb import decode_bsb
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

D = "/root/reference/autotest/gdrivers/data/bsb/"


@pytest.mark.parametrize("name", ["rgbsmall.kap", "rgbsmall_index.kap",
                                  "rgbsmall_with_line_break.kap"])
def test_bsb_rgbsmall_variants(name):
    px, gt, nd, meta = decode_bsb(open(D + name, "rb").read())
    assert px.shape == (50, 50)
    assert checksum(px) == 30321
    assert meta["palette"].shape[0] == 127
    assert meta["KNP.PR"] == "Mercator"
    assert meta["KNP.GD"] == "WGS84"


def test_bsb_australia():
    px, gt, nd, meta = decode_bsb(open(D + "australia4c.kap",
                                       "rb").read())
    assert px.shape == (480, 625)
    assert meta["palette"].shape[0] == 4


def test_bsb_truncated_raises():
    with pytest.raises(ValueError):
        decode_bsb(open(D + "rgbsmall_truncated.kap", "rb").read())


def test_bsb_routing():
    px, gt, nd, meta = read_raster(D + "rgbsmall.kap")
    assert checksum(px) == 30321 and meta["driver"] == "BSB"
