"""CEOS optical imagery reader (codecs/ceos.py) — reference autotest
ceos.py golden: band 4 of the truncated IRS IMAGERY-75K fixture
checksums 9956 over the (0,0,5932,3) window (missing lines
zero-filled)."""

import numpy as np
import pytest

from gdal_ray.codecs.ceos import decode_ceos
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

F = "/root/reference/autotest/gdrivers/data/ceos/IMAGERY-75K.L-3"


class TestCeos:
    def test_window_checksum(self):
        px, gt, nd, meta = decode_ceos(F)
        assert px.shape == (5936, 5932, 4)
        assert int(checksum(px[0:3, 0:5932, 3])) == 9956
        assert meta["bits_per_pixel"] == 8

    def test_routing(self):
        px, _, _, meta = read_raster(F)
        assert meta["driver"] == "CEOS"

    def test_bad_input(self):
        with pytest.raises(ValueError):
            decode_ceos("/root/reference/autotest/gcore/data/byte.tif")
