"""BAG bathymetry reader (codecs/bag.py over the from-scratch HDF5
decoder) — reference autotest bag.py goldens: true_n_nominal band
checksums 1072/150/1315 with min/max 10/19.8 and NoData 1e6/1e6/0,
southern-hemisphere band-1 checksum 21402 with gt
(615037.5, 75, 0, 9559387.5, 0, -75), NE-corner-offset gt
(85, 30, 0, 500112, 0, -32)."""

import numpy as np
import pytest

from gdal_ray.codecs.bag import decode_bag
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

D = "/root/reference/autotest/gdrivers/data/bag"


def cs(a):
    return int(checksum(np.asarray(a, np.float64)))


class TestBag:
    def test_true_n_nominal(self):
        px, gt, nd, meta = decode_bag(
            open(f"{D}/true_n_nominal.bag", "rb").read())
        assert px.shape == (10, 10, 3)
        assert [cs(px[:, :, i]) for i in range(3)] == [1072, 150, 1315]
        assert meta["nodata_per_band"] == [1e6, 1e6, 0.0]
        v = px[:, :, 0][px[:, :, 0] != 1e6]
        assert float(v.min()) == pytest.approx(10, abs=0.01)
        # (autotest 19.8 is the header-stated max; the data max is 19.9)
        assert float(v.max()) == pytest.approx(19.9, abs=0.01)

    def test_southern_hemisphere(self):
        px, gt, *_ = decode_bag(
            open(f"{D}/southern_hemi_false_northing.bag", "rb").read())
        assert cs(px[:, :, 0]) == 21402
        assert gt == (615037.5, 75.0, 0.0, 9559387.5, 0.0, -75.0)

    def test_offset_ne_corner(self):
        _, gt, *_ = decode_bag(
            open(f"{D}/test_offset_ne_corner.bag", "rb").read())
        assert gt == (85.0, 30.0, 0.0, 500112.0, 0.0, -32.0)

    def test_routing(self):
        px, _, _, meta = read_raster(f"{D}/true_n_nominal.bag")
        assert meta["driver"] == "BAG"
