"""IHO S-100 family readers (codecs/s100.py over the from-scratch
HDF5 decoder) — reference autotest s102.py expectations: 3x2 grid,
gt (1.8, 0.4, 0, 48.75, 0, -0.5), EPSG:4326, depth/uncertainty bands
with NoData 1e6 and exact north-up values, the vertical-datum
metadata dict; plus S-104 water level and S-111 surface currents."""

import numpy as np
import pytest

from gdal_ray.codecs.s100 import decode_s100
from gdal_ray.sources.raster import read_raster

D = "/root/reference/autotest/gdrivers/data"


class TestS102:
    @pytest.mark.parametrize("ver", ["2.1", "2.2"])
    def test_basic(self, ver):
        px, gt, nd, meta = decode_s100(
            open(f"{D}/s102/test_s102_v{ver}.h5", "rb").read())
        assert px.shape == (2, 3, 2)
        assert meta["bands"] == ["depth", "uncertainty"]
        assert gt == pytest.approx((1.8, 0.4, 0.0, 48.75, 0.0, -0.5))
        assert nd == 1e6
        assert px[:, :, 0].ravel().tolist() == \
            [1e6, 4, 5, 0, 1, 2]
        assert px[:, :, 1].ravel().tolist() == \
            [103, 1e6, 105, 100, 101, 102]
        md = meta["metadata"]
        assert md["VERTICAL_DATUM_ABBREV"] == "MLLW"
        assert md["VERTICAL_DATUM_NAME"] == "meanLowerLowWater"
        assert md["geographicIdentifier"] == "Somewhere"
        assert md["issueDate"] == "2023-12-31"
        assert meta["crs"] == "EPSG:4326"

    def test_routing(self):
        px, gt, nd, meta = read_raster(f"{D}/s102/test_s102_v2.2.h5")
        assert meta["driver"] == "S102"


class TestS104S111:
    def test_s104(self):
        px, gt, nd, meta = decode_s100(
            open(f"{D}/s104/test_s104_v1.1.h5", "rb").read())
        assert meta["driver"] == "S104"
        assert meta["bands"] == ["waterLevelHeight", "waterLevelTrend"]
        assert gt == pytest.approx((1.8, 0.4, 0.0, 48.75, 0.0, -0.5))

    def test_s111(self):
        px, gt, nd, meta = decode_s100(
            open(f"{D}/s111/test_s111_v1.2.h5", "rb").read())
        assert meta["driver"] == "S111"
        assert meta["bands"] == ["surfaceCurrentSpeed",
                                 "surfaceCurrentDirection"]
