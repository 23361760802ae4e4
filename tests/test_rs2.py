"""RADARSAT-2 product reader (codecs/rs2.py) — reference autotest
rs2.py goldens: raw band checksum 4672, BETA0-calibrated 4848
((DN*DN + offset)/gain), the full RPC metadata mapping, tie-point
GCPs."""

import numpy as np

from gdal_ray.codecs.rs2 import decode_rs2
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

D = "/root/reference/autotest/gdrivers/data/rs2"


def cs(a):
    return int(checksum(np.asarray(a)))


class TestRs2:
    def test_raw(self):
        px, _, _, meta = decode_rs2(f"{D}/product.xml")
        assert px.shape == (20, 20, 2)
        assert cs(px[:, :, 0]) == 4672      # test_rs2_1
        assert meta["poles"] == ["HH", "HV"]
        assert meta["SATELLITE_IDENTIFIER"] == "SATELLITE"

    def test_beta0(self):
        px, *_ = decode_rs2(f"{D}/product.xml", calibration="BETA0")
        assert px.dtype == np.float32
        assert cs(px[:, :, 0]) == 4848      # test_rs2_2

    def test_rpc(self):
        _, _, _, meta = decode_rs2(f"{D}/product.xml")
        rpc = meta["RPC"]
        assert rpc["ERR_BIAS"] == "biasError"
        assert rpc["SAMP_DEN_COEFF"] == "pixelDenominatorCoefficients"
        assert len(rpc) == 16               # test_rs2_3 full mapping
        assert len(meta["gcps"]) == 4

    def test_routing(self):
        px, _, _, meta = read_raster(f"{D}/product.xml")
        assert meta["driver"] == "RS2"
