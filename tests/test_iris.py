"""IRIS weather-radar reader — goldens from autotest/gdrivers/iris.py
(fakeiris 65532, iristest 52872, Vincenty+Mercator geotransform,
26 metadata items)."""

import numpy as np
import pytest

from gdal_ray.codecs.iris import decode_iris
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

D = "/root/reference/autotest/gdrivers/data/iris"

EXPECTED_MD = {
    "AZIMUTH_SMOOTHING_FOR_SHEAR": "0.0",
    "CAPPI_BOTTOM_HEIGHT": "1000.0 m",
    "COMPOSITED_PRODUCT": "YES",
    "COMPOSITED_PRODUCT_MASK": "0x0000080c",
    "DATA_TYPE": "Clutter Corrected H reflectivity (1 byte)",
    "DATA_TYPE_CODE": "dBZ",
    "DATA_TYPE_INPUT": "Clutter Corrected H reflectivity (1 byte)",
    "DATA_TYPE_INPUT_CODE": "dBZ",
    "DATA_TYPE_UNITS": "dBZ",
    "GROUND_HEIGHT": "523 m",
    "INGEST_HARDWARE_NAME": "composada       ",
    "INGEST_SITE_IRIS_VERSION": "8.12",
    "INGEST_SITE_NAME": "composada       ",
    "MAX_AGE_FOR_SHEAR_VVP_CORRECTION": "600 s",
    "NYQUIST_VELOCITY": "6.00 m/s",
    "PRF": "450 Hz",
    "PRODUCT": "CAPPI",
    "PRODUCT_CONFIGURATION_NAME": "CAPPI250CAT ",
    "PRODUCT_ID": "3",
    "PRODUCT_SITE_IRIS_VERSION": "8.12",
    "PRODUCT_SITE_NAME": "SMCXRADSRV01    ",
    "RADAR_HEIGHT": "542 m",
    "TASK_NAME": "PPIVOL_A    ",
    "TIME_INPUT_INGEST_SWEEP": "2012-04-19 14:48:05",
    "TIME_PRODUCT_GENERATED": "2012-04-19 14:48:30",
    "WAVELENGTH": "5.33 cm",
}


class TestIris:
    def test_fakeiris(self):
        px, gt, nd, meta = decode_iris(
            open(f"{D}/fakeiris.dat", "rb").read())
        assert int(checksum(px)) == 65532

    def test_iristest(self):
        px, gt, nd, meta = decode_iris(
            open(f"{D}/iristest.dat", "rb").read())
        assert int(checksum(px)) == 52872
        want = (16435.721785269096, 1370.4263720754534, 0.0,
                5289830.4584420761, 0.0, -1357.6498705837876)
        for a, b in zip(gt, want):
            if b == 0.0:
                assert a == 0.0
            else:
                assert abs(a - b) / abs(b) <= 1e-5
        for k, v in EXPECTED_MD.items():
            assert meta.get(k) == v, k

    def test_routing(self):
        px, gt, nd, meta = read_raster(f"{D}/iristest.dat")
        assert meta["driver"] == "IRIS"
        assert int(checksum(px)) == 52872
