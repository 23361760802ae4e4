"""Racurs PHOTOMOD PRF reader vs the reference autotest expectations
(autotest/gdrivers/prf.py: checksum 43190 + gt for ph.prf; 4330x4663
float32 / unit m / 1 overview 1082x1165 / gt for dem.x-dem)."""

import os

import numpy as np
import pytest

from gdal_ray.codecs.prf import decode_prf
from gdal_ray.core.checksum import checksum

DATA = "/root/reference/autotest/gdrivers/data/PRF"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference fixtures unavailable")


def test_prf_megatiff():
    px, gt, nodata, meta = decode_prf(os.path.join(DATA, "ph.prf"))
    assert px.shape == (268, 201) and px.dtype == np.uint16
    assert checksum(px) == 43190
    assert gt == (1.0, 2.0, 3.0, -7.0, 5.0, 6.0)
    assert meta["overviews"] == []


def test_prf_xdem():
    path = os.path.join(DATA, "dem.x-dem")
    px, gt, nodata, meta = decode_prf(path)
    assert px.shape == (4663, 4330) and px.dtype == np.float32
    assert gt == (1.5, 1.0, 0.0, 9329.0, 0.0, -2.0)
    assert meta["units"] == "m"
    assert nodata == pytest.approx(-1111111.0)
    assert checksum(px) == 0
    assert meta["overviews"] == [(1082, 1165)]
    ov, _, _, _ = decode_prf(path, overview=0)
    assert ov.shape == (1165, 1082)


def test_prf_dispatch():
    from gdal_ray.sources.raster import read_raster
    px, gt, nodata, meta = read_raster(os.path.join(DATA, "ph.prf"))
    assert checksum(px) == 43190
