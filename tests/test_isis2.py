"""ISIS2 QUBE reader parity with the reference's own
autotest/gdrivers/isis2.py (checksum 382, geotransform within the
gdaltest tolerance, simple-cylindrical Venus sphere SRS)."""

import numpy as np

from gdal_ray.codecs.isis2 import decode_isis2
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

F = ("/root/reference/autotest/gdrivers/data/isis2/"
     "arvidson_original_truncated.cub")


def test_isis2_arvidson():
    px, gt, nd, meta = decode_isis2(F)
    assert px.dtype == np.float32 and px.shape == (1, 43)
    assert checksum(px) == 382
    want = (10157400.403618813, 1200.0000476837158, 0.0,
            -585000.02324581146, 0.0, -1200.0000476837158)
    # gdaltest's check_gt tolerance: the expected constants carry a
    # float32-era rounding of MAP_SCALE; compare at 1e-4 relative
    for g, w in zip(gt, want):
        assert abs(g - w) <= 1e-4 * max(1.0, abs(w))
    assert meta["crs"] == ("+proj=eqc +lat_ts=-6.5 +lat_0=0 +lon_0=0 "
                           "+R=6051000 +units=m +no_defs")
    assert meta["TARGET_NAME"] == "VENUS"
    assert nd is not None and nd < -3e38      # CORE_NULL hex float


def test_isis2_routing():
    px, gt, nd, meta = read_raster(F)
    assert checksum(px) == 382
    assert meta["driver"] == "ISIS2"
