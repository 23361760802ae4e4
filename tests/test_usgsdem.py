"""USGS DEM reader parity with the reference's own
autotest/gdrivers/usgsdem.py checksums and geotransforms."""

import numpy as np
import pytest

from gdal_ray.codecs.usgsdem import decode_usgsdem
from gdal_ray.core.checksum import checksum

DATA = "/root/reference/autotest/gdrivers/data/usgsdem/"

CASES = [
    # file, checksum, geotransform, dtype, crs
    ("022gdeme_truncated", 1583,
     (-67.00041667, 0.00083333, 0.0, 50.000416667, 0.0, -0.00083333),
     np.int16, "EPSG:4267"),
    ("114p01_0100_deme_truncated.dem", 53864,
     (-136.25010416667, 0.000208333, 0.0, 59.25010416667, 0.0,
      -0.000208333), np.int16, "EPSG:4267"),
    ("39079G6_truncated.dem", 61424,
     (606855.0, 30.0, 0.0, 4414605.0, 0.0, -30.0),
     np.int16, "EPSG:32217"),          # WGS72 / UTM 17N
    ("39109h1_truncated.dem", 39443,
     (660055.0, 10.0, 0.0, 4429465.0, 0.0, -10.0),
     np.float32, "EPSG:26712"),        # NAD27 / UTM 12N, zres<1
    ("4619old_truncated.dem", 10659,
     (18.99958333, 0.0008333, 0.0, 47.000416667, 0.0, -0.0008333),
     np.int16, "EPSG:4267"),
    ("usgsdem_with_extra_values_at_end_of_profile.dem", 56679,
     None, np.int16, "EPSG:26710"),
    ("usgsdem_with_spaces_after_byte_864.dem", 61078,
     None, np.int16, "EPSG:26710"),
    ("record_1025_ending_with_linefeed.dem", 14172,
     None, np.int16, "EPSG:26711"),
]


@pytest.mark.parametrize("name,cs,gt_exp,dtype,crs",
                         CASES, ids=[c[0] for c in CASES])
def test_usgsdem_golden(name, cs, gt_exp, dtype, crs):
    px, gt, nodata, meta = decode_usgsdem(open(DATA + name, "rb").read())
    assert checksum(px) == cs
    assert px.dtype == dtype
    assert nodata == -32767.0
    assert meta.get("crs") == crs
    if gt_exp is not None:
        assert np.allclose(gt, gt_exp, atol=1e-6)


def test_usgsdem_dispatch():
    from gdal_ray.sources.raster import read_raster
    px, gt, nodata, meta = read_raster(
        DATA + "39079G6_truncated.dem")
    assert checksum(px) == 61424
    assert meta["driver"] == "USGSDEM"


def test_usgsdem_not_a_dem():
    with pytest.raises(ValueError):
        decode_usgsdem(b"\x00" * 4096)
