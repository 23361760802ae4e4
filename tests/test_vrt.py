"""VRT virtual-raster reader — golden parity with the reference's own
gcore/data VRT matrix (autotest/gcore/vrt_read.py:45-75)."""

import numpy as np
import pytest

from gdal_ray.core.checksum import checksum
from gdal_ray.sources.vrt import read_vrt

D = "/root/reference/autotest/gcore/data/"

GOLDENS = [
    ("byte.vrt", 4672), ("int16.vrt", 4672), ("uint16.vrt", 4672),
    ("int32.vrt", 4672), ("uint32.vrt", 4672), ("float32.vrt", 4672),
    ("float64.vrt", 4672),
    ("cint16.vrt", 5028), ("cint32.vrt", 5028),
    ("cfloat32.vrt", 5028), ("cfloat64.vrt", 5028),
    ("msubwinbyte.vrt", 2699),            # multi-window mosaic
    ("utmsmall.vrt", 50054),
    ("byte_nearest_50pct.vrt", 1192),     # nearest downsample
    ("byte_averaged_50pct.vrt", 1152),    # box-average downsample
    ("byte_nearest_200pct.vrt", 18784),
    ("byte_averaged_200pct.vrt", 18784),  # avg upsample == nearest
]


@pytest.mark.parametrize("fname,cs", GOLDENS,
                         ids=[g[0].split(".")[0] for g in GOLDENS])
def test_vrt_open_golden(fname, cs):
    v = read_vrt(D + fname)
    px = v.pixels if v.pixels.ndim == 2 else v.pixels[:, :, 0]
    assert checksum(px) == cs


def test_header_fields():
    v = read_vrt(D + "byte.vrt")
    assert v.geotransform == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert "NAD27 / UTM zone 11N" in v.crs
    assert v.nodata == 107.0               # byte.vrt NodataValue
    assert v.metadata.get("test") == "testvalue"


def test_dtypes_preserved():
    assert read_vrt(D + "int16.vrt").pixels.dtype == np.int16
    assert read_vrt(D + "float64.vrt").pixels.dtype == np.float64
    assert read_vrt(D + "cint16.vrt").pixels.dtype == np.complex64


def test_multiband_multiwindow():
    v = read_vrt(D + "msubwinbyte.vrt")
    assert v.pixels.shape == (50, 50, 3)
    # sources paste into sub-windows: the pasted regions are non-zero,
    # everything outside them stays initialized to zero
    b0 = v.pixels[:, :, 0]
    assert b0[:20, :].sum() == 0            # above both DstRects
    assert b0[20:32, 20:30].sum() > 0       # first pasted window


def test_bad_input(tmp_path):
    p = tmp_path / "x.vrt"
    p.write_text("<NotVrt/>")
    with pytest.raises(ValueError, match="VRTDataset"):
        read_vrt(str(p))
