"""EHdr (ESRI BIL) + ENVI raw drivers — golden parity with the
reference's own fixtures (autotest/gdrivers/ehdr.py, envi.py)."""

import numpy as np
import pytest

from gdal_ray.codecs.ehdr import decode_ehdr, decode_envi, encode_ehdr
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/"


def test_ehdr10_golden():
    # NBITS absent -> inferred from file size (4 bytes -> float32);
    # msbfirst byte order; ArcInfo cellsize georeferencing
    px, gt, nd = decode_ehdr(open(D + "ehdr/ehdr10.hdr").read(),
                             open(D + "ehdr/ehdr10.bil", "rb").read())
    assert px.dtype == np.float32
    assert checksum(px) == 8202          # ehdr.py:186
    assert gt[1] == 2500.0 and gt[0] == -17973801.662435


def test_float32_golden():
    px, gt, _ = decode_ehdr(open(D + "ehdr/float32.hdr").read(),
                            open(D + "ehdr/float32.bil", "rb").read())
    assert px.shape == (20, 20) and px.dtype == np.float32
    assert checksum(px) == 27            # ehdr.py:54
    # ULXMAP is the UL pixel CENTER: corner = 440750 - 60/2
    assert gt[0] == pytest.approx(440720.0)


def test_envi_aea_golden():
    px, gt = decode_envi(open(D + "envi/aea.hdr").read(),
                         open(D + "envi/aea.dat", "rb").read())
    assert checksum(px) == 14823         # envi.py:34
    assert gt[1] > 0


def test_envi_rgb_bil():
    px, _ = decode_envi(open(D + "envi/envi_rgbsmall_bil.hdr").read(),
                        open(D + "envi/envi_rgbsmall_bil.img", "rb").read())
    assert px.shape == (49, 50, 3)


def test_ehdr_roundtrip_layouts():
    r = np.random.default_rng(0).integers(0, 255, (7, 9, 3),
                                          dtype=np.uint8)
    for layout in ("bil", "bip", "bsq"):
        h, d = encode_ehdr(r, (10.0, 2.0, 0.0, 50.0, 0.0, -2.0),
                           layout=layout)
        back, gt, _ = decode_ehdr(h, d)
        assert (back == r).all()
        assert np.allclose(gt, (10, 2, 0, 50, 0, -2))
    f = np.linspace(-5, 5, 20).reshape(4, 5).astype(np.float32)
    h, d = encode_ehdr(f, nodata=-9999.0)
    back, _, nd = decode_ehdr(h, d)
    assert back.dtype == np.float32 and (back == f).all()
    assert nd == -9999.0


def test_envi_rejects_non_envi():
    with pytest.raises(ValueError):
        decode_envi("NROWS 2\nNCOLS 2\n", b"\x00" * 4)


def test_doq1_fake_fixture():
    """DOQ1 (old USGS DOQ): header-field parse parity on the
    reference's fake fixture (doq1.py opens it with checksum -1) —
    dims 500x500, UTM zone 31 / WGS84, UL (500000, 5000000)."""
    from gdal_ray.sources.raster import read_raster
    p = "/root/reference/autotest/gdrivers/data/doq1/fakedoq1.doq"
    import os
    import pytest as _pt
    if not os.path.exists(p):
        _pt.skip("reference absent")
    px, gt, nodata, meta = read_raster(p)
    assert px.shape == (500, 500)
    assert gt == (500000.0, 1.0, 0.0, 5000000.0, 0.0, -1.0)
    assert meta["crs"] == "EPSG:32631"
