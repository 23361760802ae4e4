"""World files + PAM .aux.xml sidecars — parity with the reference's
own fixtures (GDALReadWorldFile / gdalpamdataset.cpp semantics)."""

import os

import pytest

from gdal_ray.sources.sidecar import (find_pam, find_worldfile,
                                      parse_worldfile, read_pam,
                                      read_worldfile)

REF = "/root/reference/autotest"


def test_comma_decimal_worldfile():
    # png/test.wld uses ',' decimals (CPLAtofM tolerance) and rotation
    gt = parse_worldfile(open(f"{REF}/gdrivers/data/png/test.wld").read())
    assert gt[1] == 0.38 and gt[5] == -0.38
    assert gt[2] == 0.01 and gt[4] == -0.01
    # center → corner backs off half of BOTH axis vectors
    assert gt[0] == pytest.approx(700000.50 - 0.19 - 0.005)
    assert gt[3] == pytest.approx(4287500.50 + 0.005 + 0.19)


def test_tfw():
    gt = parse_worldfile(open(f"{REF}/gcore/data/byte_nogeoref.tfw").read())
    assert gt == (99.5, 1.0, 0.0, 200.5, 0.0, -1.0)


def test_find_worldfile(tmp_path):
    img = tmp_path / "x.png"
    img.write_bytes(b"")
    (tmp_path / "x.pgw").write_text("1\n0\n0\n-1\n0.5\n9.5\n")
    assert find_worldfile(str(img)).endswith("x.pgw")
    assert read_worldfile(str(img)) == (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
    assert read_worldfile(str(tmp_path / "missing.png")) is None


def test_pam_geotransform_srs():
    p = read_pam(f"{REF}/gdrivers/data/jpeg2000/byte_nogeoref.jp2.aux.xml")
    assert p["geotransform"] == (100.0, 1.0, 0.0, 300.0, 0.0, -1.0)
    assert p["srs"].startswith("LOCAL_CS")


def test_pam_band_metadata():
    p = read_pam(f"{REF}/utilities/data/utmsmall.tif.aux.xml")
    md = p["bands"][1]["metadata"]
    assert md["STATISTICS_MEAN"] == "154.6212"
    assert md["STATISTICS_MAXIMUM"] == "255"
    assert md["testkey"] == "test value"


def test_find_pam():
    img = f"{REF}/utilities/data/utmsmall.tif"
    assert find_pam(img).endswith(".aux.xml")
    assert find_pam("/nonexistent/x.tif") is None


def test_bad_pam(tmp_path):
    p = tmp_path / "x.aux.xml"
    p.write_text("<NotPam/>")
    with pytest.raises(ValueError, match="PAMDataset"):
        read_pam(str(p))


class TestReadRaster:
    """read_raster: GDALOpen-style routing + sidecar override order."""

    def test_dispatch_matrix(self):
        from gdal_ray.core.checksum import checksum
        from gdal_ray.sources.raster import read_raster
        cases = [
            ("/root/reference/autotest/gcore/data/byte.tif", 4672),
            ("/root/reference/autotest/gcore/data/byte.vrt", 4672),
            ("/root/reference/autotest/gdrivers/data/netcdf/byte.nc", 4672),
            ("/root/reference/autotest/gdrivers/data/aaigrid/byte.tif.grd",
             4672),
            ("/root/reference/autotest/gdrivers/data/n43.dt0", 49187),
            ("/root/reference/autotest/gdrivers/data/gif/bug407.gif", 57921),
        ]
        for p, exp in cases:
            px, gt, nd, meta = read_raster(p)
            b0 = px if px.ndim == 2 else px[:, :, 0]
            assert checksum(b0) == exp, p

    def test_worldfile_fills_missing_gt(self, tmp_path):
        import numpy as np
        from gdal_ray.codecs.png import encode
        from gdal_ray.sources.raster import read_raster
        (tmp_path / "t.png").write_bytes(encode(np.zeros((4, 4), np.uint8)))
        (tmp_path / "t.pgw").write_text("2\n0\n0\n-2\n1\n9\n")
        _, gt, _, _ = read_raster(str(tmp_path / "t.png"))
        assert gt == (0.0, 2.0, 0.0, 10.0, 0.0, -2.0)

    def test_pam_crs_attaches(self):
        from gdal_ray.sources.raster import read_raster
        _, _, _, meta = read_raster(
            "/root/reference/autotest/utilities/data/utmsmall.tif")
        assert meta.get("crs", "").startswith("EPSG:")


def test_write_worldfile_roundtrip(tmp_path):
    from gdal_ray.sources.sidecar import parse_worldfile, write_worldfile
    gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    p = str(tmp_path / "x.tfw")
    write_worldfile(gt, p)
    assert parse_worldfile(open(p).read()) == gt
    rot = (10.0, 2.0, 0.3, 90.0, -0.3, -2.0)
    write_worldfile(rot, p)
    back = parse_worldfile(open(p).read())
    assert all(abs(a - b) < 1e-12 for a, b in zip(back, rot))
