"""Sentinel-1 SAFE reader (sources/safe.py) — reference autotest
safe.py goldens on the fake GRD product: band checksums 65372 (VH) /
3732 (VV), the exact FOOTPRINT WKT string, per-polarization
subsetting, annotation geolocation GCPs."""

import numpy as np

from gdal_ray.core.checksum import checksum
from gdal_ray.sources.safe import read_safe

M = ("/root/reference/autotest/gdrivers/data/SAFE_FAKE/test.SAFE/"
     "manifest.safe")


class TestSafe:
    def test_bands(self):
        px, _, _, meta = read_safe(M)
        assert px.shape == (167, 256, 2)
        assert meta["poles"] == ["VH", "VV"]
        assert int(checksum(px[:, :, 0])) == 65372
        assert int(checksum(px[:, :, 1])) == 3732

    def test_footprint(self):
        _, _, _, meta = read_safe(M)
        assert meta["FOOTPRINT"] == (
            "POLYGON((-8.407759 38.130520,-11.335915 38.535374,"
            "-11.026125 40.036644,-8.035001 39.633217, "
            "-8.407759 38.130520))")

    def test_polarization_subset(self):
        px, _, _, meta = read_safe(M, polarization="VH")
        assert px.ndim == 2
        assert int(checksum(px)) == 65372
        assert meta["poles"] == ["VH"]
        assert len(meta["gcps"]) >= 1


# ---------------------------------------------------------------------------
# SENTINEL1_CALIB subdatasets (safe.py test_safe_WV + calibrated opens)
# ---------------------------------------------------------------------------

WV = "/root/reference/autotest/gdrivers/data/SAFE_FAKE_WV"


def test_safe_wv_subdatasets():
    from gdal_ray.sources.safe import list_safe_subdatasets
    subds = list_safe_subdatasets(WV)
    assert len(subds) == 10
    assert (f"SENTINEL1_CALIB:SIGMA0:{WV}/manifest.safe:"
            "WV1_VV_001:INTENSITY") in subds
    assert (f"SENTINEL1_CALIB:SIGMA0:{WV}/manifest.safe:"
            "WV2_VV_002:INTENSITY") in subds


def test_safe_wv_per_measurement_gcps():
    from gdal_ray.sources.safe import read_safe_calib
    _px, _gt, _nd, meta = read_safe_calib(
        f"SENTINEL1_CALIB:SIGMA0:{WV}/manifest.safe:WV1_VV_001:INTENSITY")
    assert len(meta["gcps"]) == 1
    _px, _gt, _nd, meta = read_safe_calib(
        f"SENTINEL1_CALIB:SIGMA0:{WV}/manifest.safe:WV2_VV_002:INTENSITY")
    assert len(meta["gcps"]) == 2


def test_safe_wv_bad_spec():
    import pytest
    from gdal_ray.sources.safe import read_safe_calib
    with pytest.raises(ValueError):
        read_safe_calib(
            f"SENTINEL1_CALIB:SIGMA0:{WV}/manifest.safe:"
            "WV1_VV_001:INTENSITYxxxx")


def test_safe_uncalib_grd_checksums():
    # safe.py test_safe_3 / test_safe_4 through the subdataset path
    from gdal_ray.core.checksum import checksum
    from gdal_ray.sources.safe import read_safe_calib
    D = "/root/reference/autotest/gdrivers/data/SAFE_FAKE/test.SAFE"
    px, _gt, _nd, _m = read_safe_calib(
        f"SENTINEL1_CALIB:UNCALIB:{D}/manifest.safe:IW_VH:AMPLITUDE")
    assert checksum(px) == 65372
    px, _gt, _nd, _m = read_safe_calib(
        f"SENTINEL1_CALIB:UNCALIB:{D}/manifest.safe:IW_VV:AMPLITUDE")
    assert checksum(px) == 3732


def test_safe_calibration_lut(tmp_path):
    # synthetic sigmaNought vectors: constant A=2 -> sigma0 = DN^2/4
    import shutil
    import numpy as np
    from gdal_ray.sources.safe import read_safe_calib
    D = "/root/reference/autotest/gdrivers/data/SAFE_FAKE/test.SAFE"
    dst = tmp_path / "test.SAFE"
    shutil.copytree(D, dst)
    name = ("calibration-s1a-iw-grd-vh-20150705t064241-20150705t064306-"
            "006672-008ea0-002.xml")
    (dst / "annotation" / "calibration" / name).write_text("""<calibration>
  <calibrationVectorList count="2">
    <calibrationVector>
      <azimuthTime>2015-07-05T06:42:41.0</azimuthTime>
      <line>0</line>
      <pixel count="2">0 9</pixel>
      <sigmaNought count="2">2.0 2.0</sigmaNought>
    </calibrationVector>
    <calibrationVector>
      <azimuthTime>2015-07-05T06:43:06.0</azimuthTime>
      <line>9</line>
      <pixel count="2">0 9</pixel>
      <sigmaNought count="2">2.0 2.0</sigmaNought>
    </calibrationVector>
  </calibrationVectorList>
</calibration>""")
    sigma, _gt, _nd, meta = read_safe_calib(
        f"SENTINEL1_CALIB:SIGMA0:{dst}/manifest.safe:IW_VH:INTENSITY")
    dn, _gt, _nd, _m = read_safe_calib(
        f"SENTINEL1_CALIB:UNCALIB:{dst}/manifest.safe:IW_VH:AMPLITUDE")
    assert meta.get("calibration_lut") != "absent"
    assert np.allclose(sigma, dn.astype(np.float64) ** 2 / 4.0)
