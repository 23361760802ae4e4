"""CPG (Convair PolGASP) reader vs the reference driver semantics
(frmts/raw/cpgdataset.cpp; autotest/gdrivers/cpg.py expects band 1 of
fakecpgSIRC.hdr to open with checksum 0)."""
import numpy as np
import pytest

from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

REF = "/root/reference/autotest/gdrivers/data/cpg"


def test_cpg_sirc_fixture():
    px, gt, nd, meta = read_raster(f"{REF}/fakecpgSIRC.hdr")
    assert px.shape == (1, 1, 4) and px.dtype == np.complex64
    assert checksum(px[:, :, 0]) == 0          # autotest test_cpg_1
    assert gt is None
    assert meta["MATRIX_REPRESENTATION"] == "SCATTERING"
    # iGeoParamsFound == 5 → 16 slant→ground GCPs
    g = meta["gcps"]
    assert len(g) == 16
    assert g[0] == {"id": "1", "pixel": 0.0, "line": 0.0,
                    "x": 0.0, "y": 0.01, "z": 0.0}
    # ngcp=1: t = 0.01 + 0.01/3 → x = sqrt(t²-alt²)
    t = 0.01 + 0.01 / 3.0
    assert g[1]["x"] == pytest.approx((t * t - 1e-4) ** 0.5)


def test_cpg_sirc_scaling(tmp_path):
    """Nonzero SIRC bytes decode per the published dcomp formula."""
    hdr = tmp_path / "synthSIRC.hdr"
    hdr.write_text("number_lines 1\nnumber_samples 2\n")
    rec = np.array([[2, 100, 50, -30, 10, 20, 30, 40, 50, 60],
                    [-3, 0, 127, 0, 0, 0, 0, 0, 0, -127]],
                   np.int8).tobytes()
    (tmp_path / "synthSIRC.img").write_bytes(rec)
    px, gt, nd, meta = read_raster(str(hdr))
    ysca0 = np.sqrt((100 / 254 + 1.5) * 2.0 ** 2)
    assert px[0, 0, 0] == pytest.approx(
        complex(50 * ysca0 / 127, -30 * ysca0 / 127), rel=1e-6)
    ysca1 = np.sqrt(1.5 * 2.0 ** -3)
    assert px[0, 1, 0] == pytest.approx(complex(ysca1, 0), rel=1e-6)
    assert px[0, 1, 3] == pytest.approx(complex(0, -ysca1), rel=1e-6)


def test_cpg_type1_quadpol(tmp_path):
    """sso/polgasp layout: four big-endian CFloat32 files."""
    rng = np.random.default_rng(7)
    data = {}
    for pol in ("hh", "hv", "vv", "vh"):
        arr = (rng.normal(size=(3, 4)) +
               1j * rng.normal(size=(3, 4))).astype(np.complex64)
        data[pol] = arr
        (tmp_path / f"sso-{pol}.img").write_bytes(
            arr.astype(">c8").tobytes())
        (tmp_path / f"sso-{pol}.hdr").write_text(
            "number_lines 3\nnumber_samples 4\n"
            "reference north 5000000\nreference east 400000\n"
            "reference projection UTM zone 17\n"
            "reference corner Upper_Left\n"
            "sample_size 5\nsample_size_az 5\ntransposed 0\n")
    px, gt, nd, meta = read_raster(str(tmp_path / "sso-hh.hdr"))
    assert px.shape == (3, 4, 4)
    # band order hh, hv, vv, vh (cpgdataset.cpp:628)
    for i, pol in enumerate(("hh", "hv", "vv", "vh")):
        np.testing.assert_array_equal(px[:, :, i], data[pol])
    assert gt == (400000.0, 5.0, 0.0, 5000000.0, 0.0, -5.0)
    assert meta["crs"] == "EPSG:32617"
