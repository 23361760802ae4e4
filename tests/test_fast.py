"""EOSAT FAST reader — goldens from autotest/gdrivers/fast.py:
HPN cs 60323 over 5000x1 + gt + GAIN/BIAS metadata, HTM band 2 cs
19110 + gt, Euromap PAN/LISS3/WIFS channel conventions with the
rotated SOM and LCC geotransforms, HEADER.DAT BANDn.DAT fallback."""

import numpy as np
import pytest

from gdal_ray.codecs.fast import decode_fast
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

D = "/root/reference/autotest/gdrivers/data/fast"


def cs(a):
    return int(checksum(np.asarray(a)))


def gt_close(gt, want, tol=0.01):
    return all(abs(a - b) <= tol for a, b in zip(gt, want))


class TestFast:
    def test_hpn(self):
        px, gt, nd, meta = decode_fast(f"{D}/L71118038_03820020111_HPN.FST")
        assert px.shape == (14351, 15971)
        assert cs(px[0:1, 0:5000]) == 60323
        assert gt_close(gt, (280342.5, 15.0, 0.0, 3621457.5, 0.0, -15.0))
        assert meta["ACQUISITION_DATE"] == "20020111"
        assert meta["SATELLITE"] == "LANDSAT7"
        assert meta["SENSOR"] == "ETM+"
        assert float(meta["GAIN1"]) == pytest.approx(-6.199999809265137,
                                                     abs=1e-4)
        assert float(meta["BIAS1"]) == pytest.approx(0.775686297697179,
                                                     abs=1e-4)

    def test_htm_band2(self):
        px, gt, nd, meta = decode_fast(f"{D}/L71230079_07920021111_HTM.FST")
        assert px.shape[2] == 2
        assert cs(px[0:1, 0:7000, 1]) == 19110
        assert gt_close(gt, (528417.25, 30.0, 0.0, 7071187.0, 0.0, -30.0))

    def test_euromap_liss3(self):
        px, gt, nd, meta = decode_fast(f"{D}/n0o0y867.0fl")
        assert px.shape[2] == 4
        want = (14640936.89174916, 1.008817518246492, 24.9876841746236,
                664274.3912497687, 24.98828832116786,
                -0.9907878581173808)
        assert gt_close(gt, want, tol=1e-6)

    def test_euromap_pan(self):
        px, gt, nd, meta = decode_fast(f"{D}/h0o0y867.1ah")
        assert px.ndim == 2
        assert gt_close(gt, (676565.09, 5, 0, 5348341.5, 0, -5))
        assert meta["crs"] == "EPSG:32632"

    def test_euromap_wifs(self):
        px, gt, nd, meta = decode_fast(f"{D}/w0y13a4t.010")
        assert px.shape[2] == 2
        want = (-336965.0150603952, 176.0817495260164,
                -37.35662873563219, 484122.7765089957,
                -37.35622603749736, -176.081791954023)
        assert gt_close(gt, want, tol=1e-6)

    def test_header_dat_fallback(self):
        px, gt, nd, meta = decode_fast(f"{D}/HEADER.DAT")
        assert px.shape[2] == 7  # BAND1..7.DAT placeholders
        assert meta["SENSOR"] == ""

    def test_routing(self):
        px, gt, nd, meta = read_raster(f"{D}/L71118038_03820020111_HPN.FST")
        assert meta["driver"] == "FAST"
        assert cs(px[0:1, 0:5000]) == 60323
