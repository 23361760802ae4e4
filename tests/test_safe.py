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
