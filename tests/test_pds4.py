"""PDS4 reader parity with the reference's own
autotest/gdrivers/pds4.py — checksum 4672 + geotransform +
Transverse-Mercator SRS across the 4 cart schema versions, the Titan
oblique-cylindrical proj string and rotated geotransform, and the
hexadecimal missing-constant bit patterns."""

import pytest

from gdal_ray.codecs.pds4 import decode_pds4
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

D = "/root/reference/autotest/gdrivers/data/pds4/"

CART_VERSIONS = ["byte_pds4_cart_1700.xml", "byte_pds4_cart_1b00.xml",
                 "byte_pds4_cart_1d00_1933.xml",
                 "byte_pds4_cart_1g00_1950.xml"]


@pytest.mark.parametrize("name", CART_VERSIONS)
def test_pds4_cart_versions(name):
    px, gt, nd, meta = decode_pds4(D + name)
    assert checksum(px) == 4672
    assert gt == (-59280.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert meta["crs"] == ("+proj=tmerc +lat_0=0 +lon_0=-117 "
                           "+k=0.9996 +R=6378206.4 +units=m +no_defs")


def test_pds4_missing_constant():
    px, gt, nd, meta = decode_pds4(D + "byte_pds4_cart_1700.xml")
    assert nd == 74.0


def test_pds4_oblique_cylindrical():
    px, gt, nd, meta = decode_pds4(D + "oblique_cylindrical.xml")
    assert meta["crs"].startswith(
        "+proj=ob_tran +o_proj=eqc +o_lon_p=-158.352054 "
        "+o_lat_p=191.769776 +lon_0=-163.331591 +R=2575000 ")
    assert gt == pytest.approx(
        (-3190898.22208, 0, 351.11116, -764017.88416, 351.11116, 0),
        rel=1e-8)


@pytest.mark.parametrize("name,want", [
    ("missing_constant_hexadecimal_float.xml",
     -3.4028226550889045e38),
    ("missing_constant_hexadecimal_double.xml",
     -1.7976931348623157e308),
])
def test_pds4_hexadecimal_missing_constant(name, want):
    px, gt, nd, meta = decode_pds4(D + name)
    assert nd == want


def test_pds4_read_raster_routing():
    px, gt, nd, meta = read_raster(D + "byte_pds4_cart_1700.xml")
    assert checksum(px) == 4672
    assert meta["driver"] == "PDS4"
