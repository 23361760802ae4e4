"""RMF (.rsw/.mtw), Northwood NWT_GRD/GRC and ArcInfo Binary Grid —
reference-fixture goldens from autotest/gdrivers/{rmf,nwt_grd,
nwt_grc,aigrid}.py."""

import numpy as np
import pytest

from gdal_ray.codecs.aig import decode_aig
from gdal_ray.codecs.northwood import decode_nwt_grc, decode_nwt_grd
from gdal_ray.codecs.rmf import decode_rmf
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

D = "/root/reference/autotest/gdrivers/data"


def cs(a):
    # keep the native dtype: GDAL checksums integer bands through the
    # Int32 path (INT_MIN stays INT_MIN; the float path clamps at
    # -2147483647, which shifts nodata-heavy DEM checksums)
    return int(checksum(np.asarray(a)))


def bands_cs(px):
    if px.ndim == 2:
        return [cs(px)]
    return [cs(px[:, :, i]) for i in range(px.shape[2])]


class TestRmf:
    @pytest.mark.parametrize("name,want", [
        ("byte.rsw", [4672]),
        ("byte-lzw.rsw", [40503]),
        ("float64.mtw", [4672]),
        ("rgbsmall.rsw", [21212, 21053, 21349]),
        ("rgbsmall-lzw.rsw", [40503, 41429, 40238]),
        ("big-endian.rsw", [7782, 8480, 4195]),
        ("t100.mtw", [6388]),
        ("cucled-1.rsw", [4672]),
        ("cucled-2.rsw", [4672]),
        ("invalid-subheader.rsw", [4672]),
        ("corrupted-subheader.rsw", [4672]),
    ])
    def test_checksums(self, name, want):
        px, gt, nd, meta = decode_rmf(open(f"{D}/rmf/{name}",
                                           "rb").read())
        assert bands_cs(px) == want

    def test_routing_and_georef(self):
        px, gt, nd, meta = read_raster(f"{D}/rmf/byte.rsw")
        assert meta["driver"] == "RMF"
        assert cs(px) == 4672
        assert gt is not None and gt[1] > 0


class TestNorthwood:
    def test_grd_four_bands(self):
        px, gt, nd, meta = decode_nwt_grd(
            open(f"{D}/nwt_grd/nwt_grd.grd", "rb").read())
        assert px.shape[2] == 4
        assert bands_cs(px) == [28093, 33690, 20365, 25856]
        assert nd == pytest.approx(-1e37, rel=1e-6)

    def test_grc(self):
        px, gt, nd, meta = decode_nwt_grc(
            open(f"{D}/nwt_grc/nwt_grc.grc", "rb").read())
        assert cs(px) == 46760
        assert meta["classes"][0] == (1, "one")

    def test_routing(self):
        px, _, _, meta = read_raster(f"{D}/nwt_grd/nwt_grd.grd")
        assert meta["driver"] == "NWT_GRD"
        px, _, _, meta = read_raster(f"{D}/nwt_grc/nwt_grc.grc")
        assert meta["driver"] == "NWT_GRC"


class TestAig:
    @pytest.mark.parametrize("cover", ["abc3x1", "ABC3X1UC"])
    def test_abc3x1(self, cover):
        px, gt, nd, meta = decode_aig(f"{D}/aigrid/{cover}")
        assert px.dtype == np.uint8
        assert cs(px) == 3
        assert gt == (-0.5, 1.0, 0.0, 0.5, 0.0, -1.0)
        assert nd == 255

    def test_routing_dir_and_adf(self):
        px, gt, nd, meta = read_raster(f"{D}/aigrid/abc3x1")
        assert cs(px) == 3
        px2, *_ = read_raster(f"{D}/aigrid/abc3x1/prj.adf")
        assert cs(px2) == 3


def test_rmf_4bit():
    # 4-bit palette RSW, plain and LZW: low-nibble-first packing
    # (reference rmf.py: checksum 55221 for both)
    from gdal_ray.codecs.rmf import decode_rmf
    from gdal_ray.core.checksum import checksum
    A = "/root/reference/autotest/gdrivers/data/rmf/"
    for name in ("4bit.rsw", "4bit-lzw.rsw"):
        px, gt, nd, meta = decode_rmf(open(A + name, "rb").read())
        assert checksum(px) == 55221, name
