"""MRF reader (codecs/mrf.py) + from-scratch LERC decoders
(codecs/lerc.py) — reference fixtures under autotest gdrivers
data/mrf/*: byte.tif content (checksum 4672) stored with NONE /
DEFLATE / PNG / JPEG / TIF / LERC2 / LERC1 page compressions.
JPEG is lossy so its checksum is build-dependent (autotest itself
lists several); we assert close-not-exact there."""

import numpy as np
import pytest

from gdal_ray.codecs.lerc import decode_lerc
from gdal_ray.codecs.mrf import decode_mrf
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

D = "/root/reference/autotest/gdrivers/data/mrf"


def cs(a):
    return int(checksum(np.asarray(a)))


class TestLerc:
    def test_lerc1(self):
        a = decode_lerc(open(f"{D}/lerc_v1/byte.lrc", "rb").read())
        assert a.shape == (512, 512) and a.dtype == np.float32
        assert cs(a[:20, :20].astype(np.uint8)) == 4672

    def test_lerc2(self):
        a = decode_lerc(open(f"{D}/lerc/byte.lrc", "rb").read())
        assert a.shape == (512, 512) and a.dtype == np.uint8
        assert cs(a[:20, :20]) == 4672

    def test_bad_magic(self):
        with pytest.raises(ValueError):
            decode_lerc(b"garbage data here")


class TestMrf:
    @pytest.mark.parametrize("sub", ["none", "deflate", "png", "tif",
                                     "lerc", "lerc_v1"])
    def test_lossless(self, sub):
        px, gt, nd, meta = decode_mrf(f"{D}/{sub}/byte.mrf")
        assert px.shape == (20, 20)
        assert cs(px) == 4672
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)

    def test_jpeg_lossy(self):
        px, gt, nd, meta = decode_mrf(f"{D}/jpeg/byte.mrf")
        ref, *_ = decode_mrf(f"{D}/none/byte.mrf")
        assert px.shape == (20, 20)
        mse = np.mean((px.astype(float) - ref.astype(float)) ** 2)
        psnr = 10 * np.log10(255.0 ** 2 / mse)
        assert psnr > 30.0          # default-quality JPEG fixture

    def test_routing(self):
        px, gt, nd, meta = read_raster(f"{D}/deflate/byte.mrf")
        assert meta["driver"] == "MRF"
        assert cs(px) == 4672
        assert "NAD27" in meta["crs"]
