"""Baseline JPEG codec (T.81) — roundtrip PSNR + cross-decode of the
reference's libjpeg-produced fixtures.

Bit-exact IDCT parity is not defined by the standard (the reference's
own suite accepts per-libjpeg-version checksums,
autotest/gdrivers/jpeg.py:43-47), so the conformance bars here are the
BASELINE.json lossy invariant (PSNR ≥ 40 dB roundtrip) and decoding
independently-encoded files to within their own compression loss."""

import os

import numpy as np
import pytest

from gdal_ray.codecs import jpeg
from gdal_ray.codecs.dct import psnr

_JDATA = "/root/reference/autotest/gdrivers/data/jpeg"


def _smooth_rgb(n=256):
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    return np.stack([((x + y) // 2) % 256, x % 256, y % 256],
                    axis=2).astype(np.uint8)


class TestRoundtrip:
    def test_rgb_psnr(self):
        img = _smooth_rgb()
        out = jpeg.decode(jpeg.encode(img, quality=90))
        assert out.shape == img.shape
        assert psnr(img, out) >= 40.0

    def test_gray_psnr(self):
        x, y = np.meshgrid(np.arange(128), np.arange(128))
        g = ((x + 2 * y) % 256).astype(np.uint8)
        out = jpeg.decode(jpeg.encode(g, quality=92))
        assert out.shape == (128, 128, 1)
        assert psnr(g[:, :, None], out) >= 40.0

    def test_non_multiple_of_8_dims(self):
        img = _smooth_rgb(100)[:93, :87]
        out = jpeg.decode(jpeg.encode(img, quality=90))
        assert out.shape == (93, 87, 3)
        assert psnr(img, out) >= 38.0

    def test_quality_ladder_monotone(self):
        img = _smooth_rgb(64)
        sizes = [len(jpeg.encode(img, quality=q)) for q in (30, 60, 90)]
        assert sizes[0] < sizes[1] < sizes[2]

    def test_codec_registry_dispatch(self):
        from gdal_ray.codecs import decode
        img = _smooth_rgb(64)
        buf = jpeg.encode(img, quality=90)
        out = decode(buf, "jpeg")       # FFD8 magic → real decoder
        assert psnr(img, out) >= 40.0
        out2 = decode(buf)              # sniffed
        assert np.array_equal(out, out2)

    def test_bad_input_raises(self):
        with pytest.raises(ValueError):
            jpeg.decode(b"not a jpeg at all")


@pytest.mark.skipif(not os.path.isdir(_JDATA),
                    reason="reference fixtures not present")
class TestReferenceFixtures:
    def test_albania_420(self):
        # 4:2:0 chroma-subsampled libjpeg file
        o = jpeg.decode(open(f"{_JDATA}/albania.jpg", "rb").read())
        assert o.shape == (260, 361, 3)

    def test_byte_with_xmp_vs_lossless_twin(self):
        """byte_with_xmp.jpg is byte.tif's content through libjpeg —
        decoding it must land within the file's own compression loss of
        the lossless source (a broken entropy decoder or IDCT lands at
        ~10 dB; compression loss alone is ~29 dB)."""
        from gdal_ray.codecs.gtiff import decode_gtiff
        ref = decode_gtiff(open(
            "/root/reference/autotest/gcore/data/byte.tif", "rb").read()).pixels
        j = jpeg.decode(open(f"{_JDATA}/byte_with_xmp.jpg", "rb").read())
        assert j.shape == (20, 20, 1)
        assert psnr(ref[:, :, None], j) >= 25.0
        assert abs(float(ref.mean()) - float(j.mean())) < 1.0

    def test_progressive_rejected_cleanly(self):
        # progressive SOF2 files must fail fast with a clear error
        import glob
        for f in glob.glob(f"{_JDATA}/*.jpg")[:40]:
            try:
                jpeg.decode(open(f, "rb").read())
            except ValueError:
                pass  # unsupported variants raise, never hang/garbage
