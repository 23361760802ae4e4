"""WebP codec: container parity with the reference autotest fixtures
(frmts/webp/webpdataset.cpp driver, autotest/gdrivers/webp.py), VP8L
lossless bitstream roundtrip (literal subset), failing-fast plug point
for lossy VP8."""

import os

import numpy as np
import pytest

from gdal_ray.codecs.webp import (decode_webp, decode_webp_lossless,
                                  encode_webp_lossless, sniff_webp,
                                  webp_info)

FIX = "/root/reference/autotest/gdrivers/data/webp"


@pytest.mark.skipif(not os.path.isdir(FIX), reason="reference absent")
class TestContainerParity:
    def test_lossy_fixture_info(self):
        buf = open(f"{FIX}/rgbsmall.webp", "rb").read()
        assert sniff_webp(buf)
        i = webp_info(buf)
        # gdrivers/webp.py test_webp_2 opens this as a 50x50 RGB raster
        assert (i.width, i.height) == (50, 50)
        assert i.flavor == "lossy" and not i.has_alpha and not i.has_xmp

    def test_vp8x_fixture_with_metadata(self):
        buf = open(f"{FIX}/rgbsmall_with_xmp.webp", "rb").read()
        i = webp_info(buf)
        assert (i.width, i.height) == (50, 50)
        assert i.flavor == "extended"
        assert i.has_xmp            # legacy META chunk carries the XMP

    def test_lossy_decode_raises_plug_point(self):
        buf = open(f"{FIX}/rgbsmall.webp", "rb").read()
        with pytest.raises(NotImplementedError, match="libwebp"):
            decode_webp(buf)


class TestLosslessRoundtrip:
    def test_rgb_noise(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (37, 23, 3), np.uint8)
        back = decode_webp_lossless(encode_webp_lossless(img))
        assert back.shape == (37, 23, 4)
        assert (back[:, :, :3] == img).all()
        assert (back[:, :, 3] == 255).all()

    def test_rgba_and_single_symbol_channels(self):
        img = np.zeros((9, 9, 4), np.uint8)
        img[:, :, 1] = 77
        img[:, :, 3] = 200
        back = decode_webp_lossless(encode_webp_lossless(img))
        assert (back == img).all()

    def test_gradient_tile(self):
        g = (np.add.outer(np.arange(64), np.arange(64)) % 256).astype(np.uint8)
        img = np.stack([g, g.T, 255 - g], axis=-1)
        back = decode_webp_lossless(encode_webp_lossless(img))
        assert (back[:, :, :3] == img).all()

    def test_grayscale_promotes(self):
        g = (np.arange(100, dtype=np.uint8).reshape(10, 10))
        back = decode_webp_lossless(encode_webp_lossless(g))
        assert (back[:, :, 0] == g).all() and (back[:, :, 1] == g).all()

    def test_riff_layout_is_spec_conformant(self):
        import struct
        buf = encode_webp_lossless(np.zeros((5, 7, 3), np.uint8))
        assert buf[:4] == b"RIFF" and buf[8:12] == b"WEBP"
        assert buf[12:16] == b"VP8L"
        (riff_size,) = struct.unpack_from("<I", buf, 4)
        assert 8 + riff_size == len(buf)
        assert buf[20] == 0x2F                     # VP8L signature
        i = webp_info(buf)
        assert (i.width, i.height, i.flavor) == (7, 5, "lossless")

    def test_codec_registry_dispatch(self):
        from gdal_ray.codecs import decode, encode
        img = np.full((6, 6, 3), 42, np.uint8)
        buf = encode(img, "webp")
        assert (decode(buf)[:, :, :3] == img).all()     # magic sniff
        assert (decode(buf, "webp")[:, :, :3] == img).all()
