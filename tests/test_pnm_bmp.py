"""PNM + BMP codecs — golden parity with the reference's own autotest
fixtures (gcore/pnm_read.py:20, gcore/bmp_read.py:34-41)."""

import numpy as np
import pytest

from gdal_ray.codecs import decode as codec_decode
from gdal_ray.codecs import encode as codec_encode
from gdal_ray.codecs.bmp import decode_bmp, encode_bmp
from gdal_ray.codecs.pnm import decode_pnm, encode_pnm
from gdal_ray.core.checksum import checksum

DATA = "/root/reference/autotest/gcore/data/"


@pytest.mark.parametrize("name,cs", [("byte.pnm", 4672),
                                     ("uint16.pnm", 4672)])
def test_pnm_golden(name, cs):
    px = decode_pnm(open(DATA + name, "rb").read())
    assert checksum(px) == cs


@pytest.mark.parametrize("name,cs", [
    ("1bit.bmp", 200), ("4bit_pal.bmp", 2587), ("4bit_rle4.bmp", 2587),
    ("8bit_pal.bmp", 4672), ("byte_rle8.bmp", 4672)])
def test_bmp_golden(name, cs):
    px, pal = decode_bmp(open(DATA + name, "rb").read())
    assert checksum(px) == cs
    assert pal is not None          # all fixtures are paletted


def test_pnm_roundtrips():
    g = (np.arange(400, dtype=np.uint8).reshape(20, 20) * 3) % 256
    assert (decode_pnm(encode_pnm(g)) == g).all()
    g16 = (np.arange(400).reshape(20, 20) * 37 % 60000).astype(np.uint16)
    out16 = decode_pnm(encode_pnm(g16))
    assert out16.dtype == np.uint16 and (out16 == g16).all()
    rgb = np.random.default_rng(1).integers(0, 255, (13, 17, 3),
                                            dtype=np.uint8)
    assert (decode_pnm(encode_pnm(rgb)) == rgb).all()
    # ASCII P2/P3 path
    assert (decode_pnm(encode_pnm(g, ascii_format=True)) == g).all()
    assert (decode_pnm(encode_pnm(rgb, ascii_format=True)) == rgb).all()


def test_pnm_comment_and_errors():
    buf = b"P5\n# comment line\n2 2\n255\n\x01\x02\x03\x04"
    assert decode_pnm(buf).tolist() == [[1, 2], [3, 4]]
    with pytest.raises(ValueError):
        decode_pnm(b"P7\n1 1\n255\nx")
    with pytest.raises(ValueError):
        decode_pnm(b"P5\n4 4\n255\n\x00")   # truncated


def test_bmp_roundtrips():
    rgb = np.random.default_rng(2).integers(0, 255, (11, 7, 3),
                                            dtype=np.uint8)
    px, pal = decode_bmp(encode_bmp(rgb))
    assert pal is None and (px == rgb).all()
    g = (np.arange(77, dtype=np.uint8) * 5 % 256).reshape(11, 7)
    px2, pal2 = decode_bmp(encode_bmp(g))
    assert (px2 == g).all()
    assert (pal2[:, 0] == np.arange(256)).all()   # gray identity palette


def test_registry_sniffing_dispatch():
    rgb = np.random.default_rng(3).integers(0, 255, (5, 6, 3),
                                            dtype=np.uint8)
    for fmt in ("bmp", "pnm"):
        buf = codec_encode(rgb, fmt)
        out = codec_decode(buf)          # magic-sniffed, no fmt given
        assert (np.asarray(out) == rgb).all()
