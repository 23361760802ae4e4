"""GIF codec — golden parity with the reference's own fixtures
(autotest/gdrivers/gif.py)."""

import numpy as np
import pytest

from gdal_ray.codecs.gif import decode_gif, encode_gif
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/gif/"


def test_bug407_golden():
    idx, pal, tr = decode_gif(open(D + "bug407.gif", "rb").read())
    assert idx.shape == (400, 400)
    assert checksum(idx) == 57921           # gif.py:48
    assert pal.shape == (16, 3)


def test_byte_with_xmp_golden():
    # byte.tif's content through giflib
    idx, _, _ = decode_gif(open(D + "byte_with_xmp.gif", "rb").read())
    assert idx.shape == (20, 20)
    assert checksum(idx) == 4672


def test_roundtrip_with_dict_reset():
    rng = np.random.default_rng(8)
    a = rng.integers(0, 17, (33, 29)).astype(np.uint8)
    pal = rng.integers(0, 256, (17, 3)).astype(np.uint8)
    b, p, t = decode_gif(encode_gif(a, pal, transparent=3))
    assert np.array_equal(a, b)
    assert np.array_equal(p[:17], pal)
    assert t == 3
    # 256-color noise forces 12-bit codes + LZW CLEAR resets
    big = rng.integers(0, 250, (200, 300)).astype(np.uint8)
    palb = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    bb, _, _ = decode_gif(encode_gif(big, palb))
    assert np.array_equal(big, bb)


def test_registry_sniffer():
    from gdal_ray.codecs import decode as registry_decode
    rng = np.random.default_rng(10)
    a = rng.integers(0, 4, (8, 8)).astype(np.uint8)
    buf = encode_gif(a, np.zeros((4, 3), np.uint8))
    assert np.array_equal(registry_decode(buf), a)


def test_bad_input():
    with pytest.raises(ValueError):
        decode_gif(b"NOPE" + b"\x00" * 20)
