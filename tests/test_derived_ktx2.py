"""DERIVED_SUBDATASET pseudo-driver and KTX2 container reader."""

import struct
import zlib

import numpy as np
import pytest

from gdal_ray.codecs.ktx2 import identify_ktx2, read_ktx2
from gdal_ray.sources.raster import read_raster

K = "/root/reference/autotest/gdrivers/data/ktx2"


# ------------------------------------------------------------- derived
def test_derived_amplitude_phase(tmp_path):
    # complex input via a COSAR fixture
    import sys
    sys.path.insert(0, "tests")
    from test_sar_misc import _make_cosar
    buf, i, q = _make_cosar(6, 5)
    p = str(tmp_path / "s.cos")
    open(p, "wb").write(buf)
    amp, _, _, _ = read_raster(f"DERIVED_SUBDATASET:AMPLITUDE:{p}")
    assert amp.dtype == np.float64
    np.testing.assert_allclose(
        amp, np.hypot(i.astype(np.float64), q.astype(np.float64)),
        rtol=1e-6)
    ph, _, _, _ = read_raster(f"DERIVED_SUBDATASET:PHASE:{p}")
    np.testing.assert_allclose(
        ph, np.arctan2(q.astype(np.float64), i.astype(np.float64)),
        rtol=1e-6, atol=1e-12)
    re, _, _, _ = read_raster(f"DERIVED_SUBDATASET:REAL:{p}")
    np.testing.assert_allclose(re, i.astype(np.float64))
    cj, _, _, _ = read_raster(f"DERIVED_SUBDATASET:CONJ:{p}")
    assert cj.dtype == np.complex128
    np.testing.assert_allclose(cj.imag, -q.astype(np.float64))
    inten, _, _, _ = read_raster(f"DERIVED_SUBDATASET:INTENSITY:{p}")
    np.testing.assert_allclose(inten, amp ** 2, rtol=1e-12)


def test_derived_logamplitude_real_input():
    # LOGAMPLITUDE works on real rasters too ("all" in derivedlist.c)
    p = "/root/reference/autotest/gcore/data/byte.tif"
    la, gt, nd, meta = read_raster(f"DERIVED_SUBDATASET:LOGAMPLITUDE:{p}")
    base, *_ = read_raster(p)
    np.testing.assert_allclose(
        la, np.log10(np.maximum(np.abs(base.astype(np.float64)),
                                1e-300)))
    assert gt is not None  # georeferencing carried through


def test_derived_errors():
    with pytest.raises(ValueError, match="unknown derived"):
        read_raster("DERIVED_SUBDATASET:NOPE:/tmp/x.tif")
    with pytest.raises(ValueError, match="malformed"):
        read_raster("DERIVED_SUBDATASET:AMPLITUDE")


# ------------------------------------------------------------- ktx2
def test_ktx2_basis_fixtures_metadata():
    # reference fixtures are BasisLZ/UASTC: metadata-only like the
    # driver-without-transcoder case, sizes exact
    px, _, _, meta = read_ktx2(f"{K}/byte_etc1s.ktx2")
    assert (meta["width"], meta["height"]) == (20, 20)
    assert meta["codec"] == "basislz-etc1s"
    px, _, _, meta = read_ktx2(f"{K}/byte_uastc.ktx2")
    assert (meta["width"], meta["height"]) == (20, 20)
    px, _, _, meta = read_ktx2(f"{K}/two_layers.ktx2")
    assert (meta["width"], meta["height"]) == (162, 150)
    assert meta["layers"] == 2


def _make_ktx2(px, vk_format, scheme=0):
    h, w = px.shape[:2]
    data = px.tobytes()
    stored = zlib.compress(data) if scheme == 3 else data
    kv = b""
    entry = b"KTXwriter\x00gdal_ray-test"
    kv += struct.pack("<I", len(entry)) + entry
    kv += b"\x00" * ((4 - len(entry) % 4) % 4)
    header = _MAGIC = b"\xabKTX 20\xbb\r\n\x1a\n"
    head = struct.pack("<9I", vk_format, 1, w, h, 0, 0, 1, 1, scheme)
    # section index: dfd (empty), kvd, sgd
    kvd_off = 12 + 36 + 16 + 16 + 24  # header + idx + level index
    idx = struct.pack("<4I", 0, 0, kvd_off, len(kv))
    idx += struct.pack("<2Q", 0, 0)
    data_off = kvd_off + len(kv)
    lvl = struct.pack("<3Q", data_off, len(stored), len(data))
    return header + head + idx + lvl + kv + stored


def test_ktx2_raw_rgba_roundtrip(tmp_path):
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (9, 13, 4), dtype=np.uint8)
    buf = _make_ktx2(img, 37)  # VK_FORMAT_R8G8B8A8_UNORM
    assert identify_ktx2(buf)
    px, _, _, meta = read_ktx2(buf)
    assert np.array_equal(px, img)
    assert meta["KTXwriter"] == "gdal_ray-test"
    # zlib supercompression
    buf = _make_ktx2(img, 37, scheme=3)
    px, _, _, _ = read_ktx2(buf)
    assert np.array_equal(px, img)
    # gray R8
    g = rng.integers(0, 256, (5, 6), dtype=np.uint8)
    px, _, _, _ = read_ktx2(_make_ktx2(g, 9))
    assert np.array_equal(px, g)
    # dispatch by magic
    p = str(tmp_path / "t.ktx2")
    open(p, "wb").write(_make_ktx2(img, 37))
    px, _, _, meta = read_raster(p)
    assert meta["driver"] == "KTX2" and np.array_equal(px, img)
