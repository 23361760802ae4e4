"""HDF4 reader tests: reference-fixture checksum parity
(autotest gcore/hdf4_read.py expectations) plus spec-layout synthetic
files exercising the special-element paths (deflate, linked blocks,
chunked) that the local fixtures don't cover.
"""

import glob
import os
import struct
import zlib

import numpy as np
import pytest

from gdal_ray.codecs.hdf4 import decode_hdf4, list_hdf4
from gdal_ray.core.checksum import checksum

GCORE = "/root/reference/autotest/gcore/data"


@pytest.mark.skipif(not os.path.exists(GCORE), reason="reference absent")
@pytest.mark.parametrize("name,exp", [
    ("byte_2.hdf", 4672), ("byte_3.hdf", 4672),
    ("int16_2.hdf", 4672), ("int16_3.hdf", 4672),
    ("uint16_2.hdf", 4672), ("uint16_3.hdf", 4672),
    ("int32_2.hdf", 4672), ("int32_3.hdf", 4672),
    ("uint32_2.hdf", 4672), ("uint32_3.hdf", 4672),
    ("float32_2.hdf", 4672), ("float32_3.hdf", 4672),
    ("float64_2.hdf", 4672), ("float64_3.hdf", 4672),
    ("utmsmall_2.hdf", 50054), ("utmsmall_3.hdf", 50054),
])
def test_hdf4_reference_checksums(name, exp):
    px, gt, nodata, meta = decode_hdf4(os.path.join(GCORE, name))
    band = px if px.ndim == 2 else px[:, :, 0]
    assert checksum(band) == exp


@pytest.mark.skipif(not os.path.exists(GCORE), reason="reference absent")
def test_hdf4_unlimited_dimension_linked_blocks():
    # SDSUNLIMITED.hdf stores its data as a linked-block special element
    px, *_ = decode_hdf4(os.path.join(GCORE, "SDSUNLIMITED.hdf"))
    assert px.shape == (10, 10)
    assert px.dtype == np.int32


def test_hdf4_multiple_sds():
    p = "/root/reference/autotest/gdrivers/data/hdf4/hdifftst2.hdf"
    if not os.path.exists(p):
        pytest.skip("reference absent")
    names = list_hdf4(p)
    assert names == ["dset1", "dset2", "dset3"]
    px, *_ , meta = decode_hdf4(p, dataset="dset2")
    assert meta["dataset"] == "dset2"


# ----------------------------------------------------- synthetic files

def _build_hdf4(entries):
    """entries: [(tag, ref, payload)] → minimal single-DD-block file."""
    hdr = b"\x0e\x03\x13\x01"
    n = len(entries)
    dd_size = 6 + 12 * n
    off = len(hdr) + dd_size
    dd = struct.pack(">hI", n, 0)
    body = b""
    for tag, ref, payload in entries:
        dd += struct.pack(">HHII", tag, ref, off, len(payload))
        body += payload
        off += len(payload)
    return hdr + dd + body


def _nt(type_code, width):
    return struct.pack(">BBBB", 1, type_code, width, 0)


def _sdd(dims, nt_ref):
    out = struct.pack(">H", len(dims))
    for d in dims:
        out += struct.pack(">i", d)
    for _ in range(len(dims) + 1):
        out += struct.pack(">HH", 106, nt_ref)
    return out


def _ndg(pairs):
    return b"".join(struct.pack(">HH", t, r) for t, r in pairs)


def test_hdf4_synthetic_plain():
    data = np.arange(12, dtype=">i2").reshape(3, 4)
    buf = _build_hdf4([
        (106, 1, _nt(22, 16)),
        (701, 1, _sdd((3, 4), 1)),
        (702, 2, data.tobytes()),
        (720, 2, _ndg([(701, 1), (702, 2)])),
    ])
    px, gt, nd, meta = decode_hdf4(buf)
    assert px.shape == (3, 4)
    np.testing.assert_array_equal(px, data.astype(np.int16))


def test_hdf4_synthetic_deflate():
    data = np.arange(100, dtype=np.uint8).reshape(10, 10)
    comp = zlib.compress(data.tobytes())
    # special comp header: sp(2)=3 version(2) ulen(4) cref(2) model(2)
    # ctype(2)=4 (deflate)
    sp = struct.pack(">HHIHHH", 3, 0, data.nbytes, 9, 0, 4)
    buf = _build_hdf4([
        (106, 1, _nt(21, 8)),
        (701, 1, _sdd((10, 10), 1)),
        (702 | 0x4000, 2, sp),
        (40, 9, comp),
        (720, 2, _ndg([(701, 1), (702, 2)])),
    ])
    px, *_ = decode_hdf4(buf)
    np.testing.assert_array_equal(px, data)


def test_hdf4_synthetic_chunked():
    data = np.arange(36, dtype=np.uint8).reshape(6, 6)
    # two 6x3 chunks stored as plain elements under DFTAG_CHUNK(61)
    c0 = data[:, :3].copy().tobytes()
    c1 = data[:, 3:].copy().tobytes()
    # chunk table Vdata: fields origin(int32 x2), chk_tag u16, chk_ref u16
    vh = (struct.pack(">HIHH", 0, 2, 12, 3) +
          struct.pack(">3H", 24, 24, 23) +          # field types (int32,int32,uint16)
          struct.pack(">3H", 8, 8, 2) +             # isize (order*base)
          struct.pack(">3H", 0, 8, 10) +            # wrong offsets fixed below
          struct.pack(">3H", 2, 2, 1))
    # simpler: one row per chunk with fields f0=origin0, f1=origin1,
    # f2=tag, f3=ref  (4 fields, int32,int32,uint16,uint16)
    vh = (struct.pack(">HIHH", 0, 2, 12, 4) +
          struct.pack(">4H", 24, 24, 23, 23) +
          struct.pack(">4H", 4, 4, 2, 2) +
          struct.pack(">4H", 0, 4, 8, 10) +
          struct.pack(">4H", 1, 1, 1, 1) +
          struct.pack(">H", 2) + b"o0" +
          struct.pack(">H", 2) + b"o1" +
          struct.pack(">H", 2) + b"ct" +
          struct.pack(">H", 2) + b"cr" +
          struct.pack(">H", 12) + b"_HDF_CHK_TBL" +
          struct.pack(">H", 12) + b"_HDF_CHK_TBL" +
          struct.pack(">HHHH", 0, 0, 1, 0))
    rows = (struct.pack(">iiHH", 0, 0, 61, 11) +
            struct.pack(">iiHH", 0, 1, 61, 12))
    # chunked special header per hchunks layout
    sp = struct.pack(">HIBBIIIHHHHI",
                     5, 0, 1, 0, data.nbytes, 18, 1, 1963, 5, 0, 0, 2)
    sp += struct.pack(">III", 0, 6, 6)    # dim0: len 6, chunk 6
    sp += struct.pack(">III", 0, 6, 3)    # dim1: len 6, chunk 3
    sp += struct.pack(">I", 1) + b"\x00"  # fill value
    buf = _build_hdf4([
        (106, 1, _nt(21, 8)),
        (701, 1, _sdd((6, 6), 1)),
        (702 | 0x4000, 2, sp),
        (1962, 5, vh),
        (1963, 5, rows),
        (61, 11, c0),
        (61, 12, c1),
        (720, 2, _ndg([(701, 1), (702, 2)])),
    ])
    px, *_ = decode_hdf4(buf)
    np.testing.assert_array_equal(px, data)


def test_hdf4_dispatcher_magic():
    from gdal_ray.sources.raster import read_raster
    p = os.path.join(GCORE, "byte_2.hdf")
    if not os.path.exists(p):
        pytest.skip("reference absent")
    px, gt, nodata, meta = read_raster(p)
    assert meta["driver"] == "HDF4"
    assert checksum(px) == 4672
