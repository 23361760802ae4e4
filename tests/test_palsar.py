"""JAXA PALSAR reader — synthetic product built from the reference
driver's documented offsets (frmts/jaxapalsar/jaxapalsardataset.cpp)."""

import os
import struct

import numpy as np
import pytest

from gdal_ray.codecs.palsar import identify_palsar, read_palsar


def _vol_header():
    buf = bytearray(360)
    struct.pack_into(">I", buf, 0, 1)
    buf[4] = 192
    buf[5] = 192
    buf[6] = 18
    buf[7] = 18
    struct.pack_into(">I", buf, 8, 360)
    buf[60:62] = b"AL"
    return bytes(buf)


def _img_file(px, level):
    h, w = px.shape
    if level == "1.1":
        data_off, denom, bits, group = 412, 8, 32, 2
    else:
        data_off, denom, bits, group = 192, 2, 16, 1
    rec_len = data_off + w * denom
    head = bytearray(720)
    head[216:220] = f"{bits:4d}".encode()
    head[220:224] = f"{group:4d}".encode()
    head[186:192] = f"{rec_len:6d}".encode()
    head[236:244] = f"{h:8d}".encode()
    out = bytearray(head)
    for y in range(h):
        rec = bytearray(rec_len)
        if level == "1.1":
            inter = np.empty(2 * w, dtype=">f4")
            inter[0::2] = px[y].real
            inter[1::2] = px[y].imag
            rec[data_off:] = inter.tobytes()
        else:
            rec[data_off:] = px[y].astype(">u2").tobytes()
        out += rec
    return bytes(out)


def _led_file(h, w):
    buf = bytearray(720 + 4096 + 2048)
    base = 720 + 4096
    buf[720 + 1174:720 + 1190] = b"4.0             "
    buf[base + 92:base + 108] = b"12.5            "
    buf[base + 108:base + 124] = b"12.5            "
    buf[base + 412:base + 444] = b"UTM-PROJECTION                  "
    corners = [(45.0, 10.0), (45.0, 10.5), (44.5, 10.5), (44.5, 10.0)]
    off = base + 1072
    for lat, lon in corners:
        buf[off:off + 16] = f"{lat:16.7f}".encode()
        buf[off + 16:off + 32] = f"{lon:16.7f}".encode()
        off += 32
    return bytes(buf)


@pytest.fixture()
def product(tmp_path):
    suffix = "-ALPSRP123456789-H1.5GUA"
    vol = str(tmp_path / f"VOL{suffix}")
    open(vol, "wb").write(_vol_header())
    rng = np.random.default_rng(11)
    hh = rng.integers(0, 60000, (9, 14), dtype=np.uint16)
    vv = rng.integers(0, 60000, (9, 14), dtype=np.uint16)
    open(str(tmp_path / f"IMG-HH{suffix}"), "wb").write(
        _img_file(hh, "1.5"))
    open(str(tmp_path / f"IMG-VV{suffix}"), "wb").write(
        _img_file(vv, "1.5"))
    open(str(tmp_path / f"LED{suffix}"), "wb").write(_led_file(9, 14))
    return vol, hh, vv


def test_identify(product, tmp_path):
    vol, _, _ = product
    assert identify_palsar(vol)
    assert not identify_palsar(__file__)
    bad = str(tmp_path / "VOL-OTHER")
    open(bad, "wb").write(_vol_header())
    assert not identify_palsar(bad)  # basename must carry ALPSR


def test_level15_bands_and_metadata(product):
    vol, hh, vv = product
    px, gt, nd, meta = read_palsar(vol)
    assert px.shape == (9, 14, 2) and px.dtype == np.uint16
    assert np.array_equal(px[:, :, 0], hh)
    assert np.array_equal(px[:, :, 1], vv)
    assert meta["polarizations"] == ["HH", "VV"]
    assert meta["PRODUCT_LEVEL"] == "1.5"
    assert meta["AZIMUTH_LOOKS"] == 4.0
    assert meta["PIXEL_SPACING"] == 12.5
    assert meta["PROJECTION_NAME"] == "UTM-PROJECTION"
    # 4 corner GCPs: TL first at (0.5, 0.5) with lat 45 lon 10
    gcps = meta["gcps"]
    assert len(gcps) == 4
    assert gcps[0] == (0.5, 0.5, 10.0, 45.0, 0.0)
    assert gcps[2][2:] == (10.5, 44.5, 0.0)


def test_level11_complex(tmp_path):
    suffix = "-ALPSRP000000000-H1.1__A"
    vol = str(tmp_path / f"VOL{suffix}")
    open(vol, "wb").write(_vol_header())
    rng = np.random.default_rng(2)
    c = (rng.normal(size=(5, 7)) +
         1j * rng.normal(size=(5, 7))).astype(np.complex64)
    open(str(tmp_path / f"IMG-HH{suffix}"), "wb").write(
        _img_file(c, "1.1"))
    px, _, _, meta = read_palsar(vol)
    assert px.dtype == np.complex64
    assert np.allclose(px, c)
    assert meta["PRODUCT_LEVEL"] == "1.1"


def test_dispatch(product):
    from gdal_ray.sources.raster import read_raster
    vol, hh, _ = product
    px, _, _, meta = read_raster(vol)
    assert meta["driver"] == "JAXAPALSAR"
    assert np.array_equal(px[:, :, 0], hh)
