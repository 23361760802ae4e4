"""COSAR, GFF and OziExplorer .map readers — synthetic fixtures
built from the reference drivers' documented layouts
(frmts/cosar/cosar_dataset.cpp, frmts/gff/gff_dataset.cpp,
gcore/gdal_misc.cpp GDALLoadOziMapFile)."""

import os
import struct

import numpy as np
import pytest

from gdal_ray.codecs.cosar import decode_cosar
from gdal_ray.codecs.gff import decode_gff
from gdal_ray.sources.ozimap import read_ozi_map
from gdal_ray.sources.raster import read_raster


def _make_cosar(w, h, version=1, rsfv=None, rslv=None):
    rtnb = 8 + 4 * w
    rng = np.random.default_rng(1)
    i = rng.integers(-1000, 1000, (h, w), dtype=np.int16)
    q = rng.integers(-1000, 1000, (h, w), dtype=np.int16)
    buf = bytearray(rtnb * (h + 4))
    struct.pack_into(">i", buf, 8, w)
    struct.pack_into(">i", buf, 12, h)
    struct.pack_into(">I", buf, 20, rtnb)
    buf[28:32] = b"CSAR"
    struct.pack_into(">I", buf, 32, version)
    for y in range(h):
        off = rtnb * (y + 4)
        struct.pack_into(">II", buf, off, rsfv or 1, rslv or w)
        inter = np.empty(2 * w, dtype=">i2")
        inter[0::2] = i[y]
        inter[1::2] = q[y]
        buf[off + 8:off + 8 + 4 * w] = inter.tobytes()
    return bytes(buf), i, q


def test_cosar_cint16():
    buf, i, q = _make_cosar(17, 9)
    px, gt, nd, meta = decode_cosar(buf)
    assert px.shape == (9, 17) and px.dtype == np.complex64
    assert np.array_equal(px.real, i.astype(np.float32))
    assert np.array_equal(px.imag, q.astype(np.float32))
    assert meta["dtype"] == "CInt16" and meta["version"] == 1


def test_cosar_validity_window():
    # samples outside [RSFV, RSLV] zero-fill (cosar_dataset.cpp:100-130)
    buf, i, q = _make_cosar(10, 4, rsfv=3, rslv=7)
    px, _, _, _ = decode_cosar(buf)
    assert np.all(px[:, :2] == 0) and np.all(px[:, 7:] == 0)
    assert np.array_equal(px.real[:, 2:7], i[:, 2:7].astype(np.float32))


def test_cosar_cossc_halffloat():
    w = h = 5
    rtnb = 8 + 4 * w
    vals = (np.arange(h * w * 2, dtype=np.float16)
            .reshape(h, w, 2) / 8)
    buf = bytearray(rtnb * (h + 4))
    struct.pack_into(">i", buf, 8, w)
    struct.pack_into(">i", buf, 12, h)
    struct.pack_into(">I", buf, 20, rtnb)
    buf[28:32] = b"CSAR"
    struct.pack_into(">I", buf, 32, 2)
    for y in range(h):
        off = rtnb * (y + 4)
        struct.pack_into(">II", buf, off, 1, w)
        buf[off + 8:off + 8 + 4 * w] = \
            vals[y].reshape(-1).view(np.uint16).astype(">u2").tobytes()
    px, _, _, meta = decode_cosar(bytes(buf))
    assert meta["dtype"] == "CFloat32"
    assert np.allclose(px.real, vals[:, :, 0].astype(np.float32))
    assert np.allclose(px.imag, vals[:, :, 1].astype(np.float32))


def _make_gff(image_type, w, h, bpp=4, row_major=1):
    header_len = 2048
    buf = bytearray(header_len)
    buf[0:7] = b"GSATIMG"
    struct.pack_into("<HHI", buf, 8, 2, 1, header_len)
    struct.pack_into("<H", buf, 54, 0)
    div = 1 if image_type == 0 else 2
    rg = w * div if row_major else h
    az = h if row_major else w * div
    struct.pack_into("<6I", buf, 56, bpp, 1, image_type, row_major,
                     rg, az)
    return buf


def test_gff_uint8():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (11, 13), dtype=np.uint8)
    buf = _make_gff(0, 13, 11) + img.tobytes()
    px, _, _, meta = decode_gff(bytes(buf))
    assert np.array_equal(px, img)
    assert meta["version"] == "1.2"


def test_gff_cint16():
    rng = np.random.default_rng(3)
    arr = rng.integers(-500, 500, (7, 9, 2), dtype=np.int16)
    buf = _make_gff(1, 9, 7, bpp=4) + \
        arr.astype("<i2").tobytes()
    px, _, _, _ = decode_gff(bytes(buf))
    assert px.dtype == np.complex64 and px.shape == (7, 9)
    assert np.array_equal(px.real, arr[:, :, 0].astype(np.float32))


def test_gff_cfloat32():
    rng = np.random.default_rng(4)
    arr = rng.normal(size=(5, 6, 2)).astype(np.float32)
    buf = _make_gff(2, 6, 5, bpp=8) + arr.astype("<f4").tobytes()
    px, _, _, _ = decode_gff(bytes(buf))
    assert np.allclose(px.real, arr[:, :, 0])
    assert np.allclose(px.imag, arr[:, :, 1])


def test_dispatch_by_magic(tmp_path):
    buf, i, q = _make_cosar(4, 3)
    p = str(tmp_path / "scene.cos")
    open(p, "wb").write(buf)
    px, _, _, meta = read_raster(p)
    assert meta["driver"] == "COSAR"
    img = np.zeros((2, 2), dtype=np.uint8)
    g = _make_gff(0, 2, 2) + img.tobytes()
    p2 = str(tmp_path / "scene.gff")
    open(p2, "wb").write(bytes(g))
    px, _, _, meta = read_raster(p2)
    assert meta["driver"] == "GFF"


# ---------------------------------------------------------------- Ozi map
def _write_map(tmp_path, proj_lines, points, image="img.png"):
    from gdal_ray.codecs.png import encode
    img = (np.arange(40 * 30, dtype=np.uint32) % 256).astype(
        np.uint8).reshape(30, 40)
    open(os.path.join(tmp_path, image), "wb").write(encode(img))
    lines = ["OziExplorer Map Data File Version 2.2", "test",
             image, "1 ,Map Code,"] + proj_lines + points
    p = os.path.join(tmp_path, "test.map")
    open(p, "w").write("\n".join(lines) + "\n")
    return p, img


def test_ozi_map_latlon_affine(tmp_path):
    # three lat/lon points on an exact affine grid -> geotransform
    pts = []
    for k, (x, y, lon, lat) in enumerate([
            (0, 0, 10.0, 50.0), (40, 0, 10.4, 50.0),
            (0, 30, 10.0, 49.7)], start=1):
        latd, latm = int(abs(lat)), (abs(lat) % 1) * 60
        lond, lonm = int(abs(lon)), (abs(lon) % 1) * 60
        pts.append(
            f"Point{k:02d},xy, {x}, {y},in, deg, {latd},{latm:.4f},N,"
            f" {lond},{lonm:.4f},E, grid, , , ,N")
    p, img = _write_map(str(tmp_path),
                        ["Map Projection,Latitude/Longitude"], pts)
    px, gt, nd, meta = read_ozi_map(p)
    assert np.array_equal(px if px.ndim == 2 else px[..., 0], img)
    assert gt == pytest.approx((10.0, 0.01, 0.0, 50.0, 0.0, -0.01))
    assert meta["crs"].startswith("+proj=longlat")
    # dispatch through read_raster
    px2, gt2, _, _ = read_raster(p)
    assert gt2 == pytest.approx(gt)


def test_ozi_map_cartesian_and_msf(tmp_path):
    pts = ["MSF,2.0"]
    for k, (x, y, e, n) in enumerate([
            (0, 0, 500000.0, 6000000.0), (80, 0, 500400.0, 6000000.0),
            (0, 60, 500000.0, 5999700.0)], start=1):
        pts.append(
            f"Point{k:02d},xy, {x}, {y},in, deg, , , , , , , grid, 32,"
            f" {e}, {n},N")
    p, img = _write_map(str(tmp_path),
                        ["Map Projection,(UTM) Universal Transverse"
                         " Mercator"], pts)
    px, gt, nd, meta = read_ozi_map(p)
    # MSF halves the pixel coordinates: 80/2=40 px spans 400 m
    assert gt == pytest.approx((500000.0, 10.0, 0.0,
                                6000000.0, 0.0, -10.0), abs=1e-6)
    assert "+proj=utm +zone=32" in meta["crs"]


def test_ozi_map_mercator_projected_points(tmp_path):
    # geographic points under Mercator: projected before the fit
    from gdal_ray.core.srs import crs_from
    crs = crs_from("+proj=merc +lat_ts=0 +lon_0=0 +ellps=WGS84")
    lons = [10.0, 10.4, 10.0]
    lats = [50.0, 50.0, 49.8]
    xs, ys = crs.proj.forward(np.array(lons), np.array(lats))
    pts = []
    pxy = [(0, 0), (40, 0), (0, 30)]
    for k, ((x, y), lon, lat) in enumerate(zip(pxy, lons, lats),
                                           start=1):
        latd, latm = int(lat), (lat % 1) * 60
        lond, lonm = int(lon), (lon % 1) * 60
        pts.append(
            f"Point{k:02d},xy, {x}, {y},in, deg, {latd},{latm:.6f},N,"
            f" {lond},{lonm:.6f},E, grid, , , ,N")
    p, img = _write_map(str(tmp_path), ["Map Projection,Mercator",
                                        "Projection Setup,0,0,1,0,0"],
                        pts)
    px, gt, nd, meta = read_ozi_map(p)
    assert gt is not None
    assert gt[0] == pytest.approx(float(xs[0]), abs=1e-6)
    assert gt[3] == pytest.approx(float(ys[0]), abs=1e-6)
    assert gt[1] == pytest.approx(float(xs[1] - xs[0]) / 40, rel=1e-9)
