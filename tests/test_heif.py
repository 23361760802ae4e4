"""HEIF/AVIF container reader parity against the reference autotest
expectations (autotest/gdrivers/heif.py, fixtures in
autotest/gdrivers/data/heif/)."""

import struct

import numpy as np
import pytest

from gdal_ray.codecs.heif import identify_heif, read_heif, parse_exif
from gdal_ray.sources.raster import read_raster

D = "/root/reference/autotest/gdrivers/data/heif"


# test_identify_various table from the reference autotest
@pytest.mark.parametrize("major,compat,expect", [
    ("heic", [], True),
    ("heix", [], True),
    ("j2ki", [], True),
    ("j2ki", ["j2ki"], True),
    ("jpeg", [], True),
    ("jpg ", [], False),
    ("miaf", [], True),
    ("mif1", [], True),
    ("mif2", [], True),
    ("mif9", [], False),
    ("fake", ["miaf"], True),
    ("j2kj", [], False),
    ("fake", [], False),
    ("fake", ["fake", "also"], False),
    ("fake", ["fake", "avif"], True),
    ("fake", ["fake", "bvif"], False),
    ("fake", ["fake", "mif2"], True),
    ("fake", ["fake", "mif9"], False),
])
def test_identify_various(major, compat, expect):
    body = b"ftyp" + major.encode() + b"\x00" * 4 + \
        b"".join(b.encode() for b in compat)
    header = struct.pack(">I", 4 + len(body)) + body
    assert identify_heif(header) is expect


def test_identify_no_match():
    tif = open("/root/reference/autotest/gcore/data/byte.tif",
               "rb").read(64)
    assert identify_heif(tif) is False


def test_uncompressed_tiled():
    # test_heif_tiled: 30x20x3 uint8, 15x5 tiles, exact row values
    px, gt, nodata, meta = read_heif(
        f"{D}/uncompressed_comp_RGB_tiled.heif")
    assert px.shape == (20, 30, 3) and px.dtype == np.uint8
    assert px[0, :, 0].tolist() == [
        255, 255, 255, 255, 0, 0, 0, 0, 0, 0, 0, 0, 255, 255, 255,
        255, 0, 0, 0, 0, 255, 255, 255, 255, 0, 0, 0, 0, 128, 128]
    assert px[19, :, 0].tolist() == [
        0, 0, 0, 0, 255, 255, 255, 255, 0, 0, 0, 0, 128, 128, 128,
        128, 255, 255, 255, 255, 238, 238, 238, 238, 255, 255, 255,
        255, 0, 0]
    assert px[0, :, 1].tolist() == [
        0, 0, 0, 0, 128, 128, 128, 128, 0, 0, 0, 0, 255, 255, 255,
        255, 0, 0, 0, 0, 255, 255, 255, 255, 255, 255, 255, 255,
        128, 128]
    assert px[19, :, 1].tolist() == [
        0, 0, 0, 0, 255, 255, 255, 255, 255, 255, 255, 255, 128,
        128, 128, 128, 165, 165, 165, 165, 130, 130, 130, 130, 0, 0,
        0, 0, 128, 128]
    assert px[0, :, 2].tolist() == [
        0, 0, 0, 0, 0, 0, 0, 0, 255, 255, 255, 255, 255, 255, 255,
        255, 0, 0, 0, 0, 0, 0, 0, 0, 255, 255, 255, 255, 128, 128]
    assert px[19, :, 2].tolist() == [
        0, 0, 0, 0, 0, 0, 0, 0, 255, 255, 255, 255, 128, 128, 128,
        128, 0, 0, 0, 0, 238, 238, 238, 238, 0, 0, 0, 0, 0, 0]


@pytest.mark.parametrize("name,crs_check", [
    ("geo_wkt2.heif", lambda c: c.startswith('PROJCRS["GDA94')),
    ("geo_crsu.heif", lambda c: c == "EPSG:32755"),
    ("geo_curi.heif", lambda c: c == "EPSG:32755"),
])
def test_geoheif(name, crs_check):
    # test_heif_geoheif_{wkt2,uri,curie} expectations
    px, gt, nodata, meta = read_heif(f"{D}/{name}")
    assert meta["width"] == 256 and meta["height"] == 64
    assert meta["bands"] == 3
    assert gt == pytest.approx(
        [691051.2, 0.1, 0.0, 6090000.0, 0.0, -0.1])
    assert crs_check(meta["crs"])
    desc = meta["DESCRIPTION_en-AU"]
    assert desc["NAME"] == "Copyright Statement"
    assert desc["DESCRIPTION"] == ('CCBY "Jacobs Group (Australia) '
                                   'Pty Ltd and Australian Capital '
                                   'Territory"')
    assert desc["TAGS"] == "copyright"
    (col, line, x, y, z), = meta["gcps"]
    assert (col, line, z) == (0.0, 0.0, 0.0)
    assert x == pytest.approx(691051.2) and y == pytest.approx(6090000.0)


@pytest.mark.parametrize("endianness", ["big_endian", "little_endian"])
def test_exif(endianness):
    # test_heif_exif_endian: sizes + EXIF/XMP presence (pixels are
    # HEVC-coded; the reference decodes them via libheif, we expose
    # metadata-only with the codec named)
    px, gt, nodata, meta = read_heif(f"{D}/byte_exif_{endianness}.heic")
    assert meta["width"] == 64 and meta["height"] == 64
    assert meta["codec"] == "hevc"
    assert len(meta["EXIF"]) > 0
    assert "xpacket" in meta["xml:XMP"]


def test_thumbnail_as_overview():
    # test_heif_thumbnail: 128x128 with one 64x64 overview
    px, gt, nodata, meta = read_heif(f"{D}/byte_thumbnail.heic")
    assert meta["width"] == 128 and meta["height"] == 128
    assert meta["overviews"] == [(64, 64)]


def test_subdatasets():
    # test_heif_subdatasets: 2 subdatasets, sizes 64 and 162
    px, gt, nodata, meta = read_heif(f"{D}/subdatasets.heic")
    assert px.size == 0
    sds = meta["subdatasets"]
    assert sds["SUBDATASET_1_NAME"] == f"HEIF:1:{D}/subdatasets.heic"
    assert sds["SUBDATASET_2_NAME"] == f"HEIF:2:{D}/subdatasets.heic"
    _, _, _, m1 = read_raster(f"HEIF:1:{D}/subdatasets.heic")
    assert m1["width"] == 64
    _, _, _, m2 = read_raster(f"HEIF:2:{D}/subdatasets.heic")
    assert m2["width"] == 162
    with pytest.raises(ValueError):
        read_heif(f"{D}/subdatasets.heic", subdataset=0)
    with pytest.raises(ValueError):
        read_heif(f"{D}/subdatasets.heic", subdataset=3)
    with pytest.raises(Exception):
        read_raster("HEIF:1:non_existing.heic")
    with pytest.raises(ValueError):
        read_raster("HEIF:1")


def test_avif_geo():
    # geo_small.avif carries the same geoheif boxes over av01 payload
    px, gt, nodata, meta = read_heif(f"{D}/geo_small.avif")
    assert meta["codec"] == "av1"
    assert gt == pytest.approx(
        [691000.0, 0.1, 0.0, 6090000.0, 0.0, -0.1])
    assert meta["crs"].startswith("PROJCRS")


def test_avif_byte_dispatch():
    px, gt, nodata, meta = read_raster(
        "/root/reference/autotest/gdrivers/data/avif/byte.avif")
    assert meta["width"] == 20 and meta["height"] == 20
    assert meta["codec"] == "av1"


def test_parse_exif_both_endians():
    for e, fmt in ((b"II", "<"), (b"MM", ">")):
        ifd = struct.pack(fmt + "H", 1) + \
            struct.pack(fmt + "HHI", 0x0110, 2, 4) + b"abc\x00" + \
            struct.pack(fmt + "I", 0)
        blob = e + struct.pack(fmt + "H", 42) + \
            struct.pack(fmt + "I", 8) + ifd
        assert parse_exif(blob) == {"EXIF_Model": "abc"}


@pytest.mark.parametrize("shape", [(25, 31), (20, 20, 3), (10, 12, 4)])
def test_write_heif_roundtrip(shape, tmp_path):
    from gdal_ray.codecs.heif import write_heif
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    p = str(tmp_path / "t.heif")
    gt = (100.0, 0.5, 0.0, 200.0, 0.0, -0.5)
    write_heif(p, img, geotransform=gt, crs="EPSG:3857")
    px, rgt, nd, meta = read_heif(p)
    want = img[:, :, None] if img.ndim == 2 else img
    assert np.array_equal(px, want)
    assert rgt == gt
    assert meta["crs"] == "EPSG:3857"
    assert identify_heif(open(p, "rb").read(64))


def test_write_heif_wkt2_crs(tmp_path):
    from gdal_ray.codecs.heif import write_heif
    img = np.zeros((4, 4), dtype=np.uint8)
    p = str(tmp_path / "t.heif")
    wkt = 'PROJCRS["x",BASEGEOGCRS["y"]]'
    write_heif(p, img, crs=wkt)
    _, _, _, meta = read_heif(p)
    assert meta["crs"] == wkt
