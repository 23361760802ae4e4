"""TGA + DDS codecs — reference-fixture goldens from
autotest/gdrivers/tga.py (ref_test_suite checksums + extension-area
metadata) and autotest/gdrivers/dds.py (uncompressed fixture's band
checksums equal the stefan_full_rgba.tif source's)."""

import numpy as np
import pytest

from gdal_ray.codecs.dds import decode_dds, encode_dds
from gdal_ray.codecs.tga import decode_tga
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data"


def cs(a):
    return int(checksum(np.asarray(a, np.float64)))


def _tga(name):
    return decode_tga(open(f"{D}/tga/ref_test_suite/{name}", "rb").read())


class TestTga:
    def test_rle_grey(self):
        px, gt, nd, meta = _tga("cbw8.tga")
        assert px.shape == (128, 128)
        assert meta["AUTHOR_NAME"] == "Ricky True"
        assert meta["COMMENTS"] == \
            "Sample 8 bit run length compressed black and white image"
        assert meta["IMAGE_ID"] == "Truevision(R) Sample Image"
        assert "palette" not in meta
        assert cs(px) == 43089

    def test_rle_color_table(self):
        px, gt, nd, meta = _tga("ccm8.tga")
        pal = meta["palette"]
        assert len(pal) == 256
        assert tuple(pal[0]) == (0, 0, 0, 255)
        assert tuple(pal[1]) == (8, 8, 8, 255)
        assert tuple(pal[64]) == (248, 0, 0, 255)
        assert cs(px) == 38151

    def test_rle_24bit(self):
        px, gt, nd, meta = _tga("ctc24.tga")
        assert px.shape == (128, 128, 3)
        assert [cs(px[:, :, i]) for i in range(3)] == [9797, 9952, 9848]

    def test_uncompressed_grey(self):
        px, _, _, meta = _tga("ubw8.tga")
        assert cs(px) == 43089

    def test_uncompressed_color_table(self):
        px, _, _, meta = _tga("ucm8.tga")
        assert tuple(meta["palette"][64]) == (248, 0, 0, 255)
        assert cs(px) == 38151

    def test_uncompressed_16bit(self):
        px, _, _, _ = _tga("utc16.tga")
        assert px.shape == (128, 128, 3)
        assert [cs(px[:, :, i]) for i in range(3)] == [64747, 64839, 64796]

    def test_uncompressed_24bit(self):
        px, _, _, _ = _tga("utc24.tga")
        assert [cs(px[:, :, i]) for i in range(3)] == [9797, 9952, 9848]

    def test_uncompressed_32bit(self):
        px, _, _, meta = _tga("utc32.tga")
        # autotest: 4 bands, band 4 undefined (attr type 2) with cs 0
        assert px.shape[2] == 4
        assert meta["fourth_is_alpha"] is False
        assert [cs(px[:, :, i]) for i in range(4)] == [9797, 9952, 9848, 0]

    def test_uncompressed_32bit_alpha(self):
        px, _, _, meta = decode_tga(
            open(f"{D}/tga/stefan_full_rgba.tga", "rb").read())
        assert px.shape == (150, 162, 4)
        assert meta.get("fourth_is_alpha", True) is True
        assert [cs(px[:, :, i]) for i in range(4)] == \
            [12603, 58561, 36064, 10807]

    def test_rle_runs_crossing_scanlines(self):
        px, _, _, _ = decode_tga(open(
            f"{D}/tga/from_ffmpeg_samples/test1g.tga", "rb").read())
        assert cs(px) == 13077

    def test_read_raster_routing(self):
        from gdal_ray.sources.raster import read_raster
        px, gt, nd, meta = read_raster(
            f"{D}/tga/ref_test_suite/cbw8.tga")
        assert cs(px) == 43089


class TestDds:
    def test_uncompressed_matches_tiff_source(self):
        # autotest dds.py test_dds_no_compression: fixture checksums ==
        # stefan_full_rgba.tif band checksums
        from gdal_ray.codecs.gtiff import decode_gtiff
        ref = decode_gtiff(open(
            "/root/reference/autotest/gcore/data/stefan_full_rgba.tif",
            "rb").read()).pixels
        px, _, _, meta = decode_dds(open(
            f"{D}/dds/stefan_full_rgba_no_compression.dds", "rb").read())
        assert meta["compression"] == "NONE"
        assert px.shape == ref.shape
        for b in range(4):
            assert cs(px[:, :, b]) == cs(ref[:, :, b])
        assert (px == ref).all()

    def test_encode_roundtrip(self):
        rng = np.random.default_rng(42)
        img = rng.integers(0, 256, (37, 53, 4), dtype=np.uint8)
        px, _, _, _ = decode_dds(encode_dds(img))
        assert (px == img).all()
        img3 = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        px3, _, _, _ = decode_dds(encode_dds(img3))
        assert (px3[:, :, :3] == img3).all()

    def test_dxt1_block_decode(self):
        # one 4x4 block: c0=white(0xFFFF) > c1=black(0x0000),
        # selectors = 0,1,2,3 per row
        import struct
        sel = 0b00000000_01010101_10101010_11111111
        block = struct.pack("<HHI", 0xFFFF, 0x0000, sel)
        hdr = struct.pack("<4s31I", b"DDS ", 124, 0x1007, 4, 4, 8, 0, 1,
                          *([0] * 11), 32, 0x4,
                          int.from_bytes(b"DXT1", "little"), 0, 0, 0, 0, 0,
                          0x1000, 0, 0, 0, 0)
        px, _, _, meta = decode_dds(hdr + block)
        assert meta["compression"] == "DXT1"
        # row 0 all selector 3 -> 1/3 white; row 3 selector 0 -> white
        assert (px[3] == [255, 255, 255]).all()
        assert (px[0] == [85, 85, 85]).all()       # (255+2*0)//3... c2/c3
        assert (px[1] == [170, 170, 170]).all()
        assert (px[2] == [0, 0, 0]).all()

    def test_dxt5_alpha_decode(self):
        import struct
        # alpha block: a0=255 > a1=0, selectors all 0 -> alpha 255
        ab = struct.pack("<BB6s", 255, 0, b"\x00" * 6)
        sel = 0
        cb = struct.pack("<HHI", 0xF800, 0x001F, sel)  # red/blue endpoints
        hdr = struct.pack("<4s31I", b"DDS ", 124, 0x1007, 4, 4, 16, 0, 1,
                          *([0] * 11), 32, 0x4,
                          int.from_bytes(b"DXT5", "little"), 0, 0, 0, 0, 0,
                          0x1000, 0, 0, 0, 0)
        px, _, _, _ = decode_dds(hdr + ab + cb)
        assert px.shape == (4, 4, 4)
        assert (px[:, :, 3] == 255).all()
        assert (px[:, :, 0] == 255).all()  # selector 0 = c0 = pure red
        assert (px[:, :, 2] == 0).all()
