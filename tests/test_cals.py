"""CALS Type 1 codec (codecs/cals.py) + the G4 encoder behind it —
goldens from the reference autotest/gdrivers/cals.py CreateCopy
expectations: small1bit.img -> 9907 (inverted grayscale source),
oddsize1bit.tif -> 3883 both for a normal-palette source (inverted)
and a (white, black)-palette source (kept)."""

import numpy as np

from gdal_ray.codecs.cals import decode_cals, encode_cals
from gdal_ray.codecs.fax import decode_g4, encode_g4
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

D = "/root/reference/autotest/gdrivers/data"


def cs(a):
    return int(checksum(np.asarray(a)))


class TestG4Encode:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(11)
        for shape in [(1, 1), (3, 5), (17, 64), (40, 171)]:
            for p in (0.05, 0.5, 0.95):
                img = (rng.random(shape) < p).astype(np.uint8)
                out = decode_g4(encode_g4(img), shape[1], shape[0])
                assert np.array_equal(img, out)

    def test_long_runs(self):
        img = np.zeros((4, 6000), np.uint8)
        img[1, 100:5900] = 1
        img[2, :] = 1
        out = decode_g4(encode_g4(img), 6000, 4)
        assert np.array_equal(img, out)


class TestCals:
    def test_small1bit(self):
        px, _, _, _ = read_raster(f"{D}/hfa/small1bit.img")
        out, gt, nd, meta = decode_cals(encode_cals(px))
        assert cs(out) == 9907          # autotest cals.py test_cals_1
        assert meta["driver"] == "CALS"
        assert meta["color_table"] == [(255, 255, 255), (0, 0, 0)]
        assert meta["TIFFTAG_XRESOLUTION"] == 200

    def test_oddsize_invert_rule(self):
        px, _, _, meta = read_raster(
            "/root/reference/autotest/gcore/data/oddsize1bit.tif")
        out, _, _, _ = decode_cals(encode_cals(px))
        assert cs(out) == 3883          # test_cals_2
        # (white, black) palette source: values pass through unchanged
        out2, _, _, _ = decode_cals(
            encode_cals(out, color_table=[(255, 255, 255), (0, 0, 0)]))
        assert cs(out2) == 3883         # test_cals_3
        assert np.array_equal(out, out2)

    def test_routing(self, tmp_path):
        px = np.zeros((20, 30), np.uint8)
        px[5:15, 10:20] = 1
        p = tmp_path / "doc.cal"
        p.write_bytes(encode_cals(px, pixel_path=90, line_progression=180))
        out, _, _, meta = read_raster(str(p))
        assert meta["driver"] == "CALS"
        assert meta["PIXEL_PATH"] == 90
        assert meta["LINE_PROGRESSION"] == 180
        assert np.array_equal(out, 1 - px)
