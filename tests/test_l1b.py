"""NOAA AVHRR L1B reader (codecs/l1b.py) — reference autotest l1b.py
test_l1b_little_endian goldens: band-1 checksum 14145, per-dataset
mask checksum 25115, GRS 80 GCP datum, on the AAPP little-endian
NOAA-19 HRPT fixture (unpacked 16-bit, 22016-byte records,
ascending pass stored bottom-up)."""

import zipfile

import numpy as np
import pytest

from gdal_ray.codecs.l1b import decode_l1b
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

Z = "/root/reference/autotest/gdrivers/data/l1b/hrpt_little_endian.l1b.zip"


@pytest.fixture(scope="module")
def l1b_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("l1b")
    with zipfile.ZipFile(Z) as zf:
        zf.extractall(d)
    return str(d / "hrpt_little_endian.l1b")


class TestL1b:
    def test_little_endian_hrpt(self, l1b_path):
        px, gt, nd, meta = decode_l1b(l1b_path)
        assert px.shape == (2, 2048, 5)
        assert int(checksum(px[:, :, 0])) == 14145
        assert meta["crs"] == "GRS80"
        assert meta["SATELLITE"] == "NOAA-19"
        assert meta["DATA_TYPE"] == "HRPT"
        assert meta["LOCATION"] == "Ascending"

    def test_mask(self, l1b_path):
        px, _, _, meta = decode_l1b(l1b_path)
        mask = np.where(meta["mask"][:, None], 255, 0).astype(np.uint8)
        mask = np.repeat(mask, px.shape[1], axis=1)
        assert int(checksum(mask)) == 25115
        assert meta["missing_scanlines"] == 1

    def test_gcps(self, l1b_path):
        _, _, _, meta = decode_l1b(l1b_path)
        assert len(meta["gcps"]) == 102      # 51 per line x 2 lines
        g = meta["gcps"][0]
        assert -90 <= g["y"] <= 90 and -180 <= g["x"] <= 180

    def test_routing_and_truncated(self, l1b_path):
        px, _, _, meta = read_raster(l1b_path)
        assert meta["driver"] == "L1B"
        with pytest.raises(ValueError):
            decode_l1b("/root/reference/autotest/gdrivers/data/l1b/"
                       "n12gac8bit_truncated_ysize_0_1band.l1b")
