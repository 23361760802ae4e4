"""STACTA tiled-asset and STACIT item-collection readers
(sources/stacta.py) — goldens from the reference autotest stacta.py
(2048x1024 mosaic of the z2 metatiles, gt -180/0.17578125) and
stacit.py (40x20 paged mosaic checksum 9239, single-page 4672,
per-CRS asset grouping)."""

import numpy as np
import pytest

from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster
from gdal_ray.sources.stacta import decode_stacit, decode_stacta

DA = "/root/reference/autotest/gdrivers/data/stacta"
DI = "/root/reference/autotest/gdrivers/data/stacit"


def cs(a):
    return int(checksum(np.asarray(a)))


class TestStacta:
    def test_basic(self):
        px, gt, nd, meta = decode_stacta(f"{DA}/test.json")
        assert px.shape == (1024, 2048, 3)
        exp = (-180.0, 0.17578125, 0.0, 90.0, 0.0, -0.17578125)
        assert all(abs(a - b) < 1e-8 for a, b in zip(gt, exp))
        assert nd == 0.0
        assert meta["zooms"] == ["0", "1", "2"]
        t0, *_ = read_raster(f"{DA}/WorldCRS84Quad/2/0/0.tif")
        t1, *_ = read_raster(f"{DA}/WorldCRS84Quad/2/0/1.tif")
        ref = np.concatenate([np.atleast_3d(t0), np.atleast_3d(t1)],
                             axis=1)
        assert np.array_equal(px, ref)

    def test_east_hemisphere(self):
        px, gt, *_ = decode_stacta(f"{DA}/test_east_hemisphere.json")
        assert px.shape == (1024, 1024, 3)
        assert gt[0] == pytest.approx(0.0, abs=1e-10)
        assert gt[3] == 90.0

    def test_multiple_assets(self):
        a = decode_stacta(f"{DA}/test_multiple_asset_templates.json")[0]
        b = decode_stacta(f"{DA}/test_multiple_asset_templates.json",
                          asset="other_bands")[0]
        assert a.shape == b.shape == (1024, 2048, 3)
        assert not np.array_equal(a, b)

    def test_routing(self):
        px, gt, nd, meta = read_raster(f"{DA}/test.json")
        assert meta["driver"] == "STACTA"


class TestStacit:
    def test_paged_mosaic(self):
        px, gt, nd, meta = decode_stacit(f"{DI}/test.json")
        assert px.shape == (20, 40)
        assert cs(px) == 9239              # autotest stacit.py basic
        assert gt == (440720, 60, 0.0, 3751320, 0.0, -60)
        assert meta["crs"] == "EPSG:26711"

    def test_max_items(self):
        px, *_ = decode_stacit(f"{DI}/test.json", max_items=1)
        assert px.shape == (20, 20)
        assert cs(px) == 4672

    def test_multiple_assets_crs_split(self):
        a = decode_stacit(f"{DI}/test_multiple_assets.json",
                          epsg=26711)[0]
        b = decode_stacit(f"{DI}/test_multiple_assets.json",
                          epsg=26712)[0]
        assert a.shape == (20, 20) and b.shape == (20, 20)

    def test_routing(self):
        px, gt, nd, meta = read_raster(f"{DI}/test.json")
        assert meta["driver"] == "STACIT"
        assert cs(px) == 9239
