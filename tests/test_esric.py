"""Esri Compact Cache V2 reader (codecs/esric.py) — reference
autotest esric.py goldens on the Layers cache: LOD 1 is 512x512 with
band-2 checksum 46857 (PNG tiles incl. a grayscale one), the top LOD
has no bundles and reads as zeros, geotransform anchored at
-20037508.342787 with the LOD resolution."""

import os
import shutil
import tarfile

import numpy as np
import pytest

from gdal_ray.codecs.esric import decode_esric
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

TAR = "/root/reference/autotest/gdrivers/data/esric/Layers.tar"


@pytest.fixture(scope="module")
def conf(tmp_path_factory):
    d = tmp_path_factory.mktemp("esric")
    with tarfile.open(TAR) as tf:
        tf.extractall(d)
    return str(d / "Layers" / "conf.xml")


class TestEsric:
    def test_lod1_png_tiles(self, conf):
        px, gt, nd, meta = decode_esric(conf, lod=1)
        assert px.shape == (512, 512, 4)
        assert int(checksum(px[:, :, 1])) == 46857
        assert gt[0] == pytest.approx(-20037508.342787, abs=1)
        assert gt[1] == pytest.approx(78271.517, abs=0.01)
        assert meta["crs"] == "EPSG:3857"

    def test_empty_top_lod(self, conf):
        px, gt, *_ = decode_esric(conf, lod=3)
        assert px.shape == (2048, 2048, 4)
        assert int(checksum(px[:, :, 0])) == 0
        assert gt[1] == pytest.approx(20037508.342787 / 1024, abs=1)

    def test_routing(self, conf):
        px, _, _, meta = read_raster(conf)
        assert meta["driver"] == "ESRIC"
        assert meta["lods"] == [0, 1, 2, 3]
