"""Sentinel-2 SAFE product reader (sources/sentinel2.py) — reference
autotest sentinel2.py goldens on the fake_l1c fixture: the full
product-metadata dict, the 10m union grid 20984x20980 with gt
(699960,10,0,5100060,0,-10) over EPSG:32632, the B08 granule
placements (0,0) and (10004,10000), per-resolution band groups; plus
a real-pixel mosaic over a synthetic SAFE built with this repo's own
JP2 encoder."""

import os
import shutil

import numpy as np
import pytest

from gdal_ray.codecs.jp2 import encode_jp2
from gdal_ray.sources.sentinel2 import read_sentinel2, sentinel2_info

X = ("/root/reference/autotest/gdrivers/data/sentinel2/fake_l1c/"
     "S2A_OPER_PRD_MSIL1C.SAFE/S2A_OPER_MTD_SAFL1C.xml")


class TestInfo:
    def test_product_metadata(self):
        md = sentinel2_info(X)["metadata"]
        assert md["DATATAKE_1_ID"] == "GS2A_20151231T235959_000123_N01.03"
        assert md["DATATAKE_1_SPACECRAFT_NAME"] == "Sentinel-2A"
        assert md["FOOTPRINT"] == \
            "POLYGON((11 46, 11 45, 13 45, 13 46, 11 46))"
        assert md["QUANTIFICATION_VALUE"] == "1000"
        assert md["REFERENCE_BAND"] == "B1"
        assert md["SPECIAL_VALUE_NODATA"] == "1"
        assert md["SPECIAL_VALUE_SATURATED"] == "0"
        assert md["CLOUD_COVERAGE_ASSESSMENT"] == "0.0"
        assert md["FORMAT_CORRECTNESS_FLAG"] == "PASSED"

    def test_subdataset_groups(self):
        subs = sentinel2_info(X)["subdatasets"]
        assert subs[0]["bands"] == ["B2", "B3", "B4", "B8"]
        assert subs[1]["bands"] == ["B5", "B6", "B7", "B8A", "B11",
                                    "B12"]
        assert subs[2]["bands"] == ["B1", "B9", "B10"]


class TestGrid:
    def test_10m_union(self):
        d = read_sentinel2(X, 10)
        assert (d["width"], d["height"]) == (20984, 20980)
        assert d["geotransform"] == (699960.0, 10.0, 0.0, 5100060.0,
                                     0.0, -10.0)
        assert d["crs"] == "EPSG:32632"
        b8 = sorted((s["xoff"], s["yoff"]) for s in d["sources"]
                    if s["band"] == "B8")
        assert b8 == [(0, 0), (10004, 10000)]
        assert all(s["xsize"] == 10980 for s in d["sources"])

    def test_band_info(self):
        d = read_sentinel2(X, 10)
        assert d["band_info"]["B4"]["CENTRAL_WAVELENGTH_UM"] == 0.665
        assert d["band_info"]["B4"]["FWHM_UM"] == 0.030


class TestMosaic:
    def test_materialize_own_jp2(self, tmp_path):
        src = os.path.dirname(X)
        dst = str(tmp_path / "S2A_OPER_PRD_MSIL1C.SAFE")
        shutil.copytree(src, dst)
        os.system(f"chmod -R u+w {dst}")
        rng = np.random.default_rng(7)
        tiles = {}
        for gi, gran in enumerate(sorted(os.listdir(f"{dst}/GRANULE"))):
            gd = f"{dst}/GRANULE/{gran}"
            mtd = [f for f in os.listdir(gd) if f.endswith(".xml")][0]
            t = open(f"{gd}/{mtd}").read()
            t = t.replace("<NROWS>10980</NROWS>", "<NROWS>8</NROWS>")
            t = t.replace("<NCOLS>10980</NCOLS>", "<NCOLS>8</NCOLS>")
            # compact the second granule against the first
            t = t.replace("<ULX>800000</ULX>", "<ULX>700040</ULX>")
            t = t.replace("<ULY>5000060</ULY>", "<ULY>5100060</ULY>")
            open(f"{gd}/{mtd}", "w").write(t)
            for f in os.listdir(f"{gd}/IMG_DATA"):
                img = rng.integers(0, 4096, (8, 8)).astype(np.uint16)
                tiles[f] = img
                open(f"{gd}/IMG_DATA/{f}", "wb").write(encode_jp2(img))
        d = read_sentinel2(f"{dst}/S2A_OPER_MTD_SAFL1C.xml", 10,
                           materialize=True)
        px = d["pixels"]
        assert px.shape == (8, 16, 4)
        b4 = d["bands"].index("B4")
        assert np.array_equal(
            px[:, :8, b4], tiles["S2A_OPER_MSI_L1C_T32TQR_B04.jp2"])
        assert np.array_equal(
            px[:, 8:, b4], tiles["S2A_OPER_MSI_L1C_T32TRQ_B04.jp2"])
