"""DIMAP v1/v2 reader — goldens from autotest/gdrivers/dimap.py
(v1 window checksum 21586 + metadata + corner GCP; dimap2
single_component 4x20x30 cs 7024 via directory, VOL and DIM entry
points, metadata/RPC parity)."""

import shutil

import numpy as np
import pytest

from gdal_ray.codecs.dimap import decode_dimap
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data"


class TestDimapV1:
    def test_metadata_dim(self, tmp_path):
        for f in ("dimap/METADATA.DIM", "dimap/IMAGERY.TIF",
                  "rgbsmall.tif"):
            shutil.copy(f"{D}/{f}", tmp_path)
        px, gt, nd, meta = decode_dimap(str(tmp_path / "METADATA.DIM"))
        assert px.shape == (6000, 6000)
        assert int(checksum(np.asarray(px[:100, :100]))) == 21586
        assert meta["PROCESSING_LEVEL"] == "1A"
        assert meta["SPECTRAL_PHYSICAL_BIAS"] == "0.000000"
        g = meta["gcps"][0]
        assert g["pixel"] == 0.5 and g["line"] == 0.5
        assert g["x"] == pytest.approx(4.3641728, abs=2e-7)
        assert g["y"] == pytest.approx(44.2082255, abs=2e-7)


class TestDimap2:
    @pytest.mark.parametrize("entry", [
        "single_component", "single_component/VOL_PHR.XML",
        "single_component/DIM_foo.XML"])
    def test_single_component(self, entry):
        px, gt, nd, meta = decode_dimap(f"{D}/dimap2/{entry}")
        assert px.shape == (30, 20, 4)
        assert int(checksum(np.asarray(px[:, :, 0]))) == 7024
        assert meta["MISSION"] == "PHR"
        assert meta["SPECTRAL_PROCESSING"] == "PMS"
        assert meta["GEOMETRIC_ATTITUDES_USED"] == "ACCURATE"
        assert meta["EPHEMERIS_NADIR_LON"] == "NADIR_LON"
        assert meta["CLOUDCOVER_MEASURE_TYPE"] == "AUTOMATIC"
        assert meta["SUN_AZIMUTH"] == "CENTER_SUN_AZIMUTH"
        assert meta["PROCESSING_LEVEL"] == "SENSOR"
        assert meta["IMAGING_DATE"] == "2016-06-17"
        assert meta["BAND_MODE"] == "PX"
        assert meta["rpc"]["SAMP_NUM_COEFF_1"] == "SAMP_NUM_COEFF_1"

    def test_bundle(self):
        px, gt, nd, meta = decode_dimap(f"{D}/dimap2/bundle")
        assert px.shape[0] == 30

    def test_routing(self, tmp_path):
        from gdal_ray.sources.raster import read_raster
        px, gt, nd, meta = read_raster(
            f"{D}/dimap2/single_component/DIM_foo.XML")
        assert meta["driver"] == "DIMAP"


def test_dimap2_full_swath_band_groups():
    # MS-FS products split one cell's bands across files (RGB + NED);
    # they concatenate in document order, not alphabetically
    # (reference test_dimap_2_vhr2020_ms_fs: band mins 1..6)
    from gdal_ray.sources.raster import read_raster
    px, gt, nd, meta = read_raster(
        "/root/reference/autotest/gdrivers/data/dimap2/vhr2020_ms_fs/"
        "MS-FS/DIM_MS-FS.XML")
    assert px.shape == (1366, 1663, 6)
    assert [int(px[:, :, i].min()) for i in range(6)] == [1, 2, 3,
                                                         4, 5, 6]
