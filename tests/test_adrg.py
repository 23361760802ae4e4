"""ADRG + ASRP/USRP readers (codecs/adrg.py) — goldens from the
reference autotest adrg.py (checksum 62833, ZNA 9/18 polar
geotransforms, subdataset IMG pairing) and srp.py (checksum 24576 for
PCB 0/4/8, UTM 17N, QAL color table + quality metadata, THF entry)."""

import numpy as np
import pytest

from gdal_ray.codecs.adrg import decode_adrg, decode_srp
from gdal_ray.core.checksum import checksum
from gdal_ray.sources.raster import read_raster

DA = "/root/reference/autotest/gdrivers/data/adrg"
DS = "/root/reference/autotest/gdrivers/data/srp"


def cs(a):
    return int(checksum(np.asarray(a)))


class TestAdrg:
    def test_gen(self):
        px, gt, nd, meta = decode_adrg(f"{DA}/SMALL_ADRG/ABCDEF01.GEN")
        assert px.shape == (128, 128, 3)
        assert cs(px[:, :, 0]) == 62833
        assert meta["ADRG_NAM"] == "ABCDEF01"
        assert meta["ADRG_SCA"] == 8691341

    def test_thf(self):
        px, *_ = decode_adrg(f"{DA}/SMALL_ADRG/TRANSH01.THF")
        assert cs(px[:, :, 0]) == 62833

    def test_zna_polar(self):
        _, gt, _, meta = decode_adrg(f"{DA}/SMALL_ADRG_ZNA9/ABCDEF01.GEN")
        exp = (-307675.73602473765, 100.09145391818853, 0.0,
               -179477.5051066006, 0.0, -100.09145391818853)
        assert max(abs(gt[i] - exp[i]) for i in range(6)) <= 1e-5
        assert meta["crs"] == "ARC_System_Zone_09"
        _, gt, _, meta = decode_adrg(f"{DA}/SMALL_ADRG_ZNA18/ABCDEF01.GEN")
        assert gt[3] == pytest.approx(179477.5051066006, abs=1e-5)
        assert meta["crs"] == "ARC_System_Zone_18"

    def test_subdataset(self):
        px, _, _, meta = decode_adrg(f"{DA}/subdataset/XXXXXX01.GEN",
                                     img_path=f"{DA}/subdataset/XXXXXX02.IMG")
        assert cs(px[:, :, 0]) == 62833
        assert meta["ADRG_NAM"] == "XXXXXX02"

    def test_routing(self):
        px, gt, nd, meta = read_raster(f"{DA}/SMALL_ADRG/ABCDEF01.GEN")
        assert meta["driver"] == "ADRG"


class TestSrp:
    @pytest.mark.parametrize("pcb", (0, 4, 8))
    def test_usrp_pcb(self, pcb):
        px, gt, nd, meta = decode_srp(f"{DS}/USRP_PCB{pcb}/FKUSRP01.GEN")
        assert cs(px) == 24576
        assert gt == (500000.0, 5.0, 0.0, 5000000.0, 0.0, -5.0)
        assert meta["crs"] == "EPSG:32617"

    def test_metadata_and_palette(self):
        _, _, _, meta = decode_srp(f"{DS}/USRP_PCB0/FKUSRP01.GEN")
        assert meta["SRP_NAM"] == "FKUSRP"
        assert meta["SRP_PRODUCT"] == "USRP"
        assert meta["SRP_SCA"] == 50000
        assert meta["SRP_ZNA"] == 17
        assert meta["SRP_PSP"] == "100.0"
        assert meta["SRP_EDN"] == 0
        assert meta["SRP_CLASSIFICATION"] == "U"
        assert meta["SRP_CREATIONDATE"] == "20120505"
        assert meta["SRP_REVISIONDATE"] == "20120505"
        ct = meta["color_table"]
        assert len(ct) == 4
        assert ct[0] == (0, 0, 0)
        assert ct[1] == (255, 0, 0)

    def test_thf_and_routing(self):
        px, *_ = decode_srp(f"{DS}/USRP_PCB0/TRANSH01.THF")
        assert cs(px) == 24576
        px, gt, nd, meta = read_raster(f"{DS}/USRP_PCB4/FKUSRP01.GEN")
        assert meta["driver"] == "SRP"
        assert cs(px) == 24576
