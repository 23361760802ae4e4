"""RADARSAT Constellation (RCM) product reader (codecs/rcm.py) —
reference autotest rcm.py expectations on fake_VV_VH_GRD: open from
root dir / metadata dir / product.xml, 17915x3297 uint16 grid with
2 polarization bands (VH first, checksum 0 on the fake imagery), the
full 39-key product-metadata mapping, all-zero RPC dict, and the
single WGS84 tie-point GCP."""

import numpy as np

from gdal_ray.codecs.rcm import decode_rcm
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/rcm/fake_VV_VH_GRD"


class TestRcm:
    def test_open_variants(self):
        for p in (D, f"{D}/metadata", f"{D}/metadata/product.xml"):
            _, _, _, meta = decode_rcm(p, materialize=False)
            assert meta["poles"] == ["VH", "VV"]
            assert (meta["width"], meta["height"]) == (17915, 3297)

    def test_grid_and_bands(self):
        px, _, _, meta = decode_rcm(f"{D}/metadata/product.xml")
        assert px.shape == (3297, 17915, 2)
        assert px.dtype == np.uint16
        assert int(checksum(px[:512, :512, 0])) == 0  # fake imagery

    def test_metadata(self):
        _, _, _, meta = decode_rcm(D, materialize=False)
        md = meta["metadata"]
        assert md["SATELLITE_IDENTIFIER"] == "RCM-1"
        assert md["PRODUCT_TYPE"] == "GRD"
        assert md["POLARIZATIONS"] == "VH VV"
        assert md["SECURITY_CLASSIFICATION"] == \
            "Non classifié / Unclassified"
        assert md["GEODETIC_TERRAIN_HEIGHT"] == "200"
        assert md["SATELLITE_HEIGHT"] == "600000"
        assert md["BETA_NOUGHT_LUT"].endswith(
            "lutBeta_VH.xml," + md["BETA_NOUGHT_LUT"].split(",")[1])
        assert "lutBeta_VV.xml" in md["BETA_NOUGHT_LUT"]
        assert len([k for k in md]) == 41   # 38 mapped + bits + 3 LUTs

    def test_rpc_and_gcp(self):
        _, _, _, meta = decode_rcm(D, materialize=False)
        rpc = meta["RPC"]
        assert rpc["LINE_NUM_COEFF"] == " ".join(["0"] * 20)
        assert len(rpc) == 16
        g = meta["gcps"][0]
        assert (g["pixel"], g["line"], g["x"], g["y"], g["z"]) == \
            (2.0, 1.0, 2.5, 1.5, 3.5)
