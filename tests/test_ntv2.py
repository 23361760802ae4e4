"""NTv2 datum-shift grid reader (codecs/ntv2.py) — reference-fixture
goldens (autotest/gdrivers/ntv2.py: band-2 checksum 10, gt within
inc/100 of (-5.52, 7.8, 0, 52.05, 0, -5.55)) and the +nadgrids= CRS
datum leg."""

import numpy as np
import pytest

from gdal_ray.codecs.ntv2 import NTv2Grid, decode_ntv2, parse_ntv2
from gdal_ray.core.checksum import checksum

FIX = "/root/reference/autotest/gdrivers/data/ntv2"


class TestReferenceGoldens:
    @pytest.mark.parametrize("name", ["test_ntv2_le.gsb",
                                      "test_ntv2_be.gsb"])
    def test_checksum_and_gt(self, name):
        """test_ntv2_1/2: band 2 (longitude offset) checksum 10; the
        reference's expected gt carries a loose inc/100 tolerance —
        the driver formula (ntv2dataset.cpp OpenGrid) gives exactly
        (-5.55, 7.8, 0, 52.05, 0, -5.55) for this file."""
        px, gt, nd, meta = decode_ntv2(open(f"{FIX}/{name}", "rb").read())
        assert px.shape == (2, 2, 4)
        assert int(checksum(px[:, :, 1])) == 10
        exp = (-5.52, 7.8, 0.0, 52.05, 0.0, -5.55)
        tol = abs(exp[1]) / 100.0
        for g, e in zip(gt, exp):
            assert abs(g - e) <= tol
        assert meta["crs"] == "EPSG:4326"
        assert nd is None

    def test_both_endiannesses_identical(self):
        a, gta, *_ = decode_ntv2(open(f"{FIX}/test_ntv2_le.gsb",
                                      "rb").read())
        b, gtb, *_ = decode_ntv2(open(f"{FIX}/test_ntv2_be.gsb",
                                      "rb").read())
        np.testing.assert_array_equal(a, b)
        assert gta == gtb

    def test_header_metadata(self):
        meta, subs = parse_ntv2(open(f"{FIX}/test_ntv2_le.gsb",
                                     "rb").read())
        assert meta["GS_TYPE"] == "SECONDS"
        assert meta["SYSTEM_F"] == "NTF"
        assert abs(meta["MAJOR_T"] - 6378137.0) < 1e-6
        assert len(subs) == 1 and subs[0]["gs_count"] == 4

    def test_read_raster_routes_gsb(self):
        from gdal_ray.sources.raster import read_raster
        px, gt, nd, meta = read_raster(f"{FIX}/test_ntv2_le.gsb")
        assert int(checksum(px[:, :, 1])) == 10


class TestShift:
    def test_node_exact(self):
        """At a node centre the bilinear shift is the node value:
        lat + latshift/3600, lon - lonshift/3600 (positive west)."""
        g = NTv2Grid(open(f"{FIX}/test_ntv2_le.gsb", "rb").read())
        lon2, lat2 = g.shift(-1.65, 49.275)      # NW node
        assert abs(float(lat2) - (49.275 + g.px[0, 0, 0] / 3600)) < 1e-9
        assert abs(float(lon2) - (-1.65 - g.px[0, 0, 1] / 3600)) < 1e-9

    def test_outside_passthrough(self):
        g = NTv2Grid(open(f"{FIX}/test_ntv2_le.gsb", "rb").read())
        lon2, lat2 = g.shift([100.0, -80.0], [0.0, 10.0])
        np.testing.assert_array_equal(lon2, [100.0, -80.0])
        np.testing.assert_array_equal(lat2, [0.0, 10.0])

    def test_inverse_roundtrip(self):
        g = NTv2Grid(open(f"{FIX}/test_ntv2_le.gsb", "rb").read())
        rng = np.random.default_rng(7)
        lon = rng.uniform(-1.65, 6.15, 25)
        lat = rng.uniform(43.725, 49.275, 25)
        flon, flat = g.shift(lon, lat)
        blon, blat = g.shift_inverse(flon, flat)
        np.testing.assert_allclose(blon, lon, atol=1e-10)
        np.testing.assert_allclose(blat, lat, atol=1e-10)


class TestCrsIntegration:
    def test_nadgrids_datum_leg(self):
        """+nadgrids= routes the datum leg through the grid (PROJ
        priority: grids beat +towgs84); WGS84 hub roundtrips."""
        from gdal_ray.core.srs import CRS, params_from_proj
        p = params_from_proj(
            "+proj=longlat +ellps=clrk80ign "
            f"+nadgrids={FIX}/test_ntv2_le.gsb")
        assert p["nadgrids"].endswith("test_ntv2_le.gsb")
        crs = CRS(p)
        lon, lat = crs.lonlat_to_wgs84(0.0, 46.5)
        g = NTv2Grid(open(f"{FIX}/test_ntv2_le.gsb", "rb").read())
        elon, elat = g.shift(0.0, 46.5)
        assert abs(float(lon) - float(elon)) < 1e-12
        assert abs(float(lat) - float(elat)) < 1e-12
        blon, blat = crs.wgs84_to_lonlat(lon, lat)
        assert abs(float(blon) - 0.0) < 1e-10
        assert abs(float(blat) - 46.5) < 1e-10

    def test_nadgrids_null_ignored(self):
        from gdal_ray.core.srs import params_from_proj
        p = params_from_proj("+proj=longlat +datum=WGS84 +nadgrids=@null")
        assert "nadgrids" not in p


class TestVelocityGrids:
    """24-byte-record variant (6 float32 bands, NUM_SREC at byte 24
    — ntv2dataset.cpp knMAX_RECORD_SIZE, NAD83v70VG.gvb layout)."""

    def _grid(self):
        rng = np.random.default_rng(5)
        px = rng.normal(0, 3, (4, 6, 6)).astype(np.float32)
        from gdal_ray.codecs.ntv2 import encode_ntv2
        buf = encode_ntv2(px, lat_min=45.0, lat_max=48.0,
                          lon_min=-70.0, lon_max=-65.0, name="VGRID")
        return px, buf

    def test_roundtrip_and_layout(self):
        px, buf = self._grid()
        # the variant marker the reference probes for: NUM_SREC at 24
        assert buf[24:32] == b"NUM_SREC"
        out, gt, nodata, meta = decode_ntv2(buf)
        assert meta["record_size"] == 24
        assert out.shape == (4, 6, 6)
        np.testing.assert_array_equal(out, px)
        assert meta["band_descriptions"][0] == "East velocity (mm/year)"
        # node-centre-shifted geotransform, same formula as classic
        assert abs(gt[0] - (-70.0 - gt[1] / 2)) < 1e-12
        assert abs(gt[3] - (48.0 - gt[5] / 2)) < 1e-12

    def test_node_storage_order(self):
        """File nodes run south->north, east->west; first stored node
        is the south-east corner (presentation [-1, -1])."""
        px, buf = self._grid()
        meta, subs = parse_ntv2(buf)
        first = np.frombuffer(buf, "<f4", count=6,
                              offset=subs[0]["data_off"])
        np.testing.assert_array_equal(first, px[-1, -1, :])

    def test_shift_rejects_velocity(self):
        _, buf = self._grid()
        with pytest.raises(ValueError, match="velocity"):
            NTv2Grid(buf)

    def test_classic_grids_unaffected(self):
        buf = open(f"{FIX}/test_ntv2_le.gsb", "rb").read()
        _, _, _, meta = decode_ntv2(buf)
        assert meta["record_size"] == 16
