"""HDF5 reader (codecs/hdf5.py) — reference-fixture goldens.

Reference expectations: autotest/gdrivers/hdf5.py (u8be checksum 135,
groups.h5 //MyGroup/dset1 checksum 18) and netCDF-4 parity with the
classic-model goldens (trmm.nc == trmm-nc4.nc == trmm-nc4c.nc)."""

import numpy as np
import pytest

from gdal_ray.codecs.hdf5 import Hdf5File, decode_hdf5
from gdal_ray.core.checksum import checksum

H5 = "/root/reference/autotest/gdrivers/data/hdf5"
NC = "/root/reference/autotest/gdrivers/data/netcdf"


def cs(a):
    return int(checksum(np.asarray(a, np.float64)))


class TestReferenceGoldens:
    def test_u8be_checksum_135(self):
        """autotest/gdrivers/hdf5.py:76 — big-endian uint8 dataset."""
        px, gt, nd, meta = decode_hdf5(open(f"{H5}/u8be.h5", "rb").read())
        assert px.shape == (6, 5)
        assert cs(px) == 135
        assert nd is None

    def test_groups_subdataset_checksum_18(self):
        """autotest/gdrivers/hdf5.py:108 — nested old-style groups,
        HDF5:"file"://MyGroup/dset1 subdataset access."""
        buf = open(f"{H5}/groups.h5", "rb").read()
        f = Hdf5File(buf)
        assert sorted(f.datasets()) == ["/MyGroup/Group_A/dset2",
                                        "/MyGroup/dset1"]
        assert cs(f.read("/MyGroup/dset1")) == 18
        px, *_ = decode_hdf5(buf, dataset="MyGroup/dset1")
        assert cs(px) == 18

    def test_deflate_shuffle_chunked(self):
        """deflate.h5: chunked + shuffle + deflate pipeline; content is
        the byte.tif raster (checksum 4672, stored bottom-up)."""
        f = Hdf5File(open(f"{H5}/deflate.h5", "rb").read())
        o = f.datasets()["/Band1"]
        assert o.layout[0] == "chunked"
        assert [fid for fid, _ in o.filters] == [2, 1]   # shuffle+deflate
        band = f.read("/Band1")
        assert cs(band[::-1]) == 4672

    def test_float_endianness_parity(self):
        a = Hdf5File(open(f"{H5}/float32_little_endian.h5", "rb").read())
        b = Hdf5File(open(f"{H5}/float32_big_endian.h5", "rb").read())
        va = a.read("/test").astype(np.float64)
        vb = b.read("/test").astype(np.float64)
        np.testing.assert_array_equal(va, vb)

    def test_compound_complex(self):
        f = Hdf5File(open(f"{H5}/complex.h5", "rb").read())
        c = f.read("/f64")
        assert set(c.dtype.names) == {"r", "i"}
        assert c.shape == (5, 5)
        # values are a simple ramp (r == i in the fixture)
        np.testing.assert_array_equal(c["r"], c["i"])

    def test_metadata_attributes(self):
        f = Hdf5File(open(f"{H5}/metadata.h5", "rb").read())
        objs = f.visit()
        root = objs["/"]
        assert root.attrs, "root group attributes missing"


class TestFixtureSweep:
    def test_every_hdf5_fixture_decodes_or_names_its_boundary(self):
        """All HDF5-container fixtures in the reference tree either
        decode fully or raise a named ValueError (no crashes): the
        honest-fail-fast contract."""
        import glob
        ok, named = 0, 0
        paths = (glob.glob(f"{H5}/*.h5")
                 + glob.glob(f"{NC}/*.nc"))
        for p in sorted(paths):
            buf = open(p, "rb").read()
            if buf[:8] != b"\x89HDF\r\n\x1a\n":
                continue
            try:
                f = Hdf5File(buf)
                for k in list(f.datasets())[:3]:
                    f.read(k)
                ok += 1
            except ValueError:
                named += 1
        assert ok >= 55, (ok, named)
        assert named <= 8


class TestNetcdf4:
    @pytest.mark.parametrize("name", ["trmm-nc4.nc", "trmm-nc4c.nc",
                                      "trmm-nc4z.nc"])
    def test_parity_with_classic_model(self, name):
        """netCDF-4 and netCDF-4-classic decode pixel/geotransform/
        nodata-identical to the classic trmm.nc golden."""
        from gdal_ray.codecs.netcdf import decode_netcdf
        a, gta, nda, _ = decode_netcdf(open(f"{NC}/trmm.nc", "rb").read())
        b, gtb, ndb, meta = decode_netcdf(open(f"{NC}/{name}", "rb").read())
        np.testing.assert_array_equal(np.asarray(a, np.float64),
                                      np.asarray(b, np.float64))
        assert np.allclose(gta, gtb)
        assert nda == ndb

    def test_read_raster_routes_h5(self):
        from gdal_ray.sources.raster import read_raster
        px, gt, nd, meta = read_raster(f"{H5}/u8be.h5")
        assert cs(px) == 135
        assert meta["hdf5_path"] == "/TestArray"


class TestFailFast:
    def test_not_hdf5(self):
        with pytest.raises(ValueError, match="superblock"):
            Hdf5File(b"\x00" * 4096)

    def test_missing_dataset_named(self):
        with pytest.raises(ValueError, match="not found"):
            decode_hdf5(open(f"{H5}/groups.h5", "rb").read(),
                        dataset="nope")


class TestHdfeos:
    def test_utm_grid_georef(self):
        """HDF-EOS5 grid StructMetadata: UTM zone 11 corners
        reproduce byte.tif's geotransform exactly."""
        px, gt, nd, meta = decode_hdf5(
            open(f"{H5}/dummy_HDFEOS_with_utm_projection.h5",
                 "rb").read())
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert "utm +zone=11" in meta["crs"]

    def test_geo_grid_dms_unpack(self):
        """GEO projection corners arrive in packed GCTP DMS."""
        px, gt, nd, meta = decode_hdf5(
            open(f"{H5}/dummy_HDFEOS_with_geo_projection.h5",
                 "rb").read())
        assert meta["crs"] == "EPSG:4326"
        assert -118.0 < gt[0] < -117.0
        assert 33.0 < gt[3] < 34.0
        assert gt[1] > 0 and gt[5] < 0

    def test_sinusoidal_grid(self):
        px, gt, nd, meta = decode_hdf5(
            open(f"{H5}/dummy_HDFEOS_with_sinu_projection.h5",
                 "rb").read())
        assert meta["crs"].startswith("+proj=sinu")
        # the CRS constructor can build the transform end-to-end
        from gdal_ray.core.srs import crs_from
        crs = crs_from(meta["crs"])
        lon, lat = crs.xy_to_lonlat(gt[0], gt[3])
        assert -180 <= float(lon) <= 180 and -90 <= float(lat) <= 90
