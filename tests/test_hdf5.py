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


class TestVlenStrings:
    def test_vlstr_metadata_parity(self):
        """Variable-length string attributes resolve through the
        global heap; values must match the reference's test_hdf5_9
        expectations (autotest/gdrivers/hdf5.py:247-254)."""
        f = Hdf5File(open(f"{H5}/vlstr_metadata.h5", "rb").read())
        attrs = f.visit()["/TEST"].attrs
        assert attrs["BANDNAMES"] == "SAA"
        assert attrs["CODING"] == "0.6666666667 0.0000000000 TRUE"
        assert attrs["FLAGS"] == "255=noValue"
        assert attrs["MAPPING"] == (
            "Geographic Lat/Lon 0.5000000000 0.5000000000 "
            "27.3154761905 -5.0833333333 0.0029761905 0.0029761905 "
            "WGS84 Degrees")
        assert attrs["NOVALUE"] == "255"
        assert attrs["RANGE"] == "0 255 0 255"

    def test_vlen_string_dataset(self):
        """A contiguous vlen-string dataset decodes to an object
        array of str."""
        f = Hdf5File(open(f"{H5}/hdfeos_sample_swath.h5", "rb").read())
        a = f.read("/HDFEOS/SWATHS/Swath1/Data Fields/Test_string")
        assert a.shape == (10,)
        assert a.dtype == object
        assert all(isinstance(v, str) for v in a)


class TestLayoutV4:
    def test_swath_v4_layouts_decode(self):
        """hdfeos_sample_swath.h5 is an HDF5 1.10 file using data
        layout v4 with single-chunk and extensible-array chunk
        indexes; the reference expects Spectra as 20x40x15
        (autotest/gdrivers/hdf5.py test_hdf5_eos_swath_*)."""
        f = Hdf5File(open(f"{H5}/hdfeos_sample_swath.h5", "rb").read())
        ds = f.datasets()
        spectra = f.read("/HDFEOS/SWATHS/Swath1/Data Fields/Spectra")
        assert spectra.shape == (15, 40, 20)
        temp = f.read("/HDFEOS/SWATHS/Swath1/Data Fields/Temperature")
        assert temp.shape == (20, 10)
        lon = f.read(
            "/HDFEOS/SWATHS/Swath1/Geolocation Fields/Longitude")
        assert lon.shape == (20, 10)

    def test_extensible_array_chunk_index(self):
        """The Count dataset uses the extensible-array chunk index
        with two chunks; chunk 1 holds the sequence 1..20 (real chunk
        data, not fill — the file's second chunk payload is
        [0,0,1..10]: the 21.. sequence appears nowhere in the file,
        so the stored bytes are decoded verbatim)."""
        f = Hdf5File(open(f"{H5}/hdfeos_sample_swath.h5", "rb").read())
        a = f.read("/HDFEOS/SWATHS/Swath1/Data Fields/Count")
        assert a.shape == (32,)
        np.testing.assert_array_equal(a[:20], np.arange(1, 21))
        np.testing.assert_array_equal(a[20:], [0, 0] + list(range(1, 11)))


class TestFamilyFiles:
    def test_family_members_stitch(self):
        """test_family_0/1/2.h5 are family-VFD members; any member
        path opens the stitched file (reference
        test_hdf5_family_driver)."""
        from gdal_ray.codecs.hdf5 import load_hdf5_bytes
        f = Hdf5File(load_hdf5_bytes(f"{H5}/test_family_0.h5"))
        a = f.read("/chunked")
        assert a.shape == (1000, 1000)
        assert a.dtype == np.float32
        # member 1 resolves to the same family
        f2 = Hdf5File(load_hdf5_bytes(f"{H5}/test_family_1.h5"))
        assert f2.read("/chunked").shape == (1000, 1000)

    def test_non_family_numbered_file_unaffected(self, tmp_path):
        """A numbered filename with no member-0/member-1 siblings
        reads as a plain single file."""
        from gdal_ray.codecs.hdf5 import load_hdf5_bytes
        import shutil
        p = tmp_path / "solo_7.h5"
        shutil.copy(f"{H5}/u8be.h5", p)
        f = Hdf5File(load_hdf5_bytes(str(p)))
        assert cs(f.read("/TestArray")) == 135
