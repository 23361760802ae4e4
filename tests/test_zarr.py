"""Zarr v2 reader (sources/zarr.py) — reference-fixture goldens
(autotest/gdrivers/data/zarr, definitions in generate_test_files.py)."""

import glob

import numpy as np
import pytest

from gdal_ray.core.checksum import checksum
from gdal_ray.sources.zarr import (list_zarr_arrays, read_zarr,
                                   read_zarr_array)

D = "/root/reference/autotest/gdrivers/data/zarr"


class TestGoldens:
    def test_byte_cf1_is_byte_tif(self):
        """byte_cf1.zarr = the CF-model export of byte.tif: raster
        checksum 4672 and its exact UTM geotransform via the
        grid_mapping array's GeoTransform attribute."""
        px, gt, nd, meta = read_zarr(f"{D}/byte_cf1.zarr")
        assert px.shape == (20, 20)
        assert int(checksum(np.asarray(px, np.float64))) == 4672
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert meta["zarr_array"] == "Band1"

    def test_zlib_and_gzip(self):
        a, _ = read_zarr_array(f"{D}/zlib.zarr")
        assert a.tolist() == [1, 2]
        a, _ = read_zarr_array(f"{D}/gzip.zarr")
        assert a.tolist() == [1, 2]

    def test_endianness_parity(self):
        le, _ = read_zarr_array(f"{D}/f2_le.zarr")
        be, _ = read_zarr_array(f"{D}/f2_be.zarr")
        np.testing.assert_array_equal(le.astype(np.float64),
                                      be.astype(np.float64))

    def test_delta_filter(self):
        a, _ = read_zarr_array(f"{D}/delta_filter_i4.zarr")
        assert a.dtype == np.int32
        # generate_test_files.py: arange(10) stored delta-encoded
        assert a.tolist() == list(range(10))

    def test_fortran_order(self):
        a, _ = read_zarr_array(f"{D}/order_f_u1.zarr")
        assert a.ndim == 2
        # generate_test_files writes a row-major ramp through F order
        assert a[0, 0] == 0

    def test_compound_and_nested(self):
        a, _ = read_zarr_array(f"{D}/compound_well_aligned.zarr")
        assert a.dtype.names is not None
        a2, _ = read_zarr_array(f"{D}/compound_complex.zarr")
        assert "b" in a2.dtype.names

    def test_fixture_sweep_decodes_or_names_boundary(self):
        ok = named = 0
        for p in sorted(glob.glob(f"{D}/*.zarr")):
            try:
                read_zarr(p)
                ok += 1
            except ValueError as e:
                named += 1
                assert "unsupported" in str(e) or "zarr" in str(e), p
        assert ok >= 34, (ok, named)
        assert named <= 9

    def test_read_raster_routes_zarr(self):
        from gdal_ray.sources.raster import read_raster
        px, gt, nd, meta = read_raster(f"{D}/byte_cf1.zarr")
        assert int(checksum(np.asarray(px, np.float64))) == 4672
        assert gt is not None

    def test_group_traversal(self):
        names = list_zarr_arrays(f"{D}/group.zarr")
        assert names == ["foo/bar/baz"]
        px, gt, nd, meta = read_zarr(f"{D}/group.zarr")
        assert meta["zarr_array"] == "foo/bar/baz"

    def test_not_zarr_named(self):
        with pytest.raises((ValueError, FileNotFoundError)):
            read_zarr("/tmp")


class TestZarrV3:
    def test_byte_cf1_zr3_golden(self):
        """Zarr v3 store (zarr.json, c/-keys): same byte.tif raster,
        geotransform derived from CF x/y coordinate arrays (v3 CF
        grid_mapping carries no GDAL GeoTransform attribute)."""
        px, gt, nd, meta = read_zarr(f"{D}/byte_cf1.zr3")
        assert int(checksum(np.asarray(px, np.float64))) == 4672
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert meta["zarr_array"] == "Band1"

    def test_v3_gzip(self):
        px, gt, nd, meta = read_zarr(f"{D}/v3/gzip.zarr")
        assert px.size > 0

    def test_v3_sweep_no_crashes(self):
        ok = named = 0
        for p in sorted(glob.glob(f"{D}/v3/*.zarr")):
            try:
                read_zarr(p)
                ok += 1
            except ValueError:
                named += 1
        assert ok >= 4
