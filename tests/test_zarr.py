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


# ------------------------------------------------ blosc / lz4 codecs
Z = "/root/reference/autotest/gdrivers/data/zarr/"


@pytest.mark.parametrize("name", ["blosc", "lz4", "lzma",
                                  "lzma_with_filters", "zlib", "gzip"])
def test_compressor_fixtures(name):
    # the reference's own compression-method fixtures all decode to
    # [1, 2] (autotest zarr_driver.py test_zarr_read_compression_methods)
    from gdal_ray.sources.zarr import read_zarr_array
    arr, meta = read_zarr_array(Z + name + ".zarr")
    assert arr.tolist() == [1, 2]


def test_lz4_block_roundtrip():
    from gdal_ray.codecs.lz4 import lz4_compress, lz4_decompress
    rng = np.random.default_rng(0)
    cases = [b"", b"a", b"abc" * 1000,
             rng.integers(0, 4, 100000).astype(np.uint8).tobytes(),
             rng.integers(0, 256, 5000).astype(np.uint8).tobytes(),
             (b"x" * 65540) + b"y", bytes(100000)]
    for data in cases:
        enc = lz4_compress(data)
        assert lz4_decompress(enc, len(data)) == data


@pytest.mark.parametrize("typesize", [1, 2, 4, 8])
def test_blosc_shuffle_roundtrip(typesize):
    from gdal_ray.codecs.lz4 import blosc_compress, blosc_decompress
    dt = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}[typesize]
    a = (np.arange(300000) % 251).astype(dt)
    enc = blosc_compress(a.tobytes(), typesize=typesize, shuffle=True)
    assert blosc_decompress(enc) == a.tobytes()
    # compressible typed data shuffles well
    assert len(enc) < a.nbytes // 10


def test_blosc_memcpyed_and_multiblock():
    import os
    from gdal_ray.codecs.lz4 import blosc_compress, blosc_decompress
    rnd = os.urandom(10000)
    enc = blosc_compress(rnd, typesize=1)
    assert blosc_decompress(enc) == rnd          # memcpyed path
    # > one block (256 KiB blocksize), leftover partial block
    a = np.arange(700001, dtype=np.uint8)
    enc = blosc_compress(a.tobytes(), typesize=1, blocksize=65536)
    assert blosc_decompress(enc) == a.tobytes()


def test_blosc_zarr_store_roundtrip(tmp_path):
    # synthetic v2 store with blosc-compressed chunks read through
    # the standard reader (multi-chunk, fill-value edge chunks)
    import json
    from gdal_ray.codecs.lz4 import blosc_compress
    from gdal_ray.sources.zarr import read_zarr_array
    root = tmp_path / "t.zarr"
    root.mkdir()
    data = (np.arange(50 * 37) % 200).reshape(50, 37).astype("<u2")
    chunks = (16, 16)
    meta = {"zarr_format": 2, "shape": [50, 37], "chunks": [16, 16],
            "dtype": "<u2", "order": "C", "fill_value": 0,
            "filters": None,
            "compressor": {"id": "blosc", "cname": "lz4",
                           "clevel": 5, "shuffle": 1, "blocksize": 0}}
    (root / ".zarray").write_text(json.dumps(meta))
    for ci in range(-(-50 // 16)):
        for cj in range(-(-37 // 16)):
            block = np.zeros(chunks, dtype="<u2")
            sub = data[ci * 16:(ci + 1) * 16, cj * 16:(cj + 1) * 16]
            block[:sub.shape[0], :sub.shape[1]] = sub
            enc = blosc_compress(block.tobytes(), typesize=2,
                                 shuffle=True)
            (root / f"{ci}.{cj}").write_bytes(enc)
    arr, _ = read_zarr_array(str(root))
    assert np.array_equal(arr, data)


# ------------------------------------------------ zstd / snappy
def test_zstd_fixture():
    # (replaces the former fail-fast: zstd decodes via the own
    # RFC 8878 decoder now)
    from gdal_ray.sources.zarr import read_zarr_array
    arr, meta = read_zarr_array(Z + "zstd.zarr")
    assert arr.tolist() == [1, 2]


def test_zstd_pyarrow_cross_validation():
    # pyarrow's bundled libzstd is the conformance oracle (same
    # pattern as the WebP codec's libwebp plug)
    import os
    import pyarrow as pa
    from gdal_ray.codecs.zstd import zstd_compress, zstd_decompress
    rng = np.random.default_rng(0)
    cases = [b"", b"a", b"hello world hello world hello world",
             b"abc" * 10000,
             rng.integers(0, 4, 200000).astype(np.uint8).tobytes(),
             os.urandom(50000),
             np.arange(100000, dtype="<u4").tobytes()]
    for lvl in (1, 19):
        c = pa.Codec("zstd", compression_level=lvl)
        for data in cases:
            enc = bytes(c.compress(data))
            assert zstd_decompress(enc, len(data)) == data
    # own store-mode frames are valid zstd
    c = pa.Codec("zstd")
    for data in cases:
        assert bytes(c.decompress(zstd_compress(data),
                                  len(data))) == data


def test_snappy_pyarrow_cross_validation():
    import os
    import pyarrow as pa
    from gdal_ray.codecs.zstd import snappy_decompress
    c = pa.Codec("snappy")
    rng = np.random.default_rng(2)
    for data in [b"", b"hello hello hello hello", b"abc" * 5000,
                 os.urandom(70000),
                 rng.integers(0, 5, 120000).astype(np.uint8).tobytes()]:
        assert snappy_decompress(bytes(c.compress(data))) == data
