"""OpenEXR codec parity: the reference autotest's createcopy
checksum matrix (autotest/gdrivers/exr.py — byte.tif at HALF/FLOAT/
UINT and every supported compression → checksum 4672, plus the
uint16/uint32/float32/float64 fixtures) replicated through our own
container implementation."""

import numpy as np
import pytest

from gdal_ray.codecs.exr import read_exr, write_exr
from gdal_ray.codecs.gtiff import decode_gtiff
from gdal_ray.core.checksum import checksum

G = "/root/reference/autotest/gcore/data"


def _byte():
    return decode_gtiff(open(f"{G}/byte.tif", "rb").read()).pixels


@pytest.mark.parametrize("pixel_type", ["HALF", "FLOAT", "UINT"])
@pytest.mark.parametrize("compression", ["NONE", "RLE", "ZIPS", "ZIP"])
def test_byte_createcopy_matrix(pixel_type, compression, tmp_path):
    # test_exr_byte_createcopy{,_pixel_type_half,_float,_uint} and
    # test_exr_compression_createcopy: checksum 4672 in all cases
    p = str(tmp_path / "t.exr")
    write_exr(p, _byte(), pixel_type=pixel_type,
              compression=compression)
    px, gt, nd, meta = read_exr(p)
    assert checksum(px.astype(np.float64)) == 4672
    if compression != "NONE":
        assert meta["compression"] == compression


@pytest.mark.parametrize("name", ["uint16", "uint32", "float32",
                                  "float64"])
def test_other_dtypes(name, tmp_path):
    # test_exr_{uint16,uint32,float32,float64}_createcopy: 4672
    g = decode_gtiff(open(f"{G}/{name}.tif", "rb").read()).pixels
    p = str(tmp_path / "t.exr")
    write_exr(p, g)
    px, _, _, _ = read_exr(p)
    assert checksum(px.astype(np.float64)) == 4672


def test_rgb_float_exact_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (33, 47, 3),
                       dtype=np.uint8).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, compression="ZIP",
              geotransform=(10.0, 1.0, 0.0, 20.0, 0.0, -1.0),
              crs="WKT_HERE", metadata={"FOO": "bar"})
    px, gt, nd, meta = read_exr(p)
    assert np.array_equal(px, img)
    # gdal:geoTransform M33d roundtrip (exrdataset.cpp:876-890 order)
    assert gt == (10.0, 1.0, 0.0, 20.0, 0.0, -1.0)
    assert meta["crs"] == "WKT_HERE"
    assert meta["FOO"] == "bar"


def test_half_precision_is_lossy_above_2048(tmp_path):
    # HALF has 11 significand bits: integers > 2048 round
    vals = np.array([[2049.0, 4099.0]], dtype=np.float64)
    p = str(tmp_path / "t.exr")
    write_exr(p, vals, pixel_type="HALF")
    px, _, _, _ = read_exr(p)
    assert px[0, 0] != 2049.0 or px[0, 1] != 4099.0
    write_exr(p, vals, pixel_type="FLOAT")
    px, _, _, _ = read_exr(p)
    assert px[0, 0] == 2049.0 and px[0, 1] == 4099.0


def test_zip_block_boundaries(tmp_path):
    # heights around the 16-line ZIP chunk size
    rng = np.random.default_rng(5)
    for h in (1, 15, 16, 17, 33):
        img = rng.integers(0, 65535, (h, 21),
                           dtype=np.uint16).astype(np.uint32)
        p = str(tmp_path / "t.exr")
        write_exr(p, img, pixel_type="UINT", compression="ZIP")
        px, _, _, _ = read_exr(p)
        assert np.array_equal(px, img), h


def test_rle_incompressible_stays_raw(tmp_path):
    # random bytes don't RLE-compress; the store-raw rule must kick in
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (7, 201), dtype=np.uint8)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, pixel_type="UINT", compression="RLE")
    px, _, _, _ = read_exr(p)
    assert np.array_equal(px, img.astype(np.uint32))


def test_unsupported_compression_fails_fast(tmp_path):
    p = str(tmp_path / "t.exr")
    write_exr(p, _byte())
    data = bytearray(open(p, "rb").read())
    # patch the compression attribute value to DWAA (8)
    idx = data.index(b"compression\x00compression\x00")
    data[idx + len(b"compression\x00compression\x00") + 4] = 8
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="DWAA"):
        read_exr(p)


def test_dispatch():
    import tempfile, os
    from gdal_ray.sources.raster import read_raster
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.exr")
        write_exr(p, _byte())
        px, gt, nd, meta = read_raster(p)
        assert checksum(px.astype(np.float64)) == 4672


@pytest.mark.parametrize("compression", ["NONE", "ZIP", "RLE"])
def test_tiled_roundtrip(compression, tmp_path):
    # ONE_LEVEL tiled storage: partial edge tiles, all compressions
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (37, 53, 3),
                       dtype=np.uint8).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, compression=compression, tile=(16, 16),
              geotransform=(5.0, 2.0, 0.0, 7.0, 0.0, -2.0))
    px, gt, nd, meta = read_exr(p)
    assert np.array_equal(px, img)
    assert gt == (5.0, 2.0, 0.0, 7.0, 0.0, -2.0)


def test_tiled_byte_checksum(tmp_path):
    p = str(tmp_path / "t.exr")
    write_exr(p, _byte(), tile=(7, 9))
    px, _, _, _ = read_exr(p)
    assert checksum(px.astype(np.float64)) == 4672


# ------------------------------------------------- PIZ / PXR24 / B44
@pytest.mark.parametrize("pixel_type,dtype", [
    ("HALF", np.uint8), ("UINT", np.uint32), ("FLOAT", np.float32)])
def test_piz_lossless_roundtrip(pixel_type, dtype, tmp_path):
    rng = np.random.default_rng(42)
    if dtype == np.float32:
        img = rng.normal(size=(37, 53, 3)).astype(np.float32)
    else:
        img = rng.integers(0, 255, size=(37, 53, 3)).astype(dtype)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, pixel_type=pixel_type, compression="PIZ")
    px, _, _, meta = read_exr(p)
    if pixel_type == "HALF":
        exp = img.astype(np.float16).astype(np.float32)
    elif pixel_type == "FLOAT":
        exp = img.astype(np.float32)
    else:
        exp = img.astype(np.uint32)
    assert np.array_equal(px, exp)
    assert meta["compression"] == "PIZ"


def test_piz_byte_checksum(tmp_path):
    p = str(tmp_path / "t.exr")
    write_exr(p, _byte(), compression="PIZ")
    px, _, _, _ = read_exr(p)
    assert checksum(px.astype(np.float64)) == 4672


@pytest.mark.parametrize("shape", [(20, 20), (40, 1), (1, 40), (1, 1)])
def test_piz_degenerate_shapes(shape, tmp_path):
    rng = np.random.default_rng(3)
    img = rng.normal(size=shape).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, pixel_type="FLOAT", compression="PIZ")
    px, _, _, _ = read_exr(p)
    assert np.array_equal(px.reshape(shape), img)


def test_piz_empty_bitmap_all_zero(tmp_path):
    # all-zero data exercises bitmapFromData's empty-bitmap encoding
    # (minNonZero = 8191 > maxNonZero = 0, no bitmap bytes)
    p = str(tmp_path / "t.exr")
    write_exr(p, np.zeros((20, 20), np.float32), pixel_type="FLOAT",
              compression="PIZ")
    px, _, _, _ = read_exr(p)
    assert not px.any()


def test_piz_tiled(tmp_path):
    rng = np.random.default_rng(17)
    img = rng.normal(size=(37, 51, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, pixel_type="FLOAT", compression="PIZ",
              tile=(16, 16))
    px, _, _, _ = read_exr(p)
    assert np.array_equal(px, img)


def test_piz_deep_huffman_codes():
    # Fibonacci frequencies force code lengths past the 14-bit fast
    # table into the long-code search path
    from gdal_ray.codecs.exr_piz import _huf_compress, _huf_uncompress
    fib = [1, 1]
    for _ in range(24):
        fib.append(fib[-1] + fib[-2])
    data = np.concatenate(
        [np.full(f, i, np.uint16) for i, f in enumerate(fib)])
    rng = np.random.default_rng(0)
    rng.shuffle(data)
    enc = _huf_compress(data)
    dec = _huf_uncompress(enc, len(data))
    assert np.array_equal(dec, data)


def test_pxr24_uint_and_half_lossless(tmp_path):
    rng = np.random.default_rng(7)
    u = rng.integers(0, 2 ** 32 - 1, size=(33, 41, 2)).astype(np.uint32)
    p = str(tmp_path / "t.exr")
    write_exr(p, u, pixel_type="UINT", compression="PXR24")
    px, _, _, _ = read_exr(p)
    assert np.array_equal(px, u)
    h = rng.normal(size=(33, 41)).astype(np.float16).astype(np.float32)
    write_exr(p, h, pixel_type="HALF", compression="PXR24")
    px, _, _, _ = read_exr(p)
    assert np.array_equal(px, h)


def test_pxr24_float_24bit_truncation(tmp_path):
    rng = np.random.default_rng(7)
    f = rng.normal(size=(33, 41, 3)).astype(np.float32) * 100
    p = str(tmp_path / "t.exr")
    write_exr(p, f, pixel_type="FLOAT", compression="PXR24")
    px, _, _, _ = read_exr(p)
    rel = np.abs(px - f) / np.maximum(np.abs(f), 1e-9)
    assert rel.max() < 2 ** -15          # 15-bit significand


@pytest.mark.parametrize("comp", ["B44", "B44A"])
def test_b44_smooth_block_error(comp, tmp_path):
    # error is bounded by the per-block shift; same-sign smooth
    # blocks stay within a few half-ULPs
    y, x = np.mgrid[0:16, 0:16]
    h = (1.0 + 0.01 * x + 0.02 * y).astype(np.float16).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, h, pixel_type="HALF", compression=comp)
    px, _, _, _ = read_exr(p)
    assert np.abs(px - h).max() < 0.005


def test_b44a_flat_blocks_are_3_bytes(tmp_path):
    flat = np.full((32, 64), 0.5, np.float32)
    pa = str(tmp_path / "a.exr")
    pb = str(tmp_path / "b.exr")
    write_exr(pa, flat, pixel_type="HALF", compression="B44A")
    write_exr(pb, flat, pixel_type="HALF", compression="B44")
    import os
    assert os.path.getsize(pa) < os.path.getsize(pb)
    px, _, _, _ = read_exr(pa)
    assert np.array_equal(px, flat)


def test_b44_uint_channel_stored_verbatim(tmp_path):
    rng = np.random.default_rng(11)
    u = rng.integers(0, 2 ** 31, size=(17, 23)).astype(np.uint32)
    p = str(tmp_path / "t.exr")
    write_exr(p, u, pixel_type="UINT", compression="B44")
    px, _, _, _ = read_exr(p)
    assert np.array_equal(px, u)


def test_b44a_tiled(tmp_path):
    h = (np.mgrid[0:37, 0:53][1] / 53.0).astype(np.float16) \
        .astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, h, pixel_type="HALF", compression="B44A",
              tile=(16, 16))
    px, _, _, _ = read_exr(p)
    assert np.abs(px - h).max() < 0.01


def test_piz_native_twin_matches_python():
    # the _huf.c kernel must agree with the pure-Python decoder
    # (same pattern as the T1/VP8 twins)
    import os
    from gdal_ray.codecs.exr_piz import _huf_compress, _huf_uncompress
    from gdal_ray.codecs import native
    if native._build("_huf") is None:
        pytest.skip("no C compiler")
    rng = np.random.default_rng(5)
    cases = [rng.integers(0, 60000, 30000).astype(np.uint16),
             np.repeat(rng.integers(0, 50, 300),
                       rng.integers(1, 900, 300)).astype(np.uint16),
             np.zeros(1000, np.uint16)]
    fib = [1, 1]
    for _ in range(24):
        fib.append(fib[-1] + fib[-2])
    cases.append(np.concatenate(
        [np.full(f, i, np.uint16) for i, f in enumerate(fib)]))
    for data in cases:
        enc = _huf_compress(data)
        dec_native = _huf_uncompress(enc, len(data))
        os.environ["GDAL_RAY_NO_NATIVE"] = "1"
        native._CACHE.clear()
        try:
            dec_py = _huf_uncompress(enc, len(data))
        finally:
            del os.environ["GDAL_RAY_NO_NATIVE"]
            native._CACHE.clear()
        assert np.array_equal(dec_native, dec_py)
        assert np.array_equal(dec_native, data)
