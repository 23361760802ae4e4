"""Property-based fuzz over the round-3 codecs: every encoder/decoder
pair must roundtrip arbitrary payloads exactly (lossless formats) and
reject corrupt headers with ValueError, never hang or return garbage
shapes."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

dims = st.integers(min_value=1, max_value=40)
small_dims = st.integers(min_value=2, max_value=24)


class TestNetcdfFuzz:
    @settings(max_examples=25, deadline=None)
    @given(h=dims, w=dims,
           dtype=st.sampled_from(["uint8", "int16", "int32", "float64",
                                  "uint16", "int64"]),
           bottom_up=st.booleans(), seed=st.integers(0, 2**31))
    def test_roundtrip(self, h, w, dtype, bottom_up, seed):
        from gdal_ray.codecs.netcdf import decode_netcdf, encode_netcdf
        rng = np.random.default_rng(seed)
        a = (rng.random((h, w)) * 200 - 100).astype(dtype)
        gt = (float(rng.integers(-100, 100)), 2.0, 0.0,
              float(rng.integers(-100, 100)), 0.0, -3.0)
        px, gt2, nd, meta = decode_netcdf(
            encode_netcdf(a, gt, bottom_up=bottom_up))
        assert np.array_equal(px, a) and px.dtype == a.dtype
        assert gt2 == gt

    @settings(max_examples=15, deadline=None)
    @given(junk=st.binary(min_size=4, max_size=64))
    def test_junk_rejected(self, junk):
        from gdal_ray.codecs.netcdf import decode_netcdf
        if junk[:3] == b"CDF" and junk[3:4] in (b"\x01", b"\x02", b"\x05"):
            return                           # a random valid magic
        with pytest.raises(ValueError):
            decode_netcdf(junk)


class TestGifFuzz:
    @settings(max_examples=20, deadline=None)
    @given(h=small_dims, w=small_dims, ncol=st.integers(2, 256),
           seed=st.integers(0, 2**31))
    def test_roundtrip(self, h, w, ncol, seed):
        from gdal_ray.codecs.gif import decode_gif, encode_gif
        rng = np.random.default_rng(seed)
        a = rng.integers(0, ncol, (h, w)).astype(np.uint8)
        pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
        b, p, _ = decode_gif(encode_gif(a, pal))
        assert np.array_equal(a, b)
        assert np.array_equal(p[:ncol], pal)


class TestWavFuzz:
    @settings(max_examples=20, deadline=None)
    @given(n=st.integers(1, 3000), ch=st.integers(1, 3),
           bits=st.sampled_from([8, 16, 24, 32, -32]),
           seed=st.integers(0, 2**31))
    def test_roundtrip_within_quantization(self, n, ch, bits, seed):
        from gdal_ray.codecs.wav import decode_wav, encode_wav
        rng = np.random.default_rng(seed)
        pcm = rng.uniform(-0.99, 0.99, (n, ch))
        out, sr = decode_wav(encode_wav(pcm, 44100, bits))
        assert out.shape == (n, ch) and sr == 44100
        tol = {8: 1 / 128, 16: 1 / 32768, 24: 1 / (1 << 23),
               32: 1 / (1 << 31), -32: 1e-7}[bits]
        assert np.abs(out - pcm).max() <= tol


class TestAaigridFuzz:
    @settings(max_examples=20, deadline=None)
    @given(h=small_dims, w=small_dims, is_float=st.booleans(),
           seed=st.integers(0, 2**31))
    def test_roundtrip(self, h, w, is_float, seed):
        from gdal_ray.codecs.aaigrid import decode_aaigrid, encode_aaigrid
        rng = np.random.default_rng(seed)
        if is_float:
            a = (rng.random((h, w)) * 100 - 50)
        else:
            a = rng.integers(-1000, 1000, (h, w)).astype(np.int32)
        gt = (float(rng.integers(-10, 10)), 5.0, 0.0,
              float(rng.integers(-10, 10)), 0.0, -5.0)
        px, gt2, _ = decode_aaigrid(encode_aaigrid(a, gt))
        assert np.array_equal(px, a)         # repr() floats are exact
        assert gt2 == gt


class TestProgressiveJpegFuzz:
    @settings(max_examples=10, deadline=None)
    @given(h=st.integers(8, 50), w=st.integers(8, 50),
           color=st.booleans(), q=st.integers(40, 98),
           seed=st.integers(0, 2**31))
    def test_progressive_equals_baseline(self, h, w, color, q, seed):
        from gdal_ray.codecs import jpeg
        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if color else (h, w)
        img = (rng.random(shape) * 255).astype(np.uint8)
        base = jpeg.decode(jpeg.encode(img, q))
        prog = jpeg.decode(jpeg.encode(img, q, progressive=True))
        assert np.array_equal(base, prog)


class TestGpxMifFuzz:
    @settings(max_examples=10, deadline=None)
    @given(n=st.integers(1, 12), seed=st.integers(0, 2**31))
    def test_gpx_waypoint_roundtrip(self, n, seed, tmp_path_factory):
        import pyarrow as pa
        from gdal_ray.core import wkb as W
        from gdal_ray.sources.gpx import read_gpx_table, write_gpx
        rng = np.random.default_rng(seed)
        xs = rng.uniform(-180, 180, n)
        ys = rng.uniform(-90, 90, n)
        t = pa.table({
            "name": pa.array([f"w{i}" for i in range(n)], pa.string()),
            "wkb": pa.array([W.dumps(W.point(x, y))
                             for x, y in zip(xs, ys)], pa.binary())})
        p = str(tmp_path_factory.mktemp("gpxf") / "f.gpx")
        write_gpx(t, p)
        back = read_gpx_table(p, "waypoints")
        assert back.num_rows == n
        for i in range(n):
            g = W.loads(back["wkb"][i].as_py())
            assert g.coords[0, 0] == pytest.approx(xs[i], abs=0)
            assert g.coords[0, 1] == pytest.approx(ys[i], abs=0)


class TestPngExtended:
    def test_interlaced_16bit_golden(self):
        # the reference's own Adam7 + 16-bit fixture: byte.tif content
        # (autotest/gdrivers/png.py:565 → checksum 4672)
        from gdal_ray.codecs.png import decode
        from gdal_ray.core.checksum import checksum
        px = decode(open("/root/reference/autotest/gdrivers/data/png/"
                         "uint16_interlaced.png", "rb").read())
        assert px.dtype == np.uint16 and px.shape == (20, 20, 1)
        assert checksum(px[:, :, 0]) == 4672

    @settings(max_examples=15, deadline=None)
    @given(h=dims, w=dims, nb=st.sampled_from([1, 2, 3, 4]),
           seed=st.integers(0, 2**31))
    def test_8bit_roundtrip(self, h, w, nb, seed):
        from gdal_ray.codecs.png import decode, encode
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, (h, w, nb)).astype(np.uint8)
        assert np.array_equal(decode(encode(a)), a)
