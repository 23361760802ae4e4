"""JPEG 2000 decoder (codecs/jp2.py) — reference-fixture goldens.

Expectations from autotest/gdrivers/jp2openjpeg.py and the fixtures'
construction (byte_lossless_openjp2_golden.jp2 is a lossless encode of
gcore byte.tif, jp2openjpeg.py:3928)."""

import numpy as np
import pytest

from gdal_ray.codecs.gtiff import decode_gtiff
from gdal_ray.codecs.jp2 import decode_jp2, sniff_jp2
from gdal_ray.core.checksum import checksum

D = "/root/reference/autotest/gdrivers/data/jpeg2000"
G = "/root/reference/autotest/gcore/data"


def cs(a):
    return int(checksum(np.asarray(a, np.float64)))


def jp2(name):
    return decode_jp2(open(f"{D}/{name}", "rb").read())


class TestLosslessGoldens:
    def test_no_dwt_bit_equal_to_source(self):
        """byte_lossless_openjp2_golden.jp2 = lossless encode of
        byte.tif (no decomposition levels): bit-equal decode."""
        want = decode_gtiff(open(f"{G}/byte.tif", "rb").read()).pixels
        px, gt, nd, meta = jp2("byte_lossless_openjp2_golden.jp2")
        np.testing.assert_array_equal(px, want)

    def test_multitile_origin_offset(self):
        """50×60 canvas, 20×20 tiles, non-zero image origin, 1-level
        5/3 — decodes to byte.tif (checksum 4672)."""
        px, *_ = jp2("byte_image_origin_not_zero.jp2")
        assert px.shape == (20, 20)
        assert cs(px) == 4672

    def test_five_levels_twelve_layers_pcrl(self):
        """int16_lossless.jp2: 5 levels, 12 layers, per-resolution
        precincts, PCRL progression — lossless (4672, = int16.tif)."""
        want = decode_gtiff(open(f"{G}/int16.tif", "rb").read()).pixels
        px, *_ = jp2("int16_lossless.jp2")
        assert px.dtype == np.int16
        np.testing.assert_array_equal(px, want)

    def test_byte_jp2_reference_checksum(self):
        """jp2openjpeg.py: byte.jp2 → checksum 50054; GeoJP2 uuid
        georeferencing (NAD27 UTM 11N)."""
        px, gt, nd, meta = jp2("byte.jp2")
        assert cs(px) == 50054
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert meta["crs"] == "EPSG:26711"

    def test_multiple_tile_parts_rlcp(self):
        """byte_tlm_plt.jp2: two tile columns, multiple tile-parts per
        tile (TLM/PLT present), RLCP, 2 layers — lossless 4672."""
        px, *_ = jp2("byte_tlm_plt.jp2")
        assert cs(px) == 4672

    def test_truncated_reversible_midpoint(self):
        """byte_tile_2048.jp2 is a TRUNCATED reversible stream: the
        per-coefficient midpoint reconstruction must reproduce the
        reference's checksum 4610 (jp2openjpeg tests)."""
        px, *_ = jp2("byte_tile_2048.jp2")
        assert cs(px) == 4610

    def test_13bit_rct_rpcl_four_bands(self):
        """3_13bit_and_1bit.jp2: RPCL progression, reversible RCT over
        three 13-bit bands + a 1-bit band — the reference's exact band
        checksums (jp2openjpeg.py:234)."""
        px, *_ = jp2("3_13bit_and_1bit.jp2")
        assert px.shape == (308, 202, 4)
        assert px.dtype == np.uint16
        want = [64570, 57277, 56048, 61292]
        assert [cs(px[:, :, k]) for k in range(4)] == want

    def test_rgbwcmyk_kakadu_rct(self):
        """Kakadu-encoded reversible RCT RGB — decodes losslessly and
        deterministically (800×100, 5 levels, no precincts)."""
        px, *_ = jp2("rgbwcmyk01_YeGeo_kakadu.jp2")
        assert px.shape == (100, 800, 3)
        # the image is 8 constant 100x100 color patches
        patches = px.reshape(100, 8, 100, 3)
        for k in range(8):
            block = patches[:, k]
            assert (block == block[0, 0]).all(), k


class TestLossy97:
    def test_int16_97_close_to_source(self):
        """int16.jp2 (9/7 lossy): the reference gates with
        compare_ds maxdiff; our decode stays within a few counts."""
        want = decode_gtiff(open(f"{G}/int16.tif", "rb").read()) \
            .pixels.astype(np.int64)
        px, *_ = jp2("int16.jp2")
        d = np.abs(px.astype(np.int64) - want)
        assert d.max() <= 10
        assert d.mean() < 2.0

    def test_513x513_multitile_97(self):
        """Odd dimensions, 256×256 tiles, 9/7: the fixture is constant
        gray — the reference's overview checksum 29642 equals a
        constant-127 257×257 plane, and full-res must decode to that
        same constant."""
        px, *_ = jp2("513x513.jp2")
        assert px.shape == (513, 513)
        assert (px == 127).all()

    def test_stefan_rgba_ict(self):
        """stefan_full_rgba.jp2: 9/7 + irreversible ICT + alpha."""
        px, *_ = jp2("stefan_full_rgba.jp2")
        assert px.shape == (150, 162, 4)
        # alpha plane is effectively binary content
        assert px[:, :, 3].max() > 200


class TestPlumbing:
    def test_sniff_and_codec_registry(self):
        buf = open(f"{D}/byte.jp2", "rb").read()
        assert sniff_jp2(buf)
        from gdal_ray.codecs import decode
        px = decode(buf)
        assert px.shape[:2] == (100, 100)

    def test_read_raster_route(self):
        from gdal_ray.sources.raster import read_raster
        px, gt, nd, meta = read_raster(f"{D}/byte.jp2")
        assert cs(px) == 50054
        assert gt is not None

    def test_unsupported_named(self):
        with pytest.raises(ValueError, match="codestream|JPEG2000"):
            decode_jp2(b"\x00" * 64)


class TestEncoder:
    def test_mq_coder_long_stream_roundtrip(self):
        """MQ encoder ↔ decoder over long skewed streams (exercises
        renorm, carry propagation into 0xFF stuffing, and flush)."""
        from gdal_ray.codecs.jp2 import MQDecoder, MQEncoder
        rng = np.random.default_rng(11)
        for p in (0.5, 0.95, 0.05):
            n = 30000
            cxs = rng.integers(0, 19, n)
            bits = (rng.random(n) < p).astype(int)
            enc = MQEncoder()
            for c, b in zip(cxs, bits):
                enc.encode(int(c), int(b))
            dec = MQDecoder(enc.flush())
            assert [dec.decode(int(c)) for c in cxs] == list(bits)

    @pytest.mark.parametrize("shape,lev,dt,lohi", [
        ((20, 20), 0, np.uint8, (0, 256)),
        ((70, 90), 2, np.uint8, (0, 256)),
        ((150, 200), 2, np.uint8, (0, 256)),     # multi-block bands
        ((65, 129), 3, np.int16, (-30000, 30000)),
        ((40, 50, 3), 1, np.uint16, (0, 65536)),
    ])
    def test_lossless_roundtrip(self, shape, lev, dt, lohi):
        from gdal_ray.codecs.jp2 import encode_jp2
        rng = np.random.default_rng(sum(shape) + lev)
        px = rng.integers(*lohi, shape).astype(dt)
        back, gt, nd, meta = decode_jp2(encode_jp2(px, levels=lev))
        np.testing.assert_array_equal(back.squeeze(), px.squeeze())

    def test_flat_image_excluded_blocks(self):
        """All-zero subband code-blocks are excluded via the inclusion
        tag tree (not encoded with zero passes)."""
        from gdal_ray.codecs.jp2 import encode_jp2
        px = np.full((100, 100), 9, np.uint8)
        px[40:60, 40:60] = 200
        back, *_ = decode_jp2(encode_jp2(px, levels=2))
        np.testing.assert_array_equal(back.squeeze(), px)

    def test_geojp2_roundtrip(self):
        from gdal_ray.codecs.jp2 import encode_jp2
        px = np.arange(400, dtype=np.uint8).reshape(20, 20) % 256
        gt = (100.0, 2.5, 0.0, 900.0, 0.0, -2.5)
        buf = encode_jp2(px, geotransform=gt, crs="EPSG:3857")
        back, gt2, nd, meta = decode_jp2(buf)
        np.testing.assert_array_equal(back.squeeze(), px)
        assert gt2 == gt
        assert meta["crs"] == "EPSG:3857"


class TestNativeT1Parity:
    """codecs/_t1.c is a transcription of the Python T1 — assert the
    two produce identical bytes/coefficients on random blocks."""

    def test_encode_decode_match_python(self, monkeypatch):
        import gdal_ray.codecs.native as native
        from gdal_ray.codecs import jp2
        if native.get_t1() is None:
            pytest.skip("no C compiler in environment")
        rng = np.random.default_rng(7)
        for (h, w, band, mb) in [(64, 64, 0, 9), (13, 17, 3, 11),
                                 (32, 64, 1, 8), (4, 4, 2, 6),
                                 (64, 64, 2, 12)]:
            coef = (rng.normal(0, 40, (h, w))).astype(np.int64)
            coef[rng.random((h, w)) < 0.5] = 0
            # native path (default)
            data_n, np_n, miss_n = jp2.encode_codeblock(coef, band, mb)
            dec_n = jp2.decode_codeblock(data_n, w, h, np_n,
                                         miss_n, mb, band)
            # force the pure-Python twin
            monkeypatch.setitem(native._CACHE, "_t1", False)
            data_p, np_p, miss_p = jp2.encode_codeblock(coef, band, mb)
            dec_p = jp2.decode_codeblock(data_p, w, h, np_p,
                                         miss_p, mb, band)
            monkeypatch.delitem(native._CACHE, "_t1", raising=False)
            assert data_n == data_p, (h, w, band)
            assert (np_n, miss_n) == (np_p, miss_p)
            np.testing.assert_array_equal(dec_n, dec_p)
            np.testing.assert_array_equal(dec_n, coef)


class TestLossyEncode:
    """9/7 irreversible write path: scalar-expounded quantization
    weighted by numerically-computed synthesis norms; components > 0
    carry explicit COC + QCC (exercising the reader's per-component
    paths)."""

    def _img(self, n=200):
        rng = np.random.default_rng(2)
        x = np.linspace(0, 6, n)
        return ((np.sin(x)[:, None] * np.cos(x)[None, :] + 1) * 100
                + rng.normal(0, 4, (n, n))).clip(0, 255).astype(np.uint8)

    @staticmethod
    def _psnr(a, b):
        mse = float(((np.clip(a, 0, 255).astype(np.float64)
                      - b.astype(np.float64)) ** 2).mean())
        return 10 * np.log10(255 ** 2 / max(mse, 1e-12))

    def test_psnr_gate_and_size(self):
        img = self._img()
        from gdal_ray.codecs.jp2 import encode_j2k, decode_j2k
        lossless = encode_j2k([img], levels=2)
        cs = encode_j2k([img], levels=2, lossy=True, quality=50)
        out = decode_j2k(cs)[0]
        assert self._psnr(out, img) >= 45.0
        cs20 = encode_j2k([img], levels=2, lossy=True, quality=20)
        assert self._psnr(decode_j2k(cs20)[0], img) >= 35.0
        assert len(cs20) < len(cs) < len(lossless)

    def test_multiband_coc_qcc(self):
        from gdal_ray.codecs.jp2 import encode_j2k, decode_j2k
        img = self._img()
        rgb = [img, np.roll(img, 7, axis=0), np.roll(img, 13, axis=1)]
        cs = encode_j2k(rgb, levels=2, lossy=True, quality=45)
        assert b"\xff\x53" in cs and b"\xff\x5d" in cs  # COC + QCC
        outs = decode_j2k(cs)
        for o, b in zip(outs, rgb):
            assert self._psnr(o, b) >= 42.0

    def test_jp2_container_lossy(self):
        from gdal_ray.codecs.jp2 import decode_jp2, encode_jp2
        img = self._img(96)
        buf = encode_jp2(img, geotransform=(100, 2, 0, 500, 0, -2),
                         lossy=True, quality=50)
        px, gt, nd, meta = decode_jp2(buf)
        assert gt == (100, 2, 0, 500, 0, -2)
        assert self._psnr(np.asarray(px).squeeze(), img) >= 45.0

    def test_uint16_lossy(self):
        from gdal_ray.codecs.jp2 import encode_j2k, decode_j2k
        img = (self._img().astype(np.uint16) * 257)
        cs = encode_j2k([img], levels=2, lossy=True, quality=50)
        out = decode_j2k(cs)[0]
        err = np.abs(out - img.astype(np.float64)).mean()
        assert err < 257 * 3  # within ~3 8-bit-equivalent levels
