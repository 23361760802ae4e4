

def test_palette_png():
    # color type 3 + tRNS, 8-bit indices exposed as band 1
    # (reference png.py test_png_1: checksum 57921)
    from gdal_ray.codecs.png import decode
    from gdal_ray.core.checksum import checksum
    px = decode(open("/root/reference/autotest/gdrivers/data/png/"
                     "test.png", "rb").read())
    assert px.shape == (400, 400, 1)
    assert checksum(px[:, :, 0]) == 57921


def test_subbyte_png_roundtrip_via_bits():
    # 1/2/4-bit grayscale rows unpack MSB-first after unfiltering
    import struct
    import zlib
    import numpy as np
    from gdal_ray.codecs.png import decode
    rng = np.random.default_rng(0)
    for depth in (1, 2, 4):
        w, h = 13, 7
        vals = rng.integers(0, 1 << depth, (h, w)).astype(np.uint8)
        rb = (w * depth + 7) // 8
        rows = b""
        for r in range(h):
            bits = np.unpackbits(vals[r][:, None], axis=1,
                                 count=8)[:, 8 - depth:]
            packed = np.packbits(bits.ravel())
            rows += b"\x00" + packed[:rb].tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
        def chunk(tag, data):
            c = tag + data
            return struct.pack(">I", len(data)) + c + \
                struct.pack(">I", zlib.crc32(c))
        buf = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(rows))
               + chunk(b"IEND", b""))
        out = decode(buf)
        assert np.array_equal(out[:, :, 0], vals), depth
