"""RIK reader — synthetic fixtures for all four block encodings,
layouts per frmts/rik/rikdataset.cpp."""

import struct
import zlib

import numpy as np
import pytest

from gdal_ray.codecs.rik import decode_rik


def _rik2_header(name, bounds, mpp, bw, bh, hb, vb, options):
    south, west, north, east = bounds
    out = bytearray()
    out += struct.pack("<H", len(name)) + name.encode()
    out += struct.pack("<H", 0)  # iUnknown
    out += struct.pack("<dddd", south, west, north, east)
    out += struct.pack("<I", 50000)  # scale
    out += struct.pack("<f", mpp)
    out += struct.pack("<III", bw, bh, hb)
    out += struct.pack("<I", vb)
    out += bytes([8, options])
    return out


def _palette():
    pal = bytearray()
    for i in range(256):
        pal += bytes([i, (i * 2) % 256, (i * 3) % 256])  # B, G, R
    return pal


def _blocks_img(rng, vb, bh, hb, bw):
    return rng.integers(0, 256, (vb * bh, hb * bw), dtype=np.uint8)


def test_uncompressed():
    rng = np.random.default_rng(0)
    bw = bh = 16
    hb, vb = 2, 2
    img = _blocks_img(rng, vb, bh, hb, bw)
    body = bytearray()
    for bi in range(hb * vb):
        by, bx = divmod(bi, hb)
        body += img[by * bh:(by + 1) * bh,
                    bx * bw:(bx + 1) * bw].tobytes()
    buf = (_rik2_header("t", (6000000, 1400000, 6000000 + vb * bh,
                              1400000 + hb * bw), 1.0, bw, bh, hb, vb,
                        0x00)
           + _palette() + body)
    px, gt, nd, meta = decode_rik(bytes(buf))
    assert np.array_equal(px, img)
    assert gt[1] == 1.0 and gt[5] == -1.0
    assert gt[0] == pytest.approx(1400000 - 0.5)
    assert meta["palette"][10].tolist() == [30, 20, 10]  # RGB from BGR
    assert "3021" in meta["crs"]


def _with_offsets(header, payloads):
    pal = _palette()
    base = len(header) + len(pal) + 4 * len(payloads)
    offsets = []
    pos = base
    for p in payloads:
        offsets.append(pos)
        pos += len(p)
    out = bytearray(header) + pal
    for o in offsets:
        out += struct.pack("<I", o)
    for p in payloads:
        out += p
    return bytes(out)


def test_rle():
    bw = bh = 12
    img = np.zeros((bh, bw), dtype=np.uint8)
    img[:6] = 7
    img[6:] = 200
    # RLE byte pairs: (count-1, value)
    payload = b""
    remaining = bw * bh
    half = bw * 6
    payload += bytes([half - 1 if half <= 256 else 255, 7])
    if half > 256:
        payload += bytes([half - 257, 7])
    payload += bytes([255, 200]) if remaining - half > 256 else b""
    # simpler: runs of <=256
    runs = []
    flat = img.reshape(-1)
    i = 0
    payload = b""
    while i < len(flat):
        j = i
        while j < len(flat) and flat[j] == flat[i] and j - i < 256:
            j += 1
        payload += bytes([j - i - 1, flat[i]])
        i = j
    buf = _with_offsets(
        _rik2_header("t", (6000000, 1400000, 6000012, 1400012),
                     1.0, bw, bh, 1, 1, 0x01), [payload])
    px, gt, nd, meta = decode_rik(buf)
    assert np.array_equal(px, img)


def test_zlib_upside_down():
    rng = np.random.default_rng(3)
    bw = bh = 10
    img = rng.integers(0, 255, (bh, bw), dtype=np.uint8)
    payload = zlib.compress(img[::-1].tobytes())
    buf = _with_offsets(
        _rik2_header("t", (6000000, 1400000, 6000010, 1400010),
                     1.0, bw, bh, 1, 1, 0x0D), [payload])
    px, _, _, _ = decode_rik(buf)
    assert np.array_equal(px, img)


def _lzw_encode_literals(pixels, max_bits=13):
    """Literal-only LZW stream readable by the driver's decoder: the
    decoder grows its table by itself, so code width follows
    lastAdded; realign to the group boundary on width change."""
    out = bytearray([0, 0, 0, 0, max_bits])  # no clear code
    bitbuf = 0
    nbits = 0
    code_bits = 9
    last_added = 255
    align = 5

    def flush_to(pos_target):
        nonlocal bitbuf, nbits
        while nbits > 0 or len(out) < pos_target:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits = max(0, nbits - 8)

    emitted = 0
    for pix in pixels:
        if len(out) == align:
            align += code_bits
        bitbuf |= int(pix) << nbits
        nbits += code_bits
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8
        if emitted > 0:  # decoder adds a code per emitted symbol
            last_added += 1
            if last_added == (1 << code_bits) - 1 and \
                    code_bits != max_bits:
                # decoder realigns: pad to group boundary
                if nbits:
                    out.append(bitbuf & 0xFF)
                    bitbuf = 0
                    nbits = 0
                while len(out) < align:
                    out.append(0)
                code_bits += 1
        emitted += 1
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def test_lzw_bottom_up():
    rng = np.random.default_rng(4)
    bw = bh = 12  # width already 4-aligned -> lineBreak == width
    img = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
    # emission order: bottom line first
    stream = np.concatenate([img[y] for y in range(bh - 1, -1, -1)])
    payload = _lzw_encode_literals(stream)
    buf = _with_offsets(
        _rik2_header("t", (6000000, 1400000, 6000012, 1400012),
                     1.0, bw, bh, 1, 1, 0x0B), [payload])
    px, _, _, _ = decode_rik(buf)
    assert np.array_equal(px, img)


def test_dispatch(tmp_path):
    from gdal_ray.sources.raster import read_raster
    rng = np.random.default_rng(5)
    bw = bh = 16
    img = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
    buf = (_rik2_header("m", (6000000, 1400000, 6000016, 1400016),
                        1.0, bw, bh, 1, 1, 0x00)
           + _palette() + bytearray(img.tobytes()))
    p = str(tmp_path / "map.rik")
    open(p, "wb").write(bytes(buf))
    px, gt, nd, meta = read_raster(p)
    assert meta["driver"] == "RIK"
    assert np.array_equal(px, img)
