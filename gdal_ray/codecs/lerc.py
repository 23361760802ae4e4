"""LERC (Limited Error Raster Compression, Esri) decoder — both the
Lerc1 ``CntZImage`` and the Lerc2 blob layouts, from the published
open format (github.com/Esri/lerc; reference bundles it at
third_party/LercLib and frmts/mrf/LERCV1).

Shared building blocks:
- bit-stuffed uint streams: values packed into little-endian uint32
  words; **pre-Lerc2v3 / Lerc1** order is MSB-first within each word
  (tail bytes trimmed and the stored tail bytes are the word's high
  bytes), **Lerc2 v3+** order is LSB-first within each word.
- byte-RLE: little-endian int16 counts, positive = literal run,
  negative = one byte repeated -count times, -32768 = end marker.
- validity masks: one bit per pixel, MSB-first within bytes.

A blob decodes to a numpy array (h, w) or (h, w, nDim); invalid
pixels are 0 (callers get the mask too when they ask).
"""

from __future__ import annotations

import struct

import numpy as np

_DT = {0: np.int8, 1: np.uint8, 2: np.int16, 3: np.uint16,
       4: np.int32, 5: np.uint32, 6: np.float32, 7: np.float64}
_DT_SIZE = {0: 1, 1: 1, 2: 2, 3: 2, 4: 4, 5: 4, 6: 4, 7: 8}
_DT_FMT = {0: "<b", 1: "<B", 2: "<h", 3: "<H", 4: "<i", 5: "<I",
           6: "<f", 7: "<d"}


def _rle_decompress(buf: bytes, pos: int, out_size: int):
    """Byte RLE shared by both versions -> (bytes, new_pos)."""
    out = bytearray()
    while True:
        cnt = struct.unpack_from("<h", buf, pos)[0]
        pos += 2
        if cnt == -32768:
            break
        if cnt < 0:
            out += buf[pos:pos + 1] * (-cnt)
            pos += 1
        else:
            out += buf[pos:pos + cnt]
            pos += cnt
        if len(out) > out_size:
            raise ValueError("LERC: RLE overrun")
    return bytes(out), pos


def _unstuff_msb(data: bytes, num: int, nbits: int) -> np.ndarray:
    """Pre-Lerc2v3 / Lerc1 bit order: MSB-first within LE uint32
    words, stored tail bytes being the last word's high bytes."""
    nbytes = (num * nbits + 7) // 8
    groups = []
    for i in range(0, nbytes, 4):
        g = data[i:min(i + 4, nbytes)]
        groups.append(g[::-1] + b"\x00" * (4 - len(g)))
    bits = np.unpackbits(np.frombuffer(b"".join(groups), np.uint8))
    vals = bits[:num * nbits].reshape(num, nbits).astype(np.uint64)
    weights = (1 << np.arange(nbits - 1, -1, -1, dtype=np.uint64))
    return (vals * weights).sum(axis=1).astype(np.uint32), nbytes


def _unstuff_lsb(data: bytes, num: int, nbits: int) -> np.ndarray:
    """Lerc2 v3+ bit order: LSB-first across the byte stream."""
    nbytes = (num * nbits + 7) // 8
    bits = np.unpackbits(np.frombuffer(data[:nbytes], np.uint8),
                         bitorder="little")
    vals = bits[:num * nbits].reshape(num, nbits).astype(np.uint64)
    weights = (1 << np.arange(nbits, dtype=np.uint64))
    return (vals * weights).sum(axis=1).astype(np.uint32), nbytes


def _bitstuffer2_decode(buf: bytes, pos: int, max_count: int,
                        version: int):
    """BitStuffer2.Decode -> (uint32 array, new_pos)."""
    hdr = buf[pos]
    pos += 1
    bits67 = hdr >> 6
    nb = 4 if bits67 == 0 else 3 - bits67
    do_lut = bool(hdr & 0x20)
    nbits = hdr & 31
    num = int.from_bytes(buf[pos:pos + nb], "little")
    pos += nb
    if num > max_count:
        raise ValueError("LERC: bitstuffer count overrun")
    unstuff = _unstuff_lsb if version >= 3 else _unstuff_msb
    if not do_lut:
        if nbits == 0:
            return np.zeros(num, np.uint32), pos
        vals, used = unstuff(buf[pos:], num, nbits)
        return vals, pos + used
    if nbits == 0:
        raise ValueError("LERC: zero-bit LUT")
    nlut = buf[pos] - 1
    pos += 1
    lut, used = unstuff(buf[pos:], nlut, nbits)
    pos += used
    nbits_lut = 0
    while nlut >> nbits_lut:
        nbits_lut += 1
    if nbits_lut == 0:
        raise ValueError("LERC: empty LUT")
    idx, used = unstuff(buf[pos:], num, nbits_lut)
    pos += used
    lut = np.concatenate([[np.uint32(0)], lut])
    if idx.max(initial=0) >= len(lut):
        raise ValueError("LERC: LUT index out of range")
    return lut[idx], pos


# ---------------------------------------------------------------- Lerc1
def _lerc1_blockread(buf: bytes, pos: int, max_count: int):
    hdr = buf[pos]
    pos += 1
    n = (4, 2, 1, 0)[hdr >> 6]
    nbits = hdr & 63
    if nbits >= 32 or n == 0:
        raise ValueError("LERC1: bad block header")
    num = int.from_bytes(buf[pos:pos + n], "little")
    pos += n
    if num > max_count:
        raise ValueError("LERC1: block count overrun")
    if nbits == 0:
        return np.zeros(num, np.uint32), pos
    vals, used = _unstuff_msb(buf[pos:], num, nbits)
    return vals, pos + used


def _read_flt(buf: bytes, pos: int, n: int) -> float:
    if n == 4:
        return struct.unpack_from("<f", buf, pos)[0]
    if n == 2:
        return float(struct.unpack_from("<h", buf, pos)[0])
    return float(struct.unpack_from("<b", buf, pos)[0])


def decode_lerc1(buf: bytes, return_mask: bool = False):
    """CntZImage blob -> float32 (h, w), invalid pixels 0."""
    if buf[:10] != b"CntZImage ":
        raise ValueError("not a Lerc1 blob")
    version, typ, h, w = struct.unpack_from("<4i", buf, 10)
    max_err = struct.unpack_from("<d", buf, 26)[0]
    if version != 11 or typ != 8:
        raise ValueError("LERC1: unsupported version/type")
    pos = 34
    mask = np.ones(h * w, bool)
    img = np.zeros((h, w), np.float32)
    for zpart in (False, True):
        ntv, nth, nbytes = struct.unpack_from("<3i", buf, pos)
        maxval = struct.unpack_from("<f", buf, pos + 12)[0]
        pos += 16
        part = buf[pos:pos + nbytes]
        if not zpart:
            if ntv != 0 or nth != 0:
                raise ValueError("LERC1: tiled cnt part")
            if nbytes == 0:
                mask[:] = maxval != 0
            else:
                raw, _ = _rle_decompress(part, 0, (h * w + 7) // 8)
                mask = np.unpackbits(
                    np.frombuffer(raw, np.uint8))[:h * w].astype(bool)
        else:
            _lerc1_tiles(part, img, mask.reshape(h, w), ntv, nth,
                         max_err, maxval)
        pos += nbytes
    img.reshape(-1)[~mask] = 0.0
    if return_mask:
        return img, mask.reshape(h, w)
    return img


def _lerc1_tiles(part: bytes, img: np.ndarray, mask: np.ndarray,
                 ntv: int, nth: int, max_err: float, maxval: float):
    h, w = img.shape
    if ntv == 0 or nth == 0:
        raise ValueError("LERC1: bad z tiling")
    th, tw = h // ntv, w // nth
    if th <= 0 or tw <= 0:
        raise ValueError("LERC1: bad tile size")
    q = 2.0 * max_err
    pos = 0
    for r0 in range(0, h, th):
        r1 = min(h, r0 + th)
        for c0 in range(0, w, tw):
            c1 = min(w, c0 + tw)
            flag = part[pos]
            pos += 1
            n = (4, 2, 1, 0)[flag >> 6]
            flag &= 63
            if n == 0 or flag > 3:
                raise ValueError("LERC1: bad tile flag")
            m = mask[r0:r1, c0:c1]
            blk = img[r0:r1, c0:c1]
            if flag == 2:               # all-zero tile
                blk[:] = 0.0
                continue
            if flag == 0:               # raw floats for valid pixels
                cnt = int(m.sum())
                vals = np.frombuffer(part, "<f4", cnt, pos)
                pos += 4 * cnt
                blk[m] = vals
                continue
            minval = _read_flt(part, pos, n)
            pos += n
            if flag == 3:               # constant tile
                blk[:] = minval
                continue
            vals, pos = _lerc1_blockread(part, pos,
                                         (r1 - r0) * (c1 - c0))
            z = np.minimum(maxval,
                           (minval + q * vals.astype(np.float64))
                           ).astype(np.float32)
            if vals.size == m.size:
                blk[:] = z.reshape(r1 - r0, c1 - c0)
                blk[~m] = 0.0
            else:
                if int(m.sum()) != vals.size:
                    raise ValueError("LERC1: tile count mismatch")
                blk[m] = z


# ---------------------------------------------------------------- Lerc2
def _huffman_decode(buf: bytes, pos: int, version: int, n_symbols: int,
                    delta: bool, h: int, w: int, mask, dt: int):
    """Huffman / delta-Huffman path for byte images."""
    hver, size, i0, i1 = struct.unpack_from("<4i", buf, pos)
    pos += 16
    if hver < 2 or size <= 0 or i0 >= i1:
        raise ValueError("LERC2: bad huffman table")
    lengths, pos = _bitstuffer2_decode(buf, pos, i1 - i0, version)
    # codes, MSB-first within LE uint32 words
    code_len = {}
    total_bits = 0
    for i in range(i0, i1):
        ln = int(lengths[i - i0])
        if ln > 0:
            k = i - size if i >= size else i
            code_len[k] = ln
            total_bits += ln
    n_words = (total_bits + 31) // 32
    stream = buf[pos:pos + n_words * 4]
    stream += b"\x00" * (n_words * 4 - len(stream))
    grp = np.frombuffer(stream, np.uint8).reshape(-1, 4)[:, ::-1]
    bits = np.unpackbits(grp.reshape(-1))
    bp = 0
    table = {}
    for i in range(i0, i1):
        k = i - size if i >= size else i
        ln = code_len.get(k, 0)
        if ln > 0:
            code = 0
            for b in bits[bp:bp + ln]:
                code = (code << 1) | int(b)
            table[(ln, code)] = k
            bp += ln
    pos += ((bp + 31) // 32) * 4

    # data bit stream (same word order)
    rest = buf[pos:]
    rest += b"\x00" * ((-len(rest)) % 4)
    grp = np.frombuffer(rest, np.uint8).reshape(-1, 4)[:, ::-1]
    bits = grp.reshape(-1)
    bitarr = np.unpackbits(bits)
    min_len = min(ln for ln, _ in table)
    max_len = max(ln for ln, _ in table)
    out = np.zeros(n_symbols, np.int64)
    bp = 0
    nbits_total = len(bitarr)
    blist = bitarr.tolist()
    for si in range(n_symbols):
        code = 0
        ln = 0
        while True:
            if bp >= nbits_total:
                raise ValueError("LERC2: huffman overrun")
            code = (code << 1) | blist[bp]
            bp += 1
            ln += 1
            if ln >= min_len and (ln, code) in table:
                out[si] = table[(ln, code)]
                break
            if ln > max_len:
                raise ValueError("LERC2: bad huffman code")
    offset = 128 if dt == 0 else 0
    vals = out - offset
    if delta:
        data = np.zeros((h, w), np.int64)
        v = vals.reshape(h, w)
        col0 = np.cumsum(v[:, 0]) % 256
        rows = np.cumsum(v, axis=1)
        data = (rows - v[:, :1] + col0[:, None]) % 256
        return data.astype(_DT[dt])
    return (vals % 256).astype(_DT[dt]).reshape(h, w)


def decode_lerc2(buf: bytes, return_mask: bool = False):
    """Lerc2 blob (versions 2-5, nDim >= 1) -> array (h, w[, nDim])."""
    if buf[:6] != b"Lerc2 ":
        raise ValueError("not a Lerc2 blob")
    pos = 6
    version = struct.unpack_from("<i", buf, pos)[0]
    pos += 4
    if version >= 3:
        pos += 4                      # fletcher32 checksum, not verified
    n_ints = 7 if version >= 4 else 6
    ints = struct.unpack_from(f"<{n_ints}i", buf, pos)
    pos += 4 * n_ints
    max_err, zmin, zmax = struct.unpack_from("<3d", buf, pos)
    pos += 24
    i = 0
    h = ints[i]; i += 1
    w = ints[i]; i += 1
    ndim = ints[i] if version >= 4 else 1
    if version >= 4:
        i += 1
    nvalid = ints[i]; i += 1
    mbs = ints[i]; i += 1
    i += 1                            # blobSize
    dt = ints[i]
    if dt not in _DT:
        raise ValueError("LERC2: bad data type")
    dtype = _DT[dt]

    # mask
    nbytes_mask = struct.unpack_from("<i", buf, pos)[0]
    pos += 4
    if nvalid == 0:
        mask = np.zeros(h * w, bool)
    elif nvalid == h * w:
        mask = np.ones(h * w, bool)
    else:
        raw, _ = _rle_decompress(buf, pos, (h * w + 7) // 8)
        mask = np.unpackbits(
            np.frombuffer(raw, np.uint8))[:h * w].astype(bool)
    pos += max(nbytes_mask, 0)
    mask2 = mask.reshape(h, w)

    out = np.zeros((h, w, ndim), dtype)
    if nvalid == 0:
        return _lerc2_done(out, mask2, ndim, return_mask)
    if zmin == zmax:                  # constant image
        out[mask2] = dtype(zmin)
        return _lerc2_done(out, mask2, ndim, return_mask)
    zmins = [zmin] * ndim
    zmaxs = [zmax] * ndim
    if version >= 4:
        fmt = _DT_FMT[dt][1]
        zmins = list(struct.unpack_from(f"<{ndim}{fmt}", buf, pos))
        pos += ndim * _DT_SIZE[dt]
        zmaxs = list(struct.unpack_from(f"<{ndim}{fmt}", buf, pos))
        pos += ndim * _DT_SIZE[dt]
        if all(a == b for a, b in zip(zmins, zmaxs)):
            for d in range(ndim):
                out[:, :, d][mask2] = dtype(zmins[d])
            return _lerc2_done(out, mask2, ndim, return_mask)

    one_sweep = buf[pos]
    pos += 1
    if one_sweep:
        vals = np.frombuffer(buf, np.dtype(dtype).newbyteorder("<"),
                             nvalid * ndim, pos)
        out[mask2] = vals.reshape(nvalid, ndim)
        return _lerc2_done(out, mask2, ndim, return_mask)

    try_huffman = version > 1 and dt in (0, 1) and max_err == 0.5
    if try_huffman:
        flag = buf[pos]
        pos += 1
        if flag in (1, 2):
            if nvalid != h * w:
                raise ValueError("LERC2: masked huffman unsupported")
            img = _huffman_decode(buf, pos, version, h * w * ndim,
                                  flag == 1, h, w, mask2, dt)
            out[:, :, 0] = img
            return _lerc2_done(out, mask2, ndim, return_mask)

    # tiled
    ntv = (h + mbs - 1) // mbs
    nth = (w + mbs - 1) // mbs
    for it in range(ntv):
        i0 = it * mbs
        i1 = min(h, i0 + mbs)
        for jt in range(nth):
            j0 = jt * mbs
            j1 = min(w, j0 + mbs)
            for d in range(ndim):
                pos = _lerc2_tile(buf, pos, out, mask2, i0, i1, j0, j1,
                                  d, dt, max_err, zmaxs[d], version)
    return _lerc2_done(out, mask2, ndim, return_mask)


def _lerc2_done(out, mask2, ndim, return_mask):
    if ndim == 1:
        out = out[:, :, 0]
    if return_mask:
        return out, mask2
    return out


def _dt_used(dt: int, tc: int) -> int:
    if tc == 0:
        return dt
    if dt in (2, 4):                  # short / int
        return dt - tc
    if dt in (3, 5):                  # ushort / uint
        return dt - 2 * tc
    if dt == 6:                       # float
        return 2 if tc == 1 else 1
    if dt == 7:                       # double
        return dt - 2 * tc + 1
    return dt


def _lerc2_tile(buf, pos, out, mask2, i0, i1, j0, j1, d, dt, max_err,
                zmax, version):
    flag = buf[pos]
    pos += 1
    bits67 = flag >> 6
    if ((flag >> 2) & 15) != ((j0 >> 3) & 15):
        raise ValueError("LERC2: tile integrity check failed")
    flag &= 3
    dtype = _DT[dt]
    blk = out[i0:i1, j0:j1, d]
    m = mask2[i0:i1, j0:j1]
    if flag == 2:                     # constant 0
        blk[m] = 0
        return pos
    if flag == 0:                     # raw values for valid pixels
        cnt = int(m.sum())
        vals = np.frombuffer(buf, np.dtype(dtype).newbyteorder("<"),
                             cnt, pos)
        blk[m] = vals
        return pos + cnt * _DT_SIZE[dt]
    du = _dt_used(dt, bits67)
    offset = struct.unpack_from(_DT_FMT[du], buf, pos)[0]
    pos += _DT_SIZE[du]
    if flag == 3:                     # constant offset
        blk[m] = dtype(offset)
        return pos
    max_count = (i1 - i0) * (j1 - j0)
    vals, pos = _bitstuffer2_decode(buf, pos, max_count, version)
    inv_scale = 2.0 * max_err
    z = offset + vals.astype(np.float64) * inv_scale
    z = np.minimum(z, zmax)
    if vals.size == max_count:
        blk[:] = z.reshape(i1 - i0, j1 - j0).astype(dtype)
        blk[~m] = 0
    else:
        if int(m.sum()) != vals.size:
            raise ValueError("LERC2: tile count mismatch")
        blk[m] = z.astype(dtype)
    return pos


def decode_lerc(buf: bytes, return_mask: bool = False):
    """Dispatch on the blob magic."""
    if buf[:10] == b"CntZImage ":
        return decode_lerc1(buf, return_mask)
    if buf[:6] == b"Lerc2 ":
        return decode_lerc2(buf, return_mask)
    raise ValueError("not a LERC blob")
