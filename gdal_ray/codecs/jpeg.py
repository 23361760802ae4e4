"""Baseline JPEG (JFIF) decoder + encoder — pure Python/numpy.

Independently implements ITU-T T.81 baseline sequential DCT (the
public JPEG standard): SOF0, Huffman entropy coding, 8-bit quantization
tables, restart intervals, 4:4:4 / 4:2:2 / 4:2:0 chroma sampling,
JFIF YCbCr. The reference reads JPEG via libjpeg
(frmts/jpeg/jpgdataset.cpp); bit-exact IDCT parity across
implementations is NOT defined by the standard (the reference's own
test suite accepts multiple checksums per libjpeg version,
autotest/gdrivers/jpeg.py:43-47), so conformance here is validated by
(a) decoding the reference's fixture files and (b) encoder→decoder
roundtrip PSNR ≥ 40 dB, the lossy-format invariant from BASELINE.json.

Performance notes: Huffman decode walks symbols in Python with a
16-bit peek LUT (O(1) per symbol); dequant + IDCT run vectorized over
all blocks at once (matmul IDCT). Good enough for tests and per-file
decode; the synthetic corpus's hot path keeps the vectorized GRJ1
stand-in (dct.py) for generation speed.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order (T.81 Figure A.6)
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])
_UNZZ = np.argsort(_ZZ)

# 8x8 DCT-II basis (orthonormal)
_k = np.arange(8)
_C = np.sqrt(2.0 / 8.0) * np.cos((2 * _k[None, :] + 1) * _k[:, None]
                                 * np.pi / 16.0)
_C[0] *= np.sqrt(0.5)

# Annex K.1 quantization tables
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _canonical_codes(bits, values):
    """(bits[16], values) → list of (code, length, symbol)."""
    out = []
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((code, length, values[vi]))
            code += 1
            vi += 1
        code <<= 1
    return out


def _decode_lut(bits, values):
    """16-bit peek LUT: window → (symbol, code_length). Entries with
    length 0 mean invalid prefix."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    for code, length, symbol in _canonical_codes(bits, values):
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        sym[lo:hi] = symbol
        ln[lo:hi] = length
    return sym, ln


def _extend(v, t):
    """T.81 EXTEND: map t-bit magnitude to signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _BitReader:
    """MSB-first reader over the UNSTUFFED entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0                 # bit position

    def peek16(self) -> int:
        byte0 = self.pos >> 3
        chunk = self.data[byte0:byte0 + 4]
        chunk = chunk + b"\x00" * (4 - len(chunk))
        word = int.from_bytes(chunk, "big")
        return (word >> (16 - (self.pos & 7))) & 0xFFFF

    def take(self, n: int) -> int:
        byte0 = self.pos >> 3
        chunk = self.data[byte0:byte0 + 5]
        chunk = chunk + b"\x00" * (5 - len(chunk))
        word = int.from_bytes(chunk, "big")
        v = (word >> (40 - (self.pos & 7) - n)) & ((1 << n) - 1)
        self.pos += n
        return v

    def align(self):
        self.pos = (self.pos + 7) & ~7


def decode(buf: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, 3) or (h, w, 1) uint8."""
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}     # (class, id) -> LUT pair
    comps = []          # (id, h, v, tq)
    w = h = 0
    restart = 0
    pos = 2
    scan_comps = []
    n = len(buf)
    while pos < n:
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2:pos + seglen]
        if marker == 0xDB:                      # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 15
                o += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[o:o + 64], np.uint8).astype(np.int32)
                    o += 64
                else:
                    tbl = np.frombuffer(seg[o:o + 128], ">u2").astype(np.int32)
                    o += 128
                qt[tq] = tbl[_UNZZ].reshape(8, 8)
        elif marker in (0xC0, 0xC1):            # SOF0/1 baseline
            h = struct.unpack_from(">H", seg, 1)[0]
            w = struct.unpack_from(">H", seg, 3)[0]
            nc = seg[5]
            comps = []
            for ci in range(nc):
                cid = seg[6 + ci * 3]
                hv = seg[7 + ci * 3]
                comps.append((cid, hv >> 4, hv & 15, seg[8 + ci * 3]))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                         0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG SOF marker 0xFF{marker:02X} "
                             "(only baseline sequential)")
        elif marker == 0xC4:                    # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 15
                bits = list(seg[o + 1:o + 17])
                nv = sum(bits)
                values = list(seg[o + 17:o + 17 + nv])
                huff[(tc, th)] = _decode_lut(bits, values)
                o += 17 + nv
        elif marker == 0xDD:                    # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:                    # SOS
            ns = seg[0]
            scan_comps = []
            for si in range(ns):
                cs = seg[1 + si * 2]
                td_ta = seg[2 + si * 2]
                scan_comps.append((cs, td_ta >> 4, td_ta & 15))
            pos += seglen
            break
        pos += seglen

    if not comps or not scan_comps:
        raise ValueError("JPEG missing SOF/SOS")

    # unstuff entropy bytes, note restart marker positions
    ecs = bytearray()
    rst_bitpos = []
    i = pos
    while i < n - 1:
        b = buf[i]
        if b == 0xFF:
            m = buf[i + 1]
            if m == 0x00:
                ecs.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                rst_bitpos.append(len(ecs) * 8)
                i += 2
                continue
            break        # EOI or next marker
        ecs.append(b)
        i += 1
    ecs = bytes(ecs)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component block coefficient stores
    nblocks = {c[0]: (mcuy * c[2], mcux * c[1]) for c in comps}
    coefs = {c[0]: np.zeros((nblocks[c[0]][0] * nblocks[c[0]][1], 64),
                            np.int32) for c in comps}
    comp_by_id = {c[0]: c for c in comps}

    br = _BitReader(ecs)
    end_bits = len(ecs) * 8
    # corrupt-stream guard: a truncated/oversized header would otherwise
    # walk millions of phantom MCUs off the end of the entropy data
    if mcux * mcuy > 1 << 22:
        raise ValueError(f"implausible MCU count {mcux}x{mcuy}")
    dc_pred = {c[0]: 0 for c in comps}
    mcu_index = 0
    rst_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if br.pos > end_bits:
                raise ValueError("truncated JPEG entropy stream")
            if restart and mcu_index and mcu_index % restart == 0:
                # resync at the recorded restart boundary
                if rst_i < len(rst_bitpos):
                    br.pos = rst_bitpos[rst_i]
                    rst_i += 1
                else:
                    br.align()
                dc_pred = {c[0]: 0 for c in comps}
            for cs, td, ta in scan_comps:
                cid, ch, cv, tq = comp_by_id[cs]
                try:
                    dsym, dlen = huff[(0, td)]
                    asym, alen = huff[(1, ta)]
                except KeyError:
                    raise ValueError(
                        f"missing Huffman table DC{td}/AC{ta}") from None
                for by in range(cv):
                    for bx in range(ch):
                        blk = np.zeros(64, np.int32)
                        # DC
                        win = br.peek16()
                        t = int(dsym[win])
                        L = int(dlen[win])
                        if L == 0:
                            raise ValueError("bad Huffman prefix (DC)")
                        br.pos += L
                        diff = _extend(br.take(t), t) if t else 0
                        dc_pred[cs] += diff
                        blk[0] = dc_pred[cs]
                        # AC
                        k = 1
                        while k < 64:
                            win = br.peek16()
                            rs = int(asym[win])
                            L = int(alen[win])
                            if L == 0:
                                raise ValueError("bad Huffman prefix (AC)")
                            br.pos += L
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break           # EOB
                            k += r
                            if k > 63:
                                break
                            blk[k] = _extend(br.take(s), s)
                            k += 1
                        row = my * cv + by
                        col = mx * ch + bx
                        coefs[cs][row * nblocks[cs][1] + col] = blk
            mcu_index += 1

    # dequant + batch IDCT per component
    planes = {}
    for cid, ch, cv, tq in comps:
        bl = coefs[cid][:, _UNZZ].reshape(-1, 8, 8).astype(np.float64)
        bl *= qt[tq][None, :, :]
        spatial = _C.T @ bl @ _C                # vectorized IDCT
        spatial = np.clip(np.round(spatial + 128.0), 0, 255).astype(np.uint8)
        rows, cols = nblocks[cid]
        plane = spatial.reshape(rows, cols, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(rows * 8, cols * 8)
        # upsample to full grid
        if ch != hmax or cv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // cv, axis=0),
                              hmax // ch, axis=1)
        planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        return planes[comps[0][0]][:, :, None]
    y = planes[comps[0][0]].astype(np.float64)
    cb = planes[comps[1][0]].astype(np.float64) - 128.0
    cr = planes[comps[2][0]].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4, Annex K tables)
# ---------------------------------------------------------------------------

def _scale_q(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (tbl * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)           # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _enc_table(bits, values):
    return {sym: (code, length)
            for code, length, sym in _canonical_codes(bits, values)}


def _encode_blocks(bw, blocks_zz, dc_tab, ac_tab):
    pred = 0
    for bz in blocks_zz:
        diff = int(bz[0]) - pred
        pred = int(bz[0])
        mag = abs(diff)
        t = mag.bit_length()
        code, ln = dc_tab[t]
        bw.put(code, ln)
        if t:
            bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        k = 1
        run = 0
        last_nz = np.nonzero(bz[1:])[0]
        last = (last_nz[-1] + 1) if len(last_nz) else 0
        while k <= last:
            v = int(bz[k])
            if v == 0:
                run += 1
                k += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]
                bw.put(code, ln)
                run -= 16
            mag = abs(v)
            s = mag.bit_length()
            code, ln = ac_tab[(run << 4) | s]
            bw.put(code, ln)
            bw.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
            k += 1
        if last < 63:
            code, ln = ac_tab[0x00]
            bw.put(code, ln)                     # EOB


def encode(img: np.ndarray, quality: int = 90) -> bytes:
    """(h, w[, 1|3]) uint8 → baseline JFIF bytes (4:4:4)."""
    px = img if img.ndim == 3 else img[:, :, None]
    if px.shape[2] not in (1, 3):
        px = px[:, :, :3]
    h, w, nc = px.shape
    gray = nc == 1
    qy = _scale_q(_Q_LUMA, quality)
    qc = _scale_q(_Q_CHROMA, quality)

    if gray:
        planes = [px[:, :, 0].astype(np.float64)]
    else:
        f = px.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] \
            + 0.5 * f[:, :, 2] + 128.0
        cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] \
            - 0.081312 * f[:, :, 2] + 128.0
        planes = [y, cb, cr]

    bh, bwd = -(-h // 8) * 8, -(-w // 8) * 8
    zz_per_comp = []
    for ci, plane in enumerate(planes):
        p = np.empty((bh, bwd))
        p[:h, :w] = plane
        p[h:, :w] = plane[-1:, :]
        p[:, w:] = p[:, w - 1:w]
        blocks = p.reshape(bh // 8, 8, bwd // 8, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8) - 128.0
        q = qy if ci == 0 else qc
        dct = _C @ blocks @ _C.T                 # vectorized forward DCT
        qz = np.round(dct / q[None, :, :]).astype(np.int32)
        zz_per_comp.append(qz.reshape(-1, 64)[:, _ZZ])

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, q in ([(0, qy)] if gray else [(0, qy), (1, qc)]):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(q.reshape(-1)[_ZZ].astype(np.uint8).tolist())
    ncomp = 1 if gray else 3
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    tables = [(0, 0, _DC_LUMA), (1, 0, _AC_LUMA)]
    if not gray:
        tables += [(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)]
    for tc, th, (bits, values) in tables:
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(values)) \
            + bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3F\x00"

    bw_ = _BitWriter()
    dc_y, ac_y = _enc_table(*_DC_LUMA), _enc_table(*_AC_LUMA)
    dc_c, ac_c = _enc_table(*_DC_CHROMA), _enc_table(*_AC_CHROMA)
    # interleave per MCU (1 block per component at 4:4:4)
    nb = zz_per_comp[0].shape[0]
    preds = [0] * ncomp
    for bi in range(nb):
        for ci in range(ncomp):
            bz = zz_per_comp[ci][bi]
            dct_tab = dc_y if ci == 0 else dc_c
            act_tab = ac_y if ci == 0 else ac_c
            diff = int(bz[0]) - preds[ci]
            preds[ci] = int(bz[0])
            mag = abs(diff)
            t = mag.bit_length()
            code, ln = dct_tab[t]
            bw_.put(code, ln)
            if t:
                bw_.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
            k = 1
            run = 0
            nz = np.nonzero(bz[1:])[0]
            last = (nz[-1] + 1) if len(nz) else 0
            while k <= last:
                v = int(bz[k])
                if v == 0:
                    run += 1
                    k += 1
                    continue
                while run > 15:
                    code, ln = act_tab[0xF0]
                    bw_.put(code, ln)
                    run -= 16
                s = abs(v).bit_length()
                code, ln = act_tab[(run << 4) | s]
                bw_.put(code, ln)
                bw_.put(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
                k += 1
            if last < 63:
                code, ln = act_tab[0x00]
                bw_.put(code, ln)
    bw_.flush()
    out += bw_.out
    out += b"\xFF\xD9"
    return bytes(out)
