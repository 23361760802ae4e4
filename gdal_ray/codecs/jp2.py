"""JPEG 2000 Part-1 decoder — from scratch (ISO/IEC 15444-1).

Reference: frmts/openjpeg/openjpegdataset.cpp wraps libopenjp2; this
module implements the codestream itself from the published spec:

  * JP2 container boxes (jp2h/ihdr/colr, GeoJP2 ``uuid`` with a
    degenerate GeoTIFF — parsed by the engine's own TIFF reader — and
    raw ``SOC``-first codestreams);
  * main/tile-part headers: SIZ, COD/COC, QCD/QCC, SOT/SOD (multiple
    tile-parts per tile), POC absent, PLT/TLM/COM skipped;
  * Tier-2: packet decoding for the LRCP/RLCP/RPCL/PCRL/CPRL
    progressions (anchor-sorted iterators), precinct partitions with
    per-resolution sizes, inclusion + zero-bitplane tag trees, Lblock
    length coding, bit-stuffed headers, SOP/EPH markers;
  * Tier-1: EBCOT code-block decoding — MQ arithmetic decoder
    (Annex C state table), significance/sign/magnitude-refinement/
    cleanup passes with run-length mode, band-oriented zero-coding
    contexts;
  * inverse reversible 5/3 and irreversible 9/7 lifting (Annex F,
    arbitrary region parities), scalar dequantization (Annex E),
    reversible (RCT) and irreversible (ICT) multi-component
    transforms, DC level shift.

Goldens (tests/test_jp2.py): the reference's own fixtures —
byte_lossless_openjp2_golden.jp2 decodes bit-equal to gcore byte.tif
(the file is a lossless encode of it, jp2openjpeg.py:3928), multi-tile
and origin-offset variants, int16_lossless, the kakadu RCT file, and
PSNR gates for 9/7 lossy fixtures.
"""

from __future__ import annotations

import ctypes
import math
import struct

import numpy as np

# ---------------------------------------------------------------------------
# MQ arithmetic decoder (Annex C)
# ---------------------------------------------------------------------------

_QE = [
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601]
_NMPS = [1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16, 17,
         18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
         33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46]
_NLPS = [1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
         15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28,
         29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43,
         46]
_SWITCH = [1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0,
           0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
           0, 0, 0, 0, 0, 0, 0, 0, 0]

N_CTX = 19          # 0-8 ZC, 9-13 SC, 14-16 MR, 17 RL, 18 UNIFORM
CTX_RL = 17
CTX_UNI = 18


class MQDecoder:
    __slots__ = ("data", "bp", "c", "a", "ct", "idx", "mps")

    def __init__(self, data: bytes):
        self.data = data
        self.idx = [0] * N_CTX
        self.mps = [0] * N_CTX
        # initial states (Table D.7)
        self.idx[0] = 4
        self.idx[CTX_RL] = 3
        self.idx[CTX_UNI] = 46
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self):
        data, bp = self.data, self.bp
        cur = data[bp] if bp < len(data) else 0xFF
        if cur == 0xFF:
            nxt = data[bp + 1] if bp + 1 < len(data) else 0xFF
            if nxt > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += nxt << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            nxt = data[bp + 1] if bp + 1 < len(data) else 0xFF
            self.c += nxt << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        i = self.idx[cx]
        mps = self.mps[cx]
        qe = _QE[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange
            if self.a < qe:
                d = mps
                self.idx[cx] = _NMPS[i]
            else:
                d = 1 - mps
                if _SWITCH[i]:
                    self.mps[cx] = 1 - mps
                self.idx[cx] = _NLPS[i]
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mps
            if self.a < qe:
                d = 1 - mps
                if _SWITCH[i]:
                    self.mps[cx] = 1 - mps
                self.idx[cx] = _NLPS[i]
            else:
                d = mps
                self.idx[cx] = _NMPS[i]
        # renormalize
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


# ---------------------------------------------------------------------------
# EBCOT Tier-1 (Annex D)
# ---------------------------------------------------------------------------

def _zc_context_tables():
    """ctx index for (h, v, d) per band orientation (Table D.1)."""
    ll = np.zeros((3, 3, 5), np.int8)       # also LH (band 0,1)
    hl = np.zeros((3, 3, 5), np.int8)
    hh = np.zeros((3, 3, 5), np.int8)
    for h in range(3):
        for v in range(3):
            for d in range(5):
                # LL/LH: horizontal dominant
                if h == 2:
                    c = 8
                elif h == 1:
                    c = 7 if v >= 1 else (6 if d >= 1 else 5)
                else:
                    if v == 2:
                        c = 4
                    elif v == 1:
                        c = 3
                    else:
                        c = 2 if d >= 2 else (1 if d == 1 else 0)
                ll[h, v, d] = c
                hl[v, h, d] = c              # HL: swap h and v
                # HH: diagonal dominant
                hv = h + v
                if d >= 3:
                    c = 8
                elif d == 2:
                    c = 7 if hv >= 1 else 6
                elif d == 1:
                    c = 5 if hv >= 2 else (4 if hv == 1 else 3)
                else:
                    c = 2 if hv >= 2 else (1 if hv == 1 else 0)
                hh[h, v, d] = c
    return ll, hl, hh


_ZC_LL, _ZC_HL, _ZC_HH = _zc_context_tables()

# sign-coding contexts (Table D.3): (H, V) in -1..1 → (ctx, xor)
_SC = {(1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
       (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
       (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1)}

_SIG = 1            # flag bits
_VISITED = 2
_REFINED = 4


def decode_codeblock(data: bytes, w: int, h: int, n_passes: int,
                     missing_msbs: int, mb: int, band: int) -> np.ndarray:
    """EBCOT T1: one code-block → signed integer coefficients.
    ``band``: 0=LL, 1=HL, 2=LH, 3=HH. Single codeword segment (no
    bypass/termall — cbstyle 0, all the reference fixtures). Routes
    through the native twin (codecs/_t1.c) when a C compiler exists;
    this Python body (flat lists — numpy scalar indexing is ~10×
    slower per access) is the always-available fallback and the
    conformance definition."""
    from .native import get_t1
    lib = get_t1()
    if lib is not None:
        out = np.zeros(h * w, np.int64)
        rc = lib.t1_decode(
            data, len(data), w, h, n_passes, missing_msbs, mb, band,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if rc == 0:
            return out.reshape(h, w)
    zc = (_ZC_LL, _ZC_HL, _ZC_LL, _ZC_HH)[band].tolist()
    mq = MQDecoder(data)
    n_planes = mb - missing_msbs
    if n_planes <= 0 or n_passes <= 0:
        return np.zeros((h, w), np.int64)
    W2 = w + 2
    mag = [0] * (h * w)
    last_up = [0] * (h * w)
    sign = [0] * (h * w)
    flags = [0] * ((h + 2) * W2)            # 1-px border
    dec = mq.decode

    def neighbors(fy, fx):
        # fy/fx: flag coords of the pixel = (y+1, x+1)
        base = fy * W2 + fx
        f = flags
        hh_ = (f[base - 1] & 1) + (f[base + 1] & 1)
        vv = (f[base - W2] & 1) + (f[base + W2] & 1)
        dd = ((f[base - W2 - 1] & 1) + (f[base - W2 + 1] & 1)
              + (f[base + W2 - 1] & 1) + (f[base + W2 + 1] & 1))
        return hh_, vv, dd

    def sign_ctx(y, x):
        def contrib(yy, xx):
            if yy < 0 or yy >= h or xx < 0 or xx >= w:
                return 0
            if not flags[(yy + 1) * W2 + xx + 1] & 1:
                return 0
            return -1 if sign[yy * w + xx] else 1
        hc = contrib(y, x - 1) + contrib(y, x + 1)
        vc = contrib(y - 1, x) + contrib(y + 1, x)
        hc = -1 if hc < -1 else (1 if hc > 1 else hc)
        vc = -1 if vc < -1 else (1 if vc > 1 else vc)
        return _SC[(hc, vc)]

    def decode_sig(y, x, p):
        ctx, xor = sign_ctx(y, x)
        s = dec(ctx) ^ xor
        sign[y * w + x] = s
        mag[y * w + x] |= 1 << p
        last_up[y * w + x] = p
        flags[(y + 1) * W2 + x + 1] |= _SIG

    def spp(p):
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    fi = (y + 1) * W2 + x + 1
                    fl = flags[fi]
                    if fl & _SIG:
                        continue
                    hh_, vv, dd = neighbors(y + 1, x + 1)
                    if hh_ + vv + dd == 0:
                        continue
                    if dec(zc[hh_][vv][dd if dd < 4 else 4]):
                        decode_sig(y, x, p)
                    flags[fi] |= _VISITED

    def mrp(p):
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    fi = (y + 1) * W2 + x + 1
                    fl = flags[fi]
                    if not (fl & _SIG) or (fl & _VISITED):
                        continue
                    if fl & _REFINED:
                        ctx = 16
                    else:
                        hh_, vv, dd = neighbors(y + 1, x + 1)
                        ctx = 15 if hh_ + vv + dd else 14
                    bit = dec(ctx)
                    if bit:
                        mag[y * w + x] |= 1 << p
                    last_up[y * w + x] = p
                    flags[fi] |= _REFINED

    def cleanup(p):
        for y0 in range(0, h, 4):
            for x in range(w):
                y = y0
                if y0 + 4 <= h:
                    allclear = True
                    for yy in range(y0, y0 + 4):
                        fl = flags[(yy + 1) * W2 + x + 1]
                        if fl & (_SIG | _VISITED):
                            allclear = False
                            break
                        hh_, vv, dd = neighbors(yy + 1, x + 1)
                        if hh_ + vv + dd:
                            allclear = False
                            break
                    if allclear:
                        if not dec(CTX_RL):
                            continue
                        r = (dec(CTX_UNI) << 1) | dec(CTX_UNI)
                        y = y0 + r
                        decode_sig(y, x, p)
                        y += 1
                while y < min(y0 + 4, h):
                    fi = (y + 1) * W2 + x + 1
                    fl = flags[fi]
                    if fl & _VISITED:
                        flags[fi] = fl & ~_VISITED
                        y += 1
                        continue
                    if fl & _SIG:
                        y += 1
                        continue
                    hh_, vv, dd = neighbors(y + 1, x + 1)
                    if dec(zc[hh_][vv][dd if dd < 4 else 4]):
                        decode_sig(y, x, p)
                    y += 1
        nv = ~_VISITED
        for i in range(len(flags)):
            flags[i] &= nv

    # pass schedule: first pass is CLEANUP at the top plane
    p = n_planes - 1
    passes = 0
    kind = 2                                  # 0=SPP 1=MRP 2=CLN
    while passes < n_passes and p >= 0:
        if kind == 0:
            spp(p)
        elif kind == 1:
            mrp(p)
        else:
            cleanup(p)
        passes += 1
        if kind == 2:
            p -= 1
            kind = 0
        else:
            kind += 1
    # midpoint reconstruction (openjpeg t1 convention): each nonzero
    # coefficient carries half the LSB of the plane it was last
    # updated at — exact when fully decoded (half of plane 0 = 0)
    m = np.array(mag, np.int64)
    lu = np.array(last_up, np.int64)
    out = m + np.where(m > 0, (1 << lu) >> 1, 0)
    out[np.array(sign, bool)] *= -1
    return out.reshape(h, w)


# ---------------------------------------------------------------------------
# tag trees (B.10.2)
# ---------------------------------------------------------------------------

class TagTree:
    def __init__(self, w: int, h: int):
        self.levels = []
        while True:
            self.levels.append((w, h,
                                np.zeros((h, w), np.int32),   # low
                                np.zeros((h, w), bool)))      # known
            if w == 1 and h == 1:
                break
            w = (w + 1) // 2
            h = (h + 1) // 2

    def decode(self, getbit, i, j, threshold):
        """→ (known, value): whether leaf value < threshold is decided
        with value known; stops reading once low >= threshold."""
        path = []
        x, y = i, j
        for (w, h, low, known) in self.levels:
            path.append((low, known, y, x))
            x //= 2
            y //= 2
        cur_low = 0
        for low, known, y, x in reversed(path):       # root → leaf
            if low[y, x] < cur_low:
                low[y, x] = cur_low
            while not known[y, x] and low[y, x] < threshold:
                if getbit():
                    known[y, x] = True
                else:
                    low[y, x] += 1
            cur_low = low[y, x]
            if not known[y, x]:
                return False, cur_low                 # >= threshold
        leaf_low, leaf_known = self.levels[0][2], self.levels[0][3]
        return bool(leaf_known[j, i]), int(leaf_low[j, i])

    def decode_full(self, getbit, i, j):
        """Read until the leaf value is fully known (zero-bitplane
        trees)."""
        t = 1
        while True:
            known, val = self.decode(getbit, i, j, t)
            if known:
                return val
            t = val + 1


# ---------------------------------------------------------------------------
# bit reader for packet headers (MSB-first with 0xFF bit stuffing)
# ---------------------------------------------------------------------------

class _HdrBits:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.acc = 0
        self.prev_ff = False

    def bit(self) -> int:
        if self.bits == 0:
            byte = self.data[self.pos]
            self.pos += 1
            if self.prev_ff:
                self.bits = 7
                self.prev_ff = False
            else:
                self.bits = 8
            self.acc = byte
            if byte == 0xFF:
                self.prev_ff = True
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self):
        # end of packet header: stuffing — if last byte was 0xFF a
        # 0-filled byte follows? (spec: a packet header never ends
        # with 0xFF; the stuffed bit is consumed with the next byte)
        if self.prev_ff:
            self.pos += 1
            self.prev_ff = False
        self.bits = 0


# ---------------------------------------------------------------------------
# codestream structures
# ---------------------------------------------------------------------------

class _Cod:
    pass


def _parse_cod(seg: bytes) -> _Cod:
    c = _Cod()
    c.scod = seg[0]
    c.prog = seg[1]
    (c.layers,) = struct.unpack_from(">H", seg, 2)
    c.mct = seg[4]
    c.levels = seg[5]
    c.cbw = 1 << ((seg[6] & 0x0F) + 2)
    c.cbh = 1 << ((seg[7] & 0x0F) + 2)
    c.cbstyle = seg[8]
    c.wavelet = seg[9]                        # 0 = 9/7, 1 = 5/3
    if c.scod & 1:
        c.prec = [(v & 0x0F, v >> 4) for v in seg[10:10 + c.levels + 1]]
    else:
        c.prec = [(15, 15)] * (c.levels + 1)
    return c


class _Qcd:
    pass


def _parse_qcd(seg: bytes) -> _Qcd:
    q = _Qcd()
    s = seg[0]
    q.guard = s >> 5
    q.style = s & 0x1F
    if q.style == 0:                          # no quantization (ints)
        q.exps = [(v >> 3) for v in seg[1:]]
        q.mants = [0] * len(q.exps)
    elif q.style == 1:                        # scalar derived
        (v,) = struct.unpack_from(">H", seg, 1)
        q.exps = [v >> 11]
        q.mants = [v & 0x7FF]
    else:                                     # scalar expounded
        vals = struct.unpack_from(f">{(len(seg) - 1) // 2}H", seg, 1)
        q.exps = [v >> 11 for v in vals]
        q.mants = [v & 0x7FF for v in vals]
    return q


def _ceil_div(a, b):
    return -(-a // b)


class _Block:
    __slots__ = ("bx", "by", "x0", "y0", "x1", "y1", "included",
                 "missing", "lblock", "passes_total", "segments")

    def __init__(self, bx, by, x0, y0, x1, y1):
        self.bx, self.by = bx, by
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.included = False
        self.missing = 0
        self.lblock = 3
        self.passes_total = 0
        self.segments: list[bytes] = []


class _Band:
    __slots__ = ("borient", "bx0", "by0", "bx1", "by1", "blocks",
                 "exp", "mant", "gain")


class _Precinct:
    __slots__ = ("px", "py", "bands_blocks", "incl_trees", "zbp_trees")


def decode_j2k(cs: bytes):
    """Raw codestream → list of per-component numpy arrays (full
    image grid, cropped to image offsets)."""
    if cs[:2] != b"\xff\x4f":
        raise ValueError("not a JPEG2000 codestream (no SOC)")
    i = 2
    siz = None
    cod = None
    qcd = None
    coc = {}
    qcc = {}
    tiles: dict[int, list[bytes]] = {}
    # ---- main header
    while i + 4 <= len(cs):
        m = cs[i:i + 2]
        if m == b"\xff\x90":                 # SOT: tile-parts start
            break
        (L,) = struct.unpack_from(">H", cs, i + 2)
        seg = cs[i + 4:i + 2 + L]
        if m == b"\xff\x51":
            siz = seg
        elif m == b"\xff\x52":
            cod = _parse_cod(seg)
        elif m == b"\xff\x5c":
            qcd = _parse_qcd(seg)
        elif m == b"\xff\x53":               # COC
            if siz is None:
                raise ValueError("COC before SIZ")
            (nc_,) = struct.unpack_from(">H", siz, 34)
            ci, off = (struct.unpack_from(">H", seg, 0)[0], 2) \
                if nc_ >= 257 else (seg[0], 1)
            c = _Cod()
            base = cod or _Cod()
            c.scod = seg[off]
            c.prog = getattr(base, "prog", 0)
            c.layers = getattr(base, "layers", 1)
            c.mct = getattr(base, "mct", 0)
            c.levels = seg[off + 1]
            c.cbw = 1 << ((seg[off + 2] & 0x0F) + 2)
            c.cbh = 1 << ((seg[off + 3] & 0x0F) + 2)
            c.cbstyle = seg[off + 4]
            c.wavelet = seg[off + 5]
            if c.scod & 1:
                c.prec = [(v & 0x0F, v >> 4)
                          for v in seg[off + 6:off + 7 + c.levels]]
            else:
                c.prec = [(15, 15)] * (c.levels + 1)
            coc[ci] = c
        elif m == b"\xff\x5d":               # QCC
            if siz is None:
                raise ValueError("QCC before SIZ")
            (nc_,) = struct.unpack_from(">H", siz, 34)
            ci, off = (struct.unpack_from(">H", seg, 0)[0], 2) \
                if nc_ >= 257 else (seg[0], 1)
            qcc[ci] = _parse_qcd(seg[off:])
        elif m == b"\xff\x5f":
            raise ValueError("JPEG2000 POC unsupported")
        i += L + 2
    if siz is None or cod is None or qcd is None:
        raise ValueError("JPEG2000 missing SIZ/COD/QCD")

    X, Y, XO, YO, XT, YT, XTO, YTO = struct.unpack_from(">8I", siz, 2)
    (NC,) = struct.unpack_from(">H", siz, 34)
    comps = []
    for k in range(NC):
        ssiz = siz[36 + 3 * k]
        # Ssiz stores precision − 1 in the low 7 bits
        comps.append(((ssiz & 0x7F) + 1, bool(ssiz & 0x80),
                      siz[37 + 3 * k], siz[38 + 3 * k]))
    for prec, signed, dx, dy in comps:
        if dx != 1 or dy != 1:
            raise ValueError("JPEG2000 component subsampling unsupported")

    ntx = _ceil_div(X - XTO, XT)
    nty = _ceil_div(Y - YTO, YT)

    # ---- tile-part assembly (concatenate per tile index)
    while i + 4 <= len(cs):
        m = cs[i:i + 2]
        if m == b"\xff\xd9":                 # EOC
            break
        if m != b"\xff\x90":
            (L,) = struct.unpack_from(">H", cs, i + 2)
            i += L + 2
            continue
        (L,) = struct.unpack_from(">H", cs, i + 2)
        isot, psot = struct.unpack_from(">HI", cs, i + 4)
        tp_end = i + psot if psot else len(cs)
        j = i + 2 + L
        # skip tile-part header segments until SOD
        while j + 4 <= len(cs):
            mm = cs[j:j + 2]
            if mm == b"\xff\x93":
                j += 2
                break
            (LL,) = struct.unpack_from(">H", cs, j + 2)
            if mm in (b"\xff\x52", b"\xff\x5c", b"\xff\x53", b"\xff\x5d"):
                raise ValueError("JPEG2000 per-tile COD/QCD unsupported")
            j += LL + 2
        tiles.setdefault(isot, []).append(cs[j:tp_end])
        i = tp_end

    out = [np.zeros((Y - YO, X - XO), np.float64) for _ in range(NC)]

    for t_idx, parts in sorted(tiles.items()):
        ty, tx = divmod(t_idx, ntx)
        tx0 = max(XTO + tx * XT, XO)
        ty0 = max(YTO + ty * YT, YO)
        tx1 = min(XTO + (tx + 1) * XT, X)
        ty1 = min(YTO + (ty + 1) * YT, Y)
        data = b"".join(parts)
        _decode_tile(data, cod, qcd, comps, (tx0, ty0, tx1, ty1), out,
                     (XO, YO), coc, qcc)

    result = []
    for k, (prec, signed, _, _) in enumerate(comps):
        a = out[k]
        if not signed:
            a = a + (1 << (prec - 1))
        lo, hi = (-(1 << (prec - 1)), (1 << (prec - 1)) - 1) if signed \
            else (0, (1 << prec) - 1)
        a = np.clip(np.floor(a + 0.5), lo, hi)
        dt = (np.int32 if signed else np.uint32)
        if prec <= 8:
            dt = np.int8 if signed else np.uint8
        elif prec <= 16:
            dt = np.int16 if signed else np.uint16
        result.append(a.astype(dt))
    return result


def _band_rect(r, levels, borient, tcx0, tcy0, tcx1, tcy1):
    """Subband rectangle in its own coordinate system (B.5)."""
    nb = levels - r + (1 if r else 0)        # decomposition count
    if borient == 0:                          # LL (r = 0 … actually nb)
        lev = levels - r
        return (_ceil_div(tcx0, 1 << lev), _ceil_div(tcy0, 1 << lev),
                _ceil_div(tcx1, 1 << lev), _ceil_div(tcy1, 1 << lev))
    lev = levels - r + 1
    xo = 1 if borient in (1, 3) else 0        # HL/HH have x offset
    yo = 1 if borient in (2, 3) else 0        # LH/HH have y offset
    d = 1 << lev
    h = 1 << (lev - 1)
    return (_ceil_div(tcx0 - h * xo, d), _ceil_div(tcy0 - h * yo, d),
            _ceil_div(tcx1 - h * xo, d), _ceil_div(tcy1 - h * yo, d))


def _decode_tile(data, cod, qcd, comps, trect, out, img_off,
                 cocs=None, qccs=None):
    tx0, ty0, tx1, ty1 = trect
    NC = len(comps)
    levels = cod.levels
    nres = levels + 1
    # per-component overrides: the wavelet filter and quantization may
    # differ per component (COC/QCC); a COC that changes the
    # decomposition/code-block STRUCTURE would need per-component
    # resolution grids — fail fast by name on that subset
    cods = [(cocs or {}).get(ci, cod) for ci in range(NC)]
    qcds = [(qccs or {}).get(ci, qcd) for ci in range(NC)]
    for c in cods:
        if (c.levels != cod.levels or c.cbw != cod.cbw
                or c.cbh != cod.cbh or c.prec != cod.prec):
            raise ValueError(
                "COC changing decomposition structure unsupported")

    # ---- build per-component resolution/band/precinct structures
    comps_res = []
    for ci in range(NC):
        res_list = []
        for r in range(nres):
            lev = levels - r
            rx0 = _ceil_div(tx0, 1 << lev)
            ry0 = _ceil_div(ty0, 1 << lev)
            rx1 = _ceil_div(tx1, 1 << lev)
            ry1 = _ceil_div(ty1, 1 << lev)
            ppx, ppy = cod.prec[r]
            # precinct grid on the resolution coords (anchored at 0)
            if rx1 > rx0:
                p0x = (rx0 >> ppx) << ppx
                npx = _ceil_div(rx1 - p0x, 1 << ppx)
            else:
                p0x, npx = 0, 0
            if ry1 > ry0:
                p0y = (ry0 >> ppy) << ppy
                npy = _ceil_div(ry1 - p0y, 1 << ppy)
            else:
                p0y, npy = 0, 0
            # effective code-block size
            cbw = min(cod.cbw, 1 << (ppx - (1 if r else 0)))
            cbh = min(cod.cbh, 1 << (ppy - (1 if r else 0)))
            borients = (0,) if r == 0 else (1, 2, 3)
            bands = []
            for bo in borients:
                b = _Band()
                b.borient = bo
                b.bx0, b.by0, b.bx1, b.by1 = _band_rect(
                    r, levels, bo, tx0, ty0, tx1, ty1)
                b.gain = (0, 1, 1, 2)[bo]
                bands.append(b)
            precincts = []
            for pj in range(max(npy, 0)):
                for pi in range(max(npx, 0)):
                    pr = _Precinct()
                    pr.px, pr.py = pi, pj
                    pr.bands_blocks = []
                    pr.incl_trees = []
                    pr.zbp_trees = []
                    # precinct bounds on resolution grid
                    prx0 = max(p0x + (pi << ppx), rx0)
                    pry0 = max(p0y + (pj << ppy), ry0)
                    prx1 = min(p0x + ((pi + 1) << ppx), rx1)
                    pry1 = min(p0y + ((pj + 1) << ppy), ry1)
                    for b in bands:
                        # precinct rect mapped into band coords
                        if r == 0:
                            bpx0, bpy0, bpx1, bpy1 = prx0, pry0, prx1, pry1
                        else:
                            bpx0, bpy0 = _ceil_div(prx0, 2), _ceil_div(pry0, 2)
                            bpx1, bpy1 = _ceil_div(prx1, 2), _ceil_div(pry1, 2)
                        bpx0 = max(bpx0, b.bx0)
                        bpy0 = max(bpy0, b.by0)
                        bpx1 = min(bpx1, b.bx1)
                        bpy1 = min(bpy1, b.by1)
                        blocks = []
                        if bpx1 > bpx0 and bpy1 > bpy0:
                            g0x = (bpx0 // cbw) * cbw
                            g0y = (bpy0 // cbh) * cbh
                            nbx = _ceil_div(bpx1 - g0x, cbw)
                            nby = _ceil_div(bpy1 - g0y, cbh)
                            for byi in range(nby):
                                for bxi in range(nbx):
                                    x0 = max(g0x + bxi * cbw, bpx0)
                                    y0 = max(g0y + byi * cbh, bpy0)
                                    x1 = min(g0x + (bxi + 1) * cbw, bpx1)
                                    y1 = min(g0y + (byi + 1) * cbh, bpy1)
                                    blocks.append(_Block(bxi, byi,
                                                         x0, y0, x1, y1))
                            pr.incl_trees.append(TagTree(nbx, nby))
                            pr.zbp_trees.append(TagTree(nbx, nby))
                        else:
                            nbx = nby = 0
                            pr.incl_trees.append(None)
                            pr.zbp_trees.append(None)
                        pr.bands_blocks.append(blocks)
                    precincts.append(pr)
            res_list.append(dict(r=r, rx0=rx0, ry0=ry0, rx1=rx1, ry1=ry1,
                                 ppx=ppx, ppy=ppy, npx=npx, npy=npy,
                                 bands=bands, precincts=precincts,
                                 p0x=p0x, p0y=p0y))
        comps_res.append(res_list)

    # ---- packet iteration order
    order = []                               # (layer, res, comp, prec)
    max_res = nres

    def prec_anchor(ci, r, pr):
        # position-progression anchor: the precinct's first sample in
        # reference-grid coords, clipped to the tile (spec B.12 visits
        # the first precinct at the tile origin)
        res = comps_res[ci][r]
        lev = levels - r
        ax = max((res["p0x"] + (pr.px << res["ppx"])) << lev, tx0)
        ay = max((res["p0y"] + (pr.py << res["ppy"])) << lev, ty0)
        return ax, ay

    entries = []
    for ci in range(NC):
        for r in range(max_res):
            for pidx, pr in enumerate(comps_res[ci][r]["precincts"]):
                ax, ay = prec_anchor(ci, r, pr)
                entries.append((ci, r, pidx, ax, ay))
    L = cod.layers
    if cod.prog == 0:                        # LRCP
        for lay in range(L):
            for r in range(max_res):
                for ci in range(NC):
                    for e in entries:
                        if e[0] == ci and e[1] == r:
                            order.append((lay, r, ci, e[2]))
    elif cod.prog == 1:                      # RLCP
        for r in range(max_res):
            for lay in range(L):
                for ci in range(NC):
                    for e in entries:
                        if e[0] == ci and e[1] == r:
                            order.append((lay, r, ci, e[2]))
    elif cod.prog == 2:                      # RPCL
        for r in range(max_res):
            es = sorted([e for e in entries if e[1] == r],
                        key=lambda e: (e[4], e[3], e[0]))
            for e in es:
                for lay in range(L):
                    order.append((lay, r, e[0], e[2]))
    elif cod.prog == 3:                      # PCRL
        es = sorted(entries, key=lambda e: (e[4], e[3], e[0], e[1]))
        for e in es:
            for lay in range(L):
                order.append((lay, e[1], e[0], e[2]))
    elif cod.prog == 4:                      # CPRL
        es = sorted(entries, key=lambda e: (e[0], e[4], e[3], e[1]))
        for e in es:
            for lay in range(L):
                order.append((lay, e[1], e[0], e[2]))
    else:
        raise ValueError(f"unknown progression {cod.prog}")

    # ---- decode packets
    pos = 0
    use_sop = bool(cod.scod & 2)
    use_eph = bool(cod.scod & 4)
    for (lay, r, ci, pidx) in order:
        res = comps_res[ci][r]
        pr = res["precincts"][pidx]
        if use_sop and data[pos:pos + 2] == b"\xff\x91":
            pos += 6
        hb = _HdrBits(data, pos)
        if not hb.bit():                     # empty packet
            hb.align()
            pos = hb.pos
            if use_eph and data[pos:pos + 2] == b"\xff\x92":
                pos += 2
            continue
        body_plan = []
        for bi, blocks in enumerate(pr.bands_blocks):
            tree_i = pr.incl_trees[bi]
            tree_z = pr.zbp_trees[bi]
            for blk in blocks:
                if not blk.included:
                    known, val = tree_i.decode(hb.bit, blk.bx, blk.by,
                                               lay + 1)
                    inc = known and val <= lay
                else:
                    inc = bool(hb.bit())
                npasses = 0
                if inc:
                    if not blk.included:
                        blk.missing = tree_z.decode_full(hb.bit, blk.bx,
                                                         blk.by)
                        blk.included = True
                    # number of passes
                    if not hb.bit():
                        npasses = 1
                    elif not hb.bit():
                        npasses = 2
                    else:
                        v = hb.read(2)
                        if v < 3:
                            npasses = 3 + v
                        else:
                            v = hb.read(5)
                            if v < 31:
                                npasses = 6 + v
                            else:
                                npasses = 37 + hb.read(7)
                    while hb.bit():
                        blk.lblock += 1
                    nbits = blk.lblock + int(math.floor(
                        math.log2(npasses))) if npasses else blk.lblock
                    nbytes = hb.read(nbits)
                    body_plan.append((blk, npasses, nbytes))
        hb.align()
        pos = hb.pos
        if use_eph and data[pos:pos + 2] == b"\xff\x92":
            pos += 2
        for blk, npasses, nbytes in body_plan:
            blk.segments.append(data[pos:pos + nbytes])
            blk.passes_total += npasses
            pos += nbytes

    # ---- Tier-1 decode + dequant into subband arrays
    for ci in range(NC):
        qcdi = qcds[ci]
        guard = qcdi.guard
        reversible = cods[ci].wavelet == 1
        prec_bits = comps[ci][0]
        band_seq = 0                          # QCD subband order:
        subbands = {}                         # LL, then HL/LH/HH per r
        for r in range(nres):
            res = comps_res[ci][r]
            for bi, b in enumerate(res["bands"]):
                arr = np.zeros((max(b.by1 - b.by0, 0),
                                max(b.bx1 - b.bx0, 0)), np.float64)
                if qcdi.style == 0:           # reversible: exponents
                    exp = qcdi.exps[band_seq]
                    mant = 0
                elif qcdi.style == 1:         # scalar derived (E.1.1):
                    # εb = ε0 − NL + nb; band decomposition level
                    # nb = NL for LL, NL − r + 1 for resolution r
                    exp = qcdi.exps[0] if r == 0 \
                        else qcdi.exps[0] - r + 1
                    mant = qcdi.mants[0]
                else:                         # scalar expounded
                    exp = qcdi.exps[band_seq]
                    mant = qcdi.mants[band_seq]
                mb = guard + exp - 1
                rb = prec_bits + b.gain
                for pr in res["precincts"]:
                    for blk in pr.bands_blocks[bi]:
                        if not blk.segments or blk.passes_total == 0:
                            continue
                        seg = b"".join(blk.segments)
                        coef = decode_codeblock(
                            seg, blk.x1 - blk.x0, blk.y1 - blk.y0,
                            blk.passes_total, blk.missing, mb,
                            b.borient)
                        vals = coef.astype(np.float64)
                        if not reversible:
                            delta = (2.0 ** (rb - exp)) \
                                * (1.0 + mant / 2048.0)
                            vals = vals * delta
                        arr[blk.y0 - b.by0:blk.y1 - b.by0,
                            blk.x0 - b.bx0:blk.x1 - b.bx0] = vals
                band_seq += 1
                subbands[(r, b.borient)] = (arr,)

        # ---- inverse DWT
        img = _inverse_dwt(subbands, levels, (tx0, ty0, tx1, ty1),
                           reversible)
        xo, yo = img_off
        comps_out = out[ci]
        comps_out[ty0 - yo:ty1 - yo, tx0 - xo:tx1 - xo] = img

    # ---- multi-component transform
    if cod.mct and NC >= 3:
        xo, yo = img_off
        s = (slice(ty0 - yo, ty1 - yo), slice(tx0 - xo, tx1 - xo))
        c0, c1, c2 = out[0][s], out[1][s], out[2][s]
        if reversible:                        # RCT
            g = c0 - np.floor((c1 + c2) / 4.0)
            r_ = c2 + g
            b_ = c1 + g
        else:                                 # ICT (YCbCr)
            r_ = c0 + 1.402 * c2
            g = c0 - 0.344136 * c1 - 0.714136 * c2
            b_ = c0 + 1.772 * c1
        out[0][s], out[1][s], out[2][s] = r_, g, b_


# ---------------------------------------------------------------------------
# inverse DWT (Annex F)
# ---------------------------------------------------------------------------

def _ext_idx(idx: np.ndarray, i0: int, i1: int) -> np.ndarray:
    """Mirror indices into [i0, i1) (period 2(n-1) symmetric
    extension; parity-preserving single/iterated reflection)."""
    n = i1 - i0
    if n == 1:
        return np.zeros_like(idx)
    per = 2 * (n - 1)
    k = (idx - i0) % per
    k = np.where(k >= n, per - k, k)
    return k


def _sr1d_53(x: np.ndarray, i0: int, i1: int) -> np.ndarray:
    """1-D 5/3 synthesis on the interleaved signal covering [i0, i1)
    (vectorized lifting with symmetric extension)."""
    n = i1 - i0
    if n == 1:
        return x if i0 % 2 == 0 else x / 2.0
    idx = np.arange(i0, i1)
    even = idx % 2 == 0
    y = x.astype(np.float64).copy()
    lo = x[_ext_idx(idx[even] - 1, i0, i1)]
    hi = x[_ext_idx(idx[even] + 1, i0, i1)]
    y[even] = x[even] - np.floor((lo + hi + 2.0) / 4.0)
    odd = ~even
    lo = y[_ext_idx(idx[odd] - 1, i0, i1)]
    hi = y[_ext_idx(idx[odd] + 1, i0, i1)]
    y[odd] = x[odd] + np.floor((lo + hi) / 2.0)
    return y


def _mirror(arr, idx, i0, i1):
    n = i1 - i0
    per = 2 * (n - 1) if n > 1 else 1
    k = (idx - i0) % per
    if k >= n:
        k = per - k
    return arr[k]


def _inverse_dwt(subbands, levels, trect, reversible):
    tx0, ty0, tx1, ty1 = trect
    ll = subbands[(0, 0)][0]
    for r in range(1, levels + 1):
        lev = levels - r
        # target LL rect at this step
        ux0 = _ceil_div(tx0, 1 << lev)
        uy0 = _ceil_div(ty0, 1 << lev)
        ux1 = _ceil_div(tx1, 1 << lev)
        uy1 = _ceil_div(ty1, 1 << lev)
        hl = subbands[(r, 1)][0]
        lh = subbands[(r, 2)][0]
        hh = subbands[(r, 3)][0]
        ll = _sr2d(ll, hl, lh, hh, ux0, uy0, ux1, uy1, reversible)
    return ll


def _sr2d(ll, hl, lh, hh, ux0, uy0, ux1, uy1, reversible):
    h = uy1 - uy0
    w = ux1 - ux0
    a = np.zeros((h, w), np.float64)
    # 2D_INTERLEAVE (F.3.4): even/odd by ABSOLUTE coordinate parity
    ex0 = _ceil_div(ux0, 2)
    ey0 = _ceil_div(uy0, 2)
    ox0 = ux0 // 2
    oy0 = uy0 // 2
    ys = np.arange(uy0, uy1)
    xs = np.arange(ux0, ux1)
    ye = ys % 2 == 0
    xe = xs % 2 == 0
    if ll.size:
        a[np.ix_(ye, xe)] = ll[np.ix_(ys[ye] // 2 - ey0,
                                      xs[xe] // 2 - ex0)]
    if hl.size:
        a[np.ix_(ye, ~xe)] = hl[np.ix_(ys[ye] // 2 - ey0,
                                       xs[~xe] // 2 - ox0)]
    if lh.size:
        a[np.ix_(~ye, xe)] = lh[np.ix_(ys[~ye] // 2 - oy0,
                                       xs[xe] // 2 - ex0)]
    if hh.size:
        a[np.ix_(~ye, ~xe)] = hh[np.ix_(ys[~ye] // 2 - oy0,
                                        xs[~xe] // 2 - ox0)]
    # horizontal then vertical synthesis (HOR_SR then VER_SR)
    fn = _sr1d_53 if reversible else _sr1d_97
    for j in range(h):
        a[j, :] = fn(a[j, :], ux0, ux1)
    for i in range(w):
        a[:, i] = fn(a[:, i], uy0, uy1)
    return a


_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _sr1d_97(x: np.ndarray, i0: int, i1: int) -> np.ndarray:
    n = i1 - i0
    if n == 1:
        return x if i0 % 2 == 0 else x / 2.0
    y = x.astype(np.float64).copy()
    even = [i for i in range(i0, i1) if i % 2 == 0]
    odd = [i for i in range(i0, i1) if i % 2 == 1]
    for i in even:
        y[i - i0] *= _K97
    for i in odd:
        y[i - i0] /= _K97
    z = y.copy()
    for i in even:
        z[i - i0] = y[i - i0] - _D97 * (_mirror(y, i - 1, i0, i1)
                                        + _mirror(y, i + 1, i0, i1))
    y = z.copy()
    for i in odd:
        y[i - i0] = z[i - i0] - _G97 * (_mirror(z, i - 1, i0, i1)
                                        + _mirror(z, i + 1, i0, i1))
    z = y.copy()
    for i in even:
        z[i - i0] = y[i - i0] - _B97 * (_mirror(y, i - 1, i0, i1)
                                        + _mirror(y, i + 1, i0, i1))
    y = z.copy()
    for i in odd:
        y[i - i0] = z[i - i0] - _A97 * (_mirror(z, i - 1, i0, i1)
                                        + _mirror(z, i + 1, i0, i1))
    return y


# ---------------------------------------------------------------------------
# JP2 container
# ---------------------------------------------------------------------------

def sniff_jp2(buf: bytes) -> bool:
    return (buf[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n"
            or buf[:4] == b"\xff\x4f\xff\x51")


def decode_jp2(buf: bytes):
    """JP2/J2K bytes → (pixels (h, w[, bands]), geotransform | None,
    nodata=None, meta). GeoJP2 georeferencing via the degenerate
    GeoTIFF uuid box (reused TIFF GeoKey parser)."""
    gt = None
    meta: dict = {}
    cs = buf
    if buf[:4] != b"\xff\x4f\xff\x51":
        cs = None
        off, end = 0, len(buf)
        while off + 8 <= end:
            (n,) = struct.unpack_from(">I", buf, off)
            t = buf[off + 4:off + 8]
            body = off + 8
            if n == 1:
                (n,) = struct.unpack_from(">Q", buf, off + 8)
                body = off + 16
            elif n == 0:
                n = end - off
            if t == b"jp2c":
                cs = buf[body:off + n]
            elif t == b"uuid" and buf[body:body + 16].startswith(
                    b"\xb1\x4b\xf8\xbd\x08\x3d\x4b\x43"):
                # GeoJP2: degenerate GeoTIFF
                try:
                    from .gtiff import decode_gtiff
                    g = decode_gtiff(bytes(buf[body + 16:off + n]))
                    gt = g.geotransform
                    if g.crs:
                        meta["crs"] = g.crs
                except Exception:
                    pass
            off += n
        if cs is None:
            raise ValueError("no jp2c codestream box")
    bands = decode_j2k(cs)
    if len(bands) == 1:
        px = bands[0]
    else:
        px = np.stack(bands, axis=-1)
    return px, gt, None, meta


# ---------------------------------------------------------------------------
# encoder (lossless 5/3, single tile, single layer, LRCP) — the write
# side of the driver; validated by bit-exact roundtrip through the
# golden-tested decoder above (tests/test_jp2.py)
# ---------------------------------------------------------------------------

class MQEncoder:
    def __init__(self):
        self.idx = [0] * N_CTX
        self.mps = [0] * N_CTX
        self.idx[0] = 4
        self.idx[CTX_RL] = 3
        self.idx[CTX_UNI] = 46
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray()
        self.b_valid = False                 # whether out[-1] exists

    def _byteout(self):
        if self.b_valid and self.out and self.out[-1] == 0xFF:
            # stuffed byte: 7 data bits + possible carry (≤ 0x8F)
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            if self.c < 0x8000000:
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8
            else:
                if self.out:
                    self.out[-1] += 1
                    if self.out[-1] == 0xFF:
                        self.c &= 0x7FFFFFF
                        self.out.append((self.c >> 20) & 0xFF)
                        self.c &= 0xFFFFF
                        self.ct = 7
                        self.b_valid = True
                        return
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8
        self.b_valid = True

    def _renorm(self):
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, cx: int, d: int):
        i = self.idx[cx]
        qe = _QE[i]
        if d == self.mps[cx]:
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                self.idx[cx] = _NMPS[i]
                self._renorm()
            else:
                self.c += qe
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if _SWITCH[i]:
                self.mps[cx] = 1 - self.mps[cx]
            self.idx[cx] = _NLPS[i]
            self._renorm()

    def flush(self) -> bytes:
        # SETBITS + two byteouts (Annex C flush): set as many trailing
        # 1 bits as possible without leaving the final interval
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        out = self.out
        while out and out[-1] == 0xFF:       # discard trailing 0xFF
            out.pop()
        return bytes(out)


def encode_codeblock(coef: np.ndarray, band: int, mb: int):
    """EBCOT T1 encoder — the exact mirror of decode_codeblock (same
    pass structure, contexts and run mode). Returns
    (bytes, n_passes, missing_msbs). Routes through codecs/_t1.c when
    available; flat-list Python fallback below."""
    from .native import get_t1
    lib = get_t1()
    if lib is not None:
        h_, w_ = coef.shape
        c32 = np.ascontiguousarray(coef, np.int32)
        cap = max(4096, w_ * h_ * 4 + 1024)
        buf = np.zeros(cap, np.uint8)
        npasses = ctypes.c_int(0)
        missing_ = ctypes.c_int(0)
        rc = lib.t1_encode(
            c32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            w_, h_, band, mb,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            ctypes.byref(npasses), ctypes.byref(missing_))
        if rc >= 0:
            return bytes(buf[:rc]), npasses.value, missing_.value
    zc = (_ZC_LL, _ZC_HL, _ZC_LL, _ZC_HH)[band].tolist()
    h, w = coef.shape
    mag_all = np.abs(coef).astype(np.int64).ravel().tolist()
    sign = (coef < 0).astype(np.uint8).ravel().tolist()
    maxmag = max(mag_all) if mag_all else 0
    n_planes = int(maxmag).bit_length()
    missing = mb - n_planes
    if n_planes == 0:
        return b"", 0, mb
    mq = MQEncoder()
    enc = mq.encode
    W2 = w + 2
    flags = [0] * ((h + 2) * W2)

    def neighbors(fy, fx):
        base = fy * W2 + fx
        f = flags
        hh_ = (f[base - 1] & 1) + (f[base + 1] & 1)
        vv = (f[base - W2] & 1) + (f[base + W2] & 1)
        dd = ((f[base - W2 - 1] & 1) + (f[base - W2 + 1] & 1)
              + (f[base + W2 - 1] & 1) + (f[base + W2 + 1] & 1))
        return hh_, vv, dd

    def sign_ctx(y, x):
        def contrib(yy, xx):
            if yy < 0 or yy >= h or xx < 0 or xx >= w:
                return 0
            if not flags[(yy + 1) * W2 + xx + 1] & 1:
                return 0
            return -1 if sign[yy * w + xx] else 1
        hc = contrib(y, x - 1) + contrib(y, x + 1)
        vc = contrib(y - 1, x) + contrib(y + 1, x)
        hc = -1 if hc < -1 else (1 if hc > 1 else hc)
        vc = -1 if vc < -1 else (1 if vc > 1 else vc)
        return _SC[(hc, vc)]

    def emit_sig(y, x):
        ctx, xor = sign_ctx(y, x)
        enc(ctx, sign[y * w + x] ^ xor)
        flags[(y + 1) * W2 + x + 1] |= _SIG

    def spp(p):
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    fi = (y + 1) * W2 + x + 1
                    fl = flags[fi]
                    if fl & _SIG:
                        continue
                    hh_, vv, dd = neighbors(y + 1, x + 1)
                    if hh_ + vv + dd == 0:
                        continue
                    b = (mag_all[y * w + x] >> p) & 1
                    enc(zc[hh_][vv][dd if dd < 4 else 4], b)
                    if b:
                        emit_sig(y, x)
                    flags[fi] |= _VISITED

    def mrp(p):
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    fi = (y + 1) * W2 + x + 1
                    fl = flags[fi]
                    if not (fl & _SIG) or (fl & _VISITED):
                        continue
                    if fl & _REFINED:
                        ctx = 16
                    else:
                        hh_, vv, dd = neighbors(y + 1, x + 1)
                        ctx = 15 if hh_ + vv + dd else 14
                    enc(ctx, (mag_all[y * w + x] >> p) & 1)
                    flags[fi] |= _REFINED

    def cleanup(p):
        for y0 in range(0, h, 4):
            for x in range(w):
                y = y0
                if y0 + 4 <= h:
                    allclear = True
                    for yy in range(y0, y0 + 4):
                        fl = flags[(yy + 1) * W2 + x + 1]
                        if fl & (_SIG | _VISITED):
                            allclear = False
                            break
                        hh_, vv, dd = neighbors(yy + 1, x + 1)
                        if hh_ + vv + dd:
                            allclear = False
                            break
                    if allclear:
                        first = -1
                        for yy in range(y0, y0 + 4):
                            if (mag_all[yy * w + x] >> p) & 1:
                                first = yy - y0
                                break
                        if first < 0:
                            enc(CTX_RL, 0)
                            continue
                        enc(CTX_RL, 1)
                        enc(CTX_UNI, (first >> 1) & 1)
                        enc(CTX_UNI, first & 1)
                        y = y0 + first
                        emit_sig(y, x)
                        y += 1
                while y < min(y0 + 4, h):
                    fi = (y + 1) * W2 + x + 1
                    fl = flags[fi]
                    if fl & _VISITED:
                        flags[fi] = fl & ~_VISITED
                        y += 1
                        continue
                    if fl & _SIG:
                        y += 1
                        continue
                    hh_, vv, dd = neighbors(y + 1, x + 1)
                    b = (mag_all[y * w + x] >> p) & 1
                    enc(zc[hh_][vv][dd if dd < 4 else 4], b)
                    if b:
                        emit_sig(y, x)
                    y += 1
        nv = ~_VISITED
        for i in range(len(flags)):
            flags[i] &= nv

    n_passes = 3 * n_planes - 2
    p = n_planes - 1
    kind = 2
    done = 0
    while done < n_passes:
        if kind == 0:
            spp(p)
        elif kind == 1:
            mrp(p)
        else:
            cleanup(p)
        done += 1
        if kind == 2:
            p -= 1
            kind = 0
        else:
            kind += 1
    return mq.flush(), n_passes, missing


class TagTreeEncoder:
    def __init__(self, w, h, values: np.ndarray):
        self.levels = [values.astype(np.int64)]
        cur = self.levels[0]
        while cur.shape != (1, 1):
            hh = (cur.shape[0] + 1) // 2
            ww = (cur.shape[1] + 1) // 2
            nxt = np.full((hh, ww), 1 << 30, np.int64)
            for j in range(cur.shape[0]):
                for i in range(cur.shape[1]):
                    nxt[j // 2, i // 2] = min(nxt[j // 2, i // 2],
                                              cur[j, i])
            self.levels.append(nxt)
            cur = nxt
        self.state = [np.zeros(lv.shape, np.int64) for lv in self.levels]
        self.known = [np.zeros(lv.shape, bool) for lv in self.levels]

    def encode(self, putbit, i, j, threshold):
        """Emit bits so the decoder resolves leaf (i, j) against
        ``threshold`` (same walk as TagTree.decode)."""
        path = []
        x, y = i, j
        for lv in self.levels:
            path.append((y, x))
            x //= 2
            y //= 2
        cur_low = 0
        for li in range(len(self.levels) - 1, -1, -1):
            y, x = path[li]
            val = int(self.levels[li][y, x])
            if self.state[li][y, x] < cur_low:
                self.state[li][y, x] = cur_low
            while not self.known[li][y, x] and \
                    self.state[li][y, x] < threshold:
                if self.state[li][y, x] < val:
                    putbit(0)
                    self.state[li][y, x] += 1
                else:
                    putbit(1)
                    self.known[li][y, x] = True
            cur_low = self.state[li][y, x]
            if not self.known[li][y, x]:
                return                      # >= threshold: undecided


class _HdrWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0
        self.prev_ff = False

    def bit(self, b):
        cap = 7 if self.prev_ff else 8
        self.acc = (self.acc << 1) | (b & 1)
        self.bits += 1
        if self.bits == cap:
            byte = self.acc if cap == 8 else self.acc  # 7 bits: MSB=0
            self.out.append(byte)
            self.prev_ff = byte == 0xFF
            self.acc = 0
            self.bits = 0

    def write(self, v, n):
        for k in range(n - 1, -1, -1):
            self.bit((v >> k) & 1)

    def finish(self) -> bytes:
        if self.bits:
            cap = 7 if self.prev_ff else 8
            byte = self.acc << (cap - self.bits)
            self.out.append(byte)
            self.prev_ff = byte == 0xFF
        if self.prev_ff:
            self.out.append(0)              # header cannot end on 0xFF
        return bytes(self.out)


def _fdwt53_1d(x: np.ndarray, i0: int, i1: int) -> np.ndarray:
    """Forward 5/3 analysis on the interleaved signal (inverse of
    _sr1d_53, vectorized)."""
    n = i1 - i0
    if n == 1:
        return x if i0 % 2 == 0 else x * 2.0
    idx = np.arange(i0, i1)
    even = idx % 2 == 0
    odd = ~even
    y = x.astype(np.float64).copy()
    lo = x[_ext_idx(idx[odd] - 1, i0, i1)]
    hi = x[_ext_idx(idx[odd] + 1, i0, i1)]
    y[odd] = x[odd] - np.floor((lo + hi) / 2.0)
    lo = y[_ext_idx(idx[even] - 1, i0, i1)]
    hi = y[_ext_idx(idx[even] + 1, i0, i1)]
    y[even] = x[even] + np.floor((lo + hi + 2.0) / 4.0)
    return y


def _fdwt97_1d(x: np.ndarray, i0: int, i1: int) -> np.ndarray:
    """Forward 9/7 analysis — the exact reverse of _sr1d_97's lifting
    steps (Annex F.4.8 run backwards with flipped signs)."""
    n = i1 - i0
    if n == 1:
        return x if i0 % 2 == 0 else x * 2.0
    idx = np.arange(i0, i1)
    even = idx % 2 == 0
    odd = ~even
    y = x.astype(np.float64).copy()
    for coef, upd_odd in ((_A97, True), (_B97, False),
                          (_G97, True), (_D97, False)):
        sel = odd if upd_odd else even
        lo = y[_ext_idx(idx[sel] - 1, i0, i1)]
        hi = y[_ext_idx(idx[sel] + 1, i0, i1)]
        y[sel] = y[sel] + coef * (lo + hi)
    y[even] /= _K97
    y[odd] *= _K97
    return y


def _fdwt2d(a: np.ndarray, ux0, uy0, ux1, uy1, reversible=True):
    """One analysis level → (ll, hl, lh, hh)."""
    h, w = a.shape
    b = a.astype(np.float64).copy()
    f1d = _fdwt53_1d if reversible else _fdwt97_1d
    for i in range(w):
        b[:, i] = f1d(b[:, i], uy0, uy1)
    for j in range(h):
        b[j, :] = f1d(b[j, :], ux0, ux1)
    ex0 = _ceil_div(ux0, 2) * 2
    ey0 = _ceil_div(uy0, 2) * 2
    xe = [x - ux0 for x in range(ux0, ux1) if x % 2 == 0]
    xo = [x - ux0 for x in range(ux0, ux1) if x % 2 == 1]
    ye = [y - uy0 for y in range(uy0, uy1) if y % 2 == 0]
    yo = [y - uy0 for y in range(uy0, uy1) if y % 2 == 1]
    ll = b[np.ix_(ye, xe)]
    hl = b[np.ix_(ye, xo)]
    lh = b[np.ix_(yo, xe)]
    hh = b[np.ix_(yo, xo)]
    return ll, hl, lh, hh


_NORM_CACHE: dict = {}


def _band_norms(levels: int) -> dict:
    """L2 norms of each subband's 9/7 synthesis basis, computed
    numerically against this module's own inverse DWT (impulse
    response) — used to weight lossy quantization steps. Cached per
    decomposition depth."""
    if levels in _NORM_CACHE:
        return _NORM_CACHE[levels]
    N = 1 << max(7, levels + 3)
    shapes = {}
    ux1 = uy1 = N
    for r in range(levels, 0, -1):
        hw = ux1 - _ceil_div(ux1, 2)
        hh_ = uy1 - _ceil_div(uy1, 2)
        ux1 = _ceil_div(ux1, 2)
        uy1 = _ceil_div(uy1, 2)
        shapes[(r, 1)] = (uy1, hw)
        shapes[(r, 2)] = (hh_, ux1)
        shapes[(r, 3)] = (hh_, hw)
    shapes[(0, 0)] = (uy1, ux1)
    norms = {}
    for key, (sh, sw) in shapes.items():
        subs = {k: (np.zeros(s),) for k, s in shapes.items()}
        a = np.zeros((sh, sw))
        a[sh // 2, sw // 2] = 1.0
        subs[key] = (a,)
        img = _inverse_dwt(subs, levels, (0, 0, N, N), False)
        norms[key] = float(np.sqrt((img ** 2).sum()))
    _NORM_CACHE[levels] = norms
    return norms


def _qparams(delta: float, rb: int):
    """Step size → (ε, μ, realized step) with
    Δ = 2^(Rb−ε)·(1+μ/2048) (Annex E.1) — the decoder reconstructs
    from ε/μ, so quantization uses the realized step."""
    eps = rb - int(math.floor(math.log2(delta)))
    eps = min(max(eps, 0), 31)
    base = 2.0 ** (rb - eps)
    mu = int(round((delta / base - 1.0) * 2048.0))
    mu = min(max(mu, 0), 2047)
    return eps, mu, base * (1.0 + mu / 2048.0)


def encode_j2k(bands: list, levels: int = 2, lossy: bool = False,
               quality: float = 50.0) -> bytes:
    """Component arrays → JPEG2000 codestream (single tile, single
    layer, LRCP, 64×64 code-blocks, default precincts, no MCT).
    Default: 5/3 reversible lossless. ``lossy=True``: 9/7
    irreversible with scalar-expounded quantization (steps weighted
    by the synthesis-basis norms; ``quality`` ~ 50 is visually
    transparent for 8-bit data, halving it doubles the step) —
    components beyond the first get explicit COC + QCC segments
    (per-component styles, frmts/openjpeg write parity)."""
    NC = len(bands)
    h, w = bands[0].shape
    dt = bands[0].dtype
    signed = np.issubdtype(dt, np.signedinteger)
    prec = dt.itemsize * 8
    if prec > 16:
        raise ValueError("JP2 encode supports up to 16-bit samples")
    gains = {0: 0, 1: 1, 2: 1, 3: 2}
    band_keys = [(0, 0)] + [(r, o) for r in range(1, levels + 1)
                            for o in (1, 2, 3)]

    # ---- analysis (+ quantization when lossy)
    dc = 0 if signed else (1 << (prec - 1))
    per_comp_subs: list[dict] = []
    per_comp_q: list[dict] = []        # (ci) -> {(r,o): (eps, mu)}
    for px in bands:
        a = px.astype(np.float64) - dc
        subs = {}
        ux1, uy1 = w, h
        cur = a
        for r in range(levels, 0, -1):
            ll, hl, lh, hh = _fdwt2d(cur, 0, 0, ux1, uy1,
                                     reversible=not lossy)
            subs[(r, 1)] = hl
            subs[(r, 2)] = lh
            subs[(r, 3)] = hh
            ux1 = _ceil_div(ux1, 2)
            uy1 = _ceil_div(uy1, 2)
            cur = ll
        subs[(0, 0)] = cur
        qp = {}
        if lossy:
            norms = _band_norms(levels)
            for key in band_keys:
                rb = prec + gains[key[1]]
                want = (2.0 ** (prec - 8)
                        * 2.0 ** ((50.0 - quality) / 12.0)) \
                    / norms[key]
                eps, mu, step = _qparams(want, rb)
                q = np.trunc(subs[key] / step).astype(np.int64)
                # magnitudes must fit mb = guard(2) + eps - 1 planes
                while eps > 0 and int(np.abs(q).max()) \
                        .bit_length() > eps + 1:
                    eps, mu, step = _qparams(
                        2.0 ** (rb - eps + 1), rb)
                    q = np.trunc(subs[key] / step).astype(np.int64)
                subs[key] = q
                qp[key] = (eps, mu)
        else:
            for key in band_keys:
                subs[key] = subs[key].astype(np.int64)
        per_comp_subs.append(subs)
        per_comp_q.append(qp)

    out = bytearray()
    out += b"\xff\x4f"                       # SOC
    # SIZ
    siz = struct.pack(">H", 0) + struct.pack(">8I", w, h, 0, 0, w, h,
                                             0, 0) + \
        struct.pack(">H", NC)
    for _ in range(NC):
        siz += bytes([(0x80 if signed else 0) | (prec - 1), 1, 1])
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    # COD: Scod=0, LRCP, 1 layer, no MCT, levels, 64x64, cbstyle 0
    wavelet = 0 if lossy else 1
    cod = bytes([0, 0]) + struct.pack(">H", 1) + bytes(
        [0, levels, 4, 4, 0, wavelet])
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    if lossy:
        # QCD (component 0, scalar expounded) + explicit COC/QCC for
        # every further component
        def q_seg(ci):
            body = bytes([(2 << 5) | 2])
            for key in band_keys:
                eps, mu = per_comp_q[ci][key]
                body += struct.pack(">H", (eps << 11) | mu)
            return body
        out += b"\xff\x5c" + struct.pack(">H", len(q_seg(0)) + 2) \
            + q_seg(0)
        for ci in range(1, NC):
            coc = (bytes([ci]) if NC < 257 else struct.pack(">H", ci))
            coc += bytes([0, levels, 4, 4, 0, wavelet])
            out += b"\xff\x53" + struct.pack(">H", len(coc) + 2) + coc
            qcc = (bytes([ci]) if NC < 257 else struct.pack(">H", ci))
            qcc += q_seg(ci)
            out += b"\xff\x5d" + struct.pack(">H", len(qcc) + 2) + qcc
    else:
        # QCD: reversible, guard 2: exponent per band = prec + gain
        qcd = bytes([2 << 5]) + bytes([
            (min(prec + gains[o], 31)) << 3 for _, o in
            [(0, 0)] + [(r, o) for r in range(1, levels + 1)
                        for o in (1, 2, 3)]])
        out += b"\xff\x5c" + struct.pack(">H", len(qcd) + 2) + qcd

    # per-band mb for the T1 encoder
    mbs = []
    for ci in range(NC):
        m = {}
        for key in band_keys:
            if lossy:
                m[key] = 2 + per_comp_q[ci][key][0] - 1
            else:
                m[key] = 2 + min(prec + gains[key[1]], 31) - 1
        mbs.append(m)

    # ---- tile body
    body = _encode_tile(per_comp_subs, mbs, levels)
    psot = 12 + 2 + len(body)
    out += b"\xff\x90" + struct.pack(">HHIBB", 10, 0, psot, 0, 1)
    out += b"\xff\x93" + body
    out += b"\xff\xd9"                       # EOC
    return bytes(out)


def _encode_tile(per_comp_bands, mbs, levels) -> bytes:
    packets = bytearray()

    # LRCP, 1 layer: packets ordered r, then component
    for r in range(levels + 1):
        for ci in range(len(per_comp_bands)):
            subs = per_comp_bands[ci]
            borients = (0,) if r == 0 else (1, 2, 3)
            hb = _HdrWriter()
            hb.write(1, 1)                   # non-empty
            bodies = []
            for bo in borients:
                arr = subs[(r, bo)].astype(np.int64)
                bh, bw = arr.shape
                mb = mbs[ci][(r, bo)]
                nbx = max(_ceil_div(bw, 64), 1) if bw else 0
                nby = max(_ceil_div(bh, 64), 1) if bh else 0
                if bw == 0 or bh == 0:
                    continue
                zvals = np.zeros((nby, nbx), np.int64)
                ivals = np.zeros((nby, nbx), np.int64)
                blocks = []
                for byi in range(nby):
                    for bxi in range(nbx):
                        blk = arr[byi * 64:(byi + 1) * 64,
                                  bxi * 64:(bxi + 1) * 64]
                        data, np_, miss = encode_codeblock(blk, bo, mb)
                        zvals[byi, bxi] = miss
                        if np_ == 0:
                            ivals[byi, bxi] = 1      # not in layer 0
                        blocks.append((bxi, byi, data, np_, miss))
                ti = TagTreeEncoder(nbx, nby, ivals)
                tz = TagTreeEncoder(nbx, nby, zvals)
                for bxi, byi, data, np_, miss in blocks:
                    ti.encode(hb.bit, bxi, byi, 1)   # inclusion
                    if np_ == 0:
                        continue                     # excluded block
                    tz.encode(hb.bit, bxi, byi, 1 << 30)
                    # npasses
                    if np_ == 1:
                        hb.write(0, 1)
                    elif np_ == 2:
                        hb.write(1, 1)
                        hb.write(0, 1)
                    elif np_ <= 5:
                        hb.write(0b11, 2)
                        hb.write(np_ - 3, 2)
                    elif np_ <= 36:
                        hb.write(0b11, 2)
                        hb.write(0b11, 2)
                        hb.write(np_ - 6, 5)
                    else:
                        hb.write(0b11, 2)
                        hb.write(0b11, 2)
                        hb.write(0b11111, 5)
                        hb.write(np_ - 37, 7)
                    # Lblock: grow from 3 until length fits
                    lblock = 3
                    nbits = lblock + int(math.floor(math.log2(np_))) \
                        if np_ else lblock
                    while len(data) >= (1 << nbits):
                        hb.write(1, 1)
                        lblock += 1
                        nbits += 1
                    hb.write(0, 1)
                    hb.write(len(data), nbits)
                    bodies.append(data)
            packets += hb.finish()
            for d in bodies:
                packets += d
    return bytes(packets)


def encode_jp2(pixels: np.ndarray, *, geotransform=None,
               crs: str | None = None, levels: int = 2,
               lossy: bool = False, quality: float = 50.0) -> bytes:
    """(h, w[, bands]) integer raster → .jp2 (JP2 container with
    ihdr/colr and a GeoJP2 uuid box when georeferenced). Lossless 5/3
    by default; ``lossy=True`` → 9/7 with scalar-expounded
    quantization (see encode_j2k)."""
    px = pixels if pixels.ndim == 3 else pixels[:, :, None]
    bands = [np.ascontiguousarray(px[:, :, k]) for k in range(px.shape[2])]
    cs = encode_j2k(bands, levels=levels, lossy=lossy, quality=quality)
    h, w, nb = px.shape
    prec = px.dtype.itemsize * 8
    signed = np.issubdtype(px.dtype, np.signedinteger)

    def box(tag, payload):
        return struct.pack(">I", len(payload) + 8) + tag + payload

    ihdr = struct.pack(">IIHBBBB", h, w, nb,
                       (0x80 if signed else 0) | (prec - 1), 7, 0, 0)
    colr = b"\x01\x00\x00" + struct.pack(">I", 17 if nb == 1 else 16)
    jp2h = box(b"ihdr", ihdr) + box(b"colr", colr)
    out = box(b"jP  ", b"\r\n\x87\n")
    out += box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    out += box(b"jp2h", jp2h)
    if geotransform is not None:
        from .gtiff import encode_gtiff
        geo = encode_gtiff(np.zeros((1, 1), np.uint8),
                           geotransform=geotransform, crs=crs)
        uuid = (b"\xb1\x4b\xf8\xbd\x08\x3d\x4b\x43"
                b"\xa5\xae\x8c\xd7\xd5\xa6\xce\x03")
        out += box(b"uuid", uuid + geo)
    out += box(b"jp2c", cs)
    return out
