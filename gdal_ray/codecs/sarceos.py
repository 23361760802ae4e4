"""SAR CEOS reader — RadarSAT-1 / ERS / JERS style CEOS SAR products.

Reference driver: frmts/ceos2/ (sar_ceosdataset.cpp + the recipe
engine in ceosrecipe.c).  This module implements the RadarSat recipe
subset the reference's local fixtures exercise
(autotest/gdrivers/sar_ceos.py: R1_26161_FN1_F164.D with .L leader,
ottawa_patch.img):

  * CEOS records: u32BE sequence, 4 type-code bytes, u32BE length;
  * imagery options file descriptor fields at the RadarSatRecipe
    1-based offsets (ceosrecipe.c:60-115): channels@233, lines@237,
    left/right border@245/257, pixels-per-line@249, bytes-per-pixel
    @225, records-per-line@273, prefix ("image data start")@277,
    suffix@289, interleave@269, data type@429;
  * ImageDataStart quirk (ceosrecipe.c:356-385): the prefix field is
    record-relative, +12-byte header unless already 192/544/800;
  * BytesPerRecord from the length of the first processed-data record
    (type code 50,11,18,20);
  * data types per the CeosDataType table (IU1/UI1, IU2/UI2, CI*2,
    CI*4/CIS4, CI*8, C*8, R*4), big-endian, truncated files padded
    with zeros like the reference's error-tolerant read;
  * leader (.L / LEA_01.001) dataset summary metadata (CEOS_* keys,
    sar_ceosdataset.cpp:961-1000) for both the standard (18,10,18,20)
    and ASF (10,10,18,20) type codes;
  * GCPs sampled from the 192-byte line prefix lat/lon microdegree
    fields at record bytes 132/144 (ScanForGCPs,
    sar_ceosdataset.cpp:1764-1860), skipped for ASF facilities.
"""

from __future__ import annotations

import os
import struct

import numpy as np

__all__ = ["read_sar_ceos"]

_DTYPES = {
    "IU1": ("u1", 1), "UI1": ("u1", 1),
    "IU2": (">u2", 1), "UI2": (">u2", 1),
    "CI*2": ("i1", 2), "CI*4": (">i2", 2), "CIS4": (">i2", 2),
    "CI*8": (">i4", 2), "C*8": (">f4", 2), "R*4": (">f4", 1),
}

_SUMMARY_FIELDS = [
    ("CEOS_ACQUISITION_TIME", 69, 32),
    ("CEOS_ASC_DES", 101, 16),
    ("CEOS_TRUE_HEADING", 149, 16),
    ("CEOS_ELLIPSOID", 165, 16),
    ("CEOS_SEMI_MAJOR", 181, 16),
    ("CEOS_SEMI_MINOR", 197, 16),
    ("CEOS_SCENE_LENGTH_KM", 341, 16),
    ("CEOS_SCENE_WIDTH_KM", 357, 16),
    ("CEOS_MISSION_ID", 397, 16),
    ("CEOS_SENSOR_ID", 413, 32),
    ("CEOS_ORBIT_NUMBER", 445, 8),
    ("CEOS_PLATFORM_LATITUDE", 453, 8),
    ("CEOS_PLATFORM_LONGITUDE", 461, 8),
    ("CEOS_PLATFORM_HEADING", 469, 8),
    ("CEOS_SENSOR_CLOCK_ANGLE", 477, 8),
    ("CEOS_INC_ANGLE", 485, 8),
    ("CEOS_FACILITY", 1047, 16),
    ("CEOS_LINE_SPACING_METERS", 1687, 16),
    ("CEOS_PIXEL_SPACING_METERS", 1703, 16),
]

_SUMMARY_TCS = (b"\x12\x0a\x12\x14",     # (18,10,18,20) standard
                b"\x0a\x0a\x12\x14",     # (10,10,18,20) ASF
                b"\x0a\x0a\x1f\x14")     # (10,10,31,20) ERS2
_PROC_DATA_TCS = (b"\x32\x0b\x12\x14",   # (50,11,18,20)
                  b"\x32\x0b\x1f\x14",   # (50,11,31,20) ERS alt
                  b"\x32\x0b\x1f\x32",   # (50,11,31,50) ERS alt2
                  b"\x32\x0a\x12\x14")   # (50,10,18,20) ALOS2 L1.1


def _records(buf: bytes):
    pos = 0
    while pos + 12 <= len(buf):
        ln = int.from_bytes(buf[pos + 8:pos + 12], "big")
        if ln < 12:
            break
        yield buf[pos + 4:pos + 8], pos, ln
        pos += ln


def _ascii_int(buf: bytes, off1: int, width: int) -> int:
    s = buf[off1 - 1:off1 - 1 + width].decode("ascii", "replace").strip()
    try:
        return int(s)
    except ValueError:
        return 0


def _ascii_str(buf: bytes, off1: int, width: int) -> str:
    return buf[off1 - 1:off1 - 1 + width].decode("ascii", "replace").strip()


def _find_leader(path: str) -> str | None:
    base, ext = os.path.splitext(path)
    cands = []
    if ext.lower() == ".d":
        cands += [base + ".L", base + ".l"]
    d = os.path.dirname(path) or "."
    for n in ("LEA_01.001", "lea_01.001"):
        cands.append(os.path.join(d, n))
    for c in cands:
        if os.path.exists(c):
            return c
    return None


class SarCeos:
    def __init__(self, pixels, metadata, gcps, dtype_name):
        self.pixels = pixels             # (bands, h, w)
        self.metadata = metadata
        self.gcps = gcps                 # [(id, pixel, line, x, y, z)]
        self.dtype_name = dtype_name


def read_sar_ceos(path: str) -> SarCeos:
    buf = open(path, "rb").read()
    fd_len = int.from_bytes(buf[8:12], "big")
    fd = buf[:fd_len]

    nchan = max(_ascii_int(fd, 233, 4), 1)
    lines = _ascii_int(fd, 237, 8)
    ppl = _ascii_int(fd, 249, 8)
    lbp = _ascii_int(fd, 245, 4)
    rbp = _ascii_int(fd, 257, 4)
    bpp = _ascii_int(fd, 225, 4)
    rpl = max(_ascii_int(fd, 273, 2), 1)
    prefix = _ascii_int(fd, 277, 4)
    pdbpr = _ascii_int(fd, 281, 8)
    interleave = _ascii_str(fd, 269, 4) or "BSQ"
    dtype_name = _ascii_str(fd, 429, 4)

    # ceosrecipe.c ImageDataStart quirk
    ids = prefix
    if ids not in (192, 544, 800):
        ids += 12

    if ppl == 0 and pdbpr and bpp:
        ppl = pdbpr // bpp

    # BytesPerRecord from the first processed-data record header
    bpr = 0
    for tc, pos, ln in _records(buf[fd_len:]):
        if tc in _PROC_DATA_TCS:
            bpr = ln
            break
    if bpr == 0:
        bpr = ids + ppl * bpp + _ascii_int(fd, 289, 4)

    np_dtype, ncomp = _DTYPES.get(dtype_name, ("u1", 1))
    itemsize = np.dtype(np_dtype).itemsize * ncomp
    if bpp and itemsize != bpp:
        # trust the descriptor's bytes-per-pixel for plain ints
        if ncomp == 1 and bpp in (1, 2, 4):
            np_dtype = {1: "u1", 2: ">u2", 4: ">u4"}[bpp]
            itemsize = bpp

    width = ppl
    data = np.zeros((nchan, lines, width * ncomp),
                    dtype=np.dtype(np_dtype).newbyteorder("="))
    raw_dt = np.dtype(np_dtype)
    nbytes_line = width * ncomp * raw_dt.itemsize
    for ch in range(nchan):
        for line in range(lines):
            if interleave.strip() in ("BIL",):
                recno = (nchan * line + ch) * rpl
            elif interleave.strip() in ("BSQ",):
                recno = (ch * lines + line) * rpl
            else:
                recno = line * rpl
            off = fd_len + recno * bpr + ids + lbp * itemsize
            chunk = buf[off:off + nbytes_line]
            if not chunk:
                continue
            if len(chunk) < nbytes_line:
                chunk = chunk + b"\0" * (nbytes_line - len(chunk))
            data[ch, line] = np.frombuffer(chunk, dtype=raw_dt)
    if ncomp == 2:
        comp = data.astype(np.float32).view(np.complex64) \
            if raw_dt.itemsize <= 4 else data.astype(np.float64).view(
                np.complex128)
        pixels = comp.reshape(nchan, lines, width)
    else:
        pixels = data.reshape(nchan, lines, width)
    if rbp:
        pixels = pixels[:, :, :width]

    # ---------------- leader metadata ----------------
    metadata: dict[str, str] = {}
    leader = _find_leader(path)
    leader_buf = open(leader, "rb").read() if leader else b""
    summary = None
    for tc, pos, ln in _records(leader_buf):
        if tc in _SUMMARY_TCS:
            summary = leader_buf[pos:pos + ln]
            break
    if summary is not None:
        for key, off1, w in _SUMMARY_FIELDS:
            val = _ascii_str(summary, off1, w)
            if val:
                metadata[key] = val

    # ---------------- GCPs from line-prefix lat/lon ----------------
    gcps = []
    facility = metadata.get("CEOS_FACILITY", "")
    if ids >= 192 and not facility.startswith("ASF") and lines > 1:
        nmax = 15
        step = max((lines - 1) // (nmax // 3 - 1), 1)
        for scan in range(0, lines, step):
            if len(gcps) > nmax - 3:
                break
            off = fd_len + scan * rpl * bpr
            rec = buf[off:off + 192]
            if len(rec) < 192:
                break
            for igcp in range(3):
                lat = struct.unpack_from(">i", rec, 132 + 4 * igcp)[0]
                lon = struct.unpack_from(">i", rec, 144 + 4 * igcp)[0]
                if lat or lon:
                    px = (0.5, width / 2.0, width - 0.5)[igcp]
                    gcps.append((str(len(gcps) + 1), px, scan + 0.5,
                                 lon / 1e6, lat / 1e6, 0.0))
    return SarCeos(pixels, metadata, gcps, dtype_name)
