"""Maptech/NOAA BSB nautical chart reader (.kap / .no1).

Reference semantics: frmts/bsb/bsb_read.c (itself from the public
reverse-engineering described in its header) — ASCII header lines
ended by the 0x1A 0x00 sentinel (continuation lines start with a
blank and merge with a comma), BSB/RA=w,h dims or NOS/RA a,b,w,h,
RGB/i,r,g,b palette entries, VER version; NO1 files store every byte
offset by +9; after the sentinel a color-depth byte, then per
scanline a 7-bit-continued line-number marker followed by RLE runs
(value in the top colorsize bits, run count in the low bits extended
by 0x80-flagged 7-bit bytes, 0x00 ends the row; one-short rows pad a
zero). The trailing big-endian offset index table is not required —
rows are parsed sequentially like the reference's no-index fallback.

Golden parity (tests/test_bsb.py): the reference's own
autotest/gdrivers/bsb.py — rgbsmall.kap / _index / _with_line_break
checksum 30321, truncated variants fail cleanly, australia4c.kap.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_bsb"]


def decode_bsb(buf: bytes):
    """BSB chart bytes → (index pixels (h, w), None, None, meta with
    ``palette`` (n,3) uint8 and the KNP/BSB header fields)."""
    raw = np.frombuffer(buf, np.uint8)
    # NO1 obfuscation: every byte stored +9 ("NOS/" test, bsb_read.c:212)
    if len(buf) >= 4 and bytes(((raw[:4] - 9) % 256).astype(np.uint8)) \
            .startswith(b"NOS/"):
        raw = ((raw.astype(np.int16) - 9) % 256).astype(np.uint8)
        buf = raw.tobytes()

    end = buf.find(b"\x1a\x00")
    if end < 0:
        raise ValueError("not a BSB chart (no 0x1A 0x00 sentinel)")
    header = buf[:end].decode("latin-1", "replace")
    # merge continuation lines (leading blanks) with a comma
    lines: list[str] = []
    for ln in header.replace("\r\n", "\n").replace("\r", "\n") \
            .split("\n"):
        if ln.startswith((" ", "\t")) and lines:
            lines[-1] += "," + ln.strip()
        elif ln:
            lines.append(ln)

    w = h = 0
    palette: dict[int, tuple[int, int, int]] = {}
    meta: dict = {"driver": "BSB"}
    for ln in lines:
        toks = [t.strip() for t in
                ln.replace("/", ",").replace("=", ",").split(",")]
        if ln.upper().startswith("BSB/") or ln.upper().startswith("NOS/"):
            nos = ln.upper().startswith("NOS/")
            if "RA" in toks:
                i = toks.index("RA")
                if nos:
                    w, h = int(toks[i + 3]), int(toks[i + 4])
                else:
                    w, h = int(toks[i + 1]), int(toks[i + 2])
        elif ln.startswith("RGB/"):
            vals = ln[4:].split(",")
            palette[int(vals[0])] = (int(vals[1]), int(vals[2]),
                                     int(vals[3]))
        elif ln.startswith("KNP/") or ln.startswith("KNQ/"):
            for item in ln[4:].split(","):
                if "=" in item:
                    k, v = item.split("=", 1)
                    meta[ln[:3] + "." + k.strip()] = v.strip()
        elif ln.startswith("VER/"):
            meta["VER"] = ln[4:].strip()
    if w <= 0 or h <= 0:
        raise ValueError("BSB header has no RA dimensions")

    pos = end + 2
    colorsize = buf[pos]
    pos += 1
    if 0x31 <= colorsize <= 0x38:          # ASCII-digit variant
        colorsize -= 0x30
    if not 0 < colorsize <= 7:
        raise ValueError(f"BSB bad color size {colorsize}")
    vshift = 7 - colorsize
    vmask = ((1 << colorsize) - 1) << vshift
    cmask = (1 << vshift) - 1

    # trailing big-endian index table: last uint32 points at a table
    # of per-row start offsets (bsb_read.c index-list validation)
    n = len(buf)
    offsets = None
    if n >= 4:
        idx = int.from_bytes(buf[n - 4:n], "big")
        if 0 < idx < n - 4 and (n - 4 - idx) // 4 in (h, h + 1):
            cand = np.frombuffer(buf, ">u4", (n - 4 - idx) // 4, idx)
            if cand[0] >= pos - 1 and (np.diff(cand.astype(np.int64))
                                       > 0).all() and cand[-1] <= n:
                offsets = cand

    px = np.zeros((h, w), np.uint8)
    for row in range(h):
        if offsets is not None:
            pos = int(offsets[row])
        # line-number marker: 7-bit continued (leading zeros skipped)
        while pos < n:
            b = buf[pos]
            pos += 1
            if b or row == 0:
                break
        else:
            break
        marker = b & 0x7F
        while b & 0x80 and pos < n:
            b = buf[pos]
            pos += 1
            marker = marker * 128 + (b & 0x7F)
        ip = 0
        line = px[row]
        while True:
            while pos < n:
                b = buf[pos]
                pos += 1
                if b == 0:
                    break
                val = (b & vmask) >> vshift
                run = b & cmask
                while b & 0x80 and pos < n:
                    b = buf[pos]
                    pos += 1
                    run = run * 128 + (b & 0x7F)
                stop = min(ip + run + 1, w)
                line[ip:stop] = val
                ip = stop
            if ip == w - 1:               # one-short row: pad a zero
                line[w - 1] = 0
                break
            # under-filled row with no index: if the next bytes are
            # not the next row's line marker, the 0 was spurious —
            # keep filling this row (bsb_read.c retry)
            if ip < w and offsets is None and row < h - 1 and pos < n:
                p2, m = pos, 0
                while p2 < n:
                    b2 = buf[p2]
                    p2 += 1
                    if m == 0 and b2 == 0:
                        continue
                    m = m * 128 + (b2 & 0x7F)
                    if not b2 & 0x80:
                        break
                if m in (row + 1, row + 2):
                    break
                continue
            break
        if pos >= n:
            if row < h - 1:
                raise ValueError("truncated BSB file")
            break

    # indices are 1-based on disk; the band is 0-based with the
    # palette shifted down one slot (bsbdataset.cpp IReadBlock)
    px[px > 0] -= 1
    if palette:
        npal = max(palette)
        pal = np.zeros((npal, 3), np.uint8)
        for i, rgb in palette.items():
            if i >= 1:
                pal[i - 1] = rgb
        meta["palette"] = pal
    return px, None, None, meta
