"""ISO/IEC 8211 (DDF) record reader — the container under S-57 ENC
charts (and other IHO products).

Reference: ogr/ogrsf_frmts/iso8211/ (ddfrecord.cpp etc.), layout per
the public ISO 8211 spec: every record = 24-byte leader (record
length [0:5], base address of field area [12:17], entry map sizes
[20:23] = size-of-field-length, size-of-field-position,
size-of-tag), directory of (tag, length, position) entries terminated
by 0x1E, then the field area with 0x1E-terminated fields. The first
record is the DDR (field definitions; skipped — S-57 field layouts
are fixed by the product spec). ``read_8211(buf)`` yields, per data
record, an ordered list of (tag, raw_bytes) with the terminator
stripped.
"""

from __future__ import annotations

__all__ = ["read_8211"]

FT = 0x1E  # field terminator
UT = 0x1F  # unit terminator


def _leader(buf: bytes, off: int):
    rec_len = int(buf[off:off + 5])
    base = int(buf[off + 12:off + 17])
    size_len = int(chr(buf[off + 20]))
    size_pos = int(chr(buf[off + 21]))
    size_tag = int(chr(buf[off + 23]))
    return rec_len, base, size_len, size_pos, size_tag


def read_8211(buf: bytes):
    """Yield one list of (tag, field_bytes) per DATA record (the DDR
    is consumed but not yielded)."""
    off = 0
    first = True
    n = len(buf)
    while off + 24 <= n:
        try:
            rec_len, base, size_len, size_pos, size_tag = _leader(buf, off)
        except ValueError:
            break
        if rec_len <= 0 or off + rec_len > n + 1:
            break
        rec = buf[off:off + rec_len]
        # directory
        entry_sz = size_tag + size_len + size_pos
        dpos = 24
        entries = []
        while dpos + entry_sz <= base - 1 and rec[dpos] != FT:
            tag = rec[dpos:dpos + size_tag].decode("ascii", "replace")
            ln = int(rec[dpos + size_tag:dpos + size_tag + size_len])
            ps = int(rec[dpos + size_tag + size_len:dpos + entry_sz])
            entries.append((tag, ln, ps))
            dpos += entry_sz
        fields = []
        for tag, ln, ps in entries:
            data = rec[base + ps:base + ps + ln]
            if data.endswith(bytes([FT])):
                data = data[:-1]
            fields.append((tag, data))
        if not first:
            yield fields
        first = False
        off += rec_len
