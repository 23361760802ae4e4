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


# ------------------------------------------------------- typed reader
def _parse_formats(fmt: str):
    """Expand a DDF format-control string like ``(A(3),2R(6),4I(2))``
    into a flat list of (type, width|None) — ddfsubfielddefn.cpp
    semantics for the A/I/R/S/C fixed-width and delimited cases and
    B(bits) binary widths."""
    fmt = fmt.strip()
    if fmt.startswith("(") and fmt.endswith(")"):
        fmt = fmt[1:-1]
    out = []
    depth = 0
    part = ""
    parts = []
    for ch in fmt:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(part)
            part = ""
        else:
            part += ch
    if part:
        parts.append(part)
    for p in parts:
        p = p.strip()
        rep = 1
        i = 0
        while i < len(p) and p[i].isdigit():
            i += 1
        if i:
            rep = int(p[:i])
            p = p[i:]
        typ = p[0] if p else "A"
        width = None
        if "(" in p:
            w = p[p.index("(") + 1:p.rindex(")")]
            if w.isdigit():
                width = int(w)
                if typ in ("B", "b"):
                    width //= 8          # B(bits) -> bytes
        out.extend([(typ, width)] * rep)
    return out


def _parse_ddr(fields):
    """DDR field definitions -> {tag: (names, formats, repeating)}."""
    defs = {}
    for tag, data in fields:
        parts = data.split(bytes([UT]))
        if len(parts) < 3:
            continue
        names_raw = parts[1].decode("ascii", "replace")
        repeating = names_raw.startswith("*")
        names = [n.lstrip("*") for n in names_raw.split("!") if n]
        fmts = _parse_formats(parts[2].decode("ascii", "replace"))
        defs[tag] = (names, fmts, repeating)
    return defs


def _decode_subfields(data: bytes, names, fmts, repeating):
    """-> list of {name: value} groups (one unless the field repeats)."""
    groups = []
    pos = 0
    n = len(data)
    while True:
        g = {}
        for (name, (typ, width)) in zip(names, fmts):
            if width is not None:
                raw = data[pos:pos + width]
                pos += width
            else:
                end = pos
                while end < n and data[end] not in (FT, UT):
                    end += 1
                raw = data[pos:end]
                pos = min(end + 1, n)
            if typ in ("I",):
                s = raw.decode("ascii", "replace").strip()
                try:
                    g[name] = int(s) if s else 0
                except ValueError:
                    g[name] = 0
            elif typ in ("R", "S", "E"):
                s = raw.decode("ascii", "replace").strip()
                try:
                    g[name] = float(s) if s else 0.0
                except ValueError:
                    g[name] = 0.0
            elif typ in ("B", "b"):
                g[name] = raw
            else:
                g[name] = raw.decode("ascii", "replace")
        groups.append(g)
        if not repeating or pos >= n:
            break
    return groups


def read_8211_typed(buf: bytes):
    """Yield per data record a list of (tag, [subfield-group dicts]),
    decoding subfields with the DDR's own name/format definitions."""
    defs = None
    off = 0
    n = len(buf)
    first = True
    while off + 24 <= n:
        try:
            rec_len, base, size_len, size_pos, size_tag = _leader(buf, off)
        except ValueError:
            break
        if rec_len <= 0 or off + rec_len > n + 1:
            break
        rec = buf[off:off + rec_len]
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
        if first:
            defs = _parse_ddr(fields)
            first = False
        else:
            typed = []
            for tag, data in fields:
                if defs and tag in defs:
                    names, fmts, repeating = defs[tag]
                    typed.append(
                        (tag, _decode_subfields(data, names, fmts,
                                                repeating)))
                else:
                    typed.append((tag, [{"_raw": data}]))
            yield typed
        off += rec_len


__all__.append("read_8211_typed")
