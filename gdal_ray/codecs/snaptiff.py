"""SNAP TIFF (ESA SNAP / Sentinel-1 BEAM-DIMAP-in-GeoTIFF) reader.

Independent implementation of the reference's SNAP_TIFF driver
semantics (frmts/snap_tiff/snaptiffdriver.cpp): a (often huge,
sparsely-written) strip GeoTIFF whose GeoTIFFTiePoints tag carries a
full regular geolocation array — the driver validates the grid's
constant pixel spacing against the raster proportions and exposes
the four corner tie points as GCPs (pixel centers, TL/TR/BL/BR) —
and whose tag 65000 holds the BEAM-DIMAP XML with band names, units
and the NO_DATA_VALUE(+_USED) pair.  The CRS of the tie points is
WGS84 (EPSG:4326).
"""

from __future__ import annotations

import io
import struct
import zipfile

__all__ = ["read_snap_tiff_info"]


def _load(path: str) -> bytes:
    if zipfile.is_zipfile(path):
        z = zipfile.ZipFile(path)
        data = z.read(z.namelist()[0])
        if data[:2] == b"PK":
            z2 = zipfile.ZipFile(io.BytesIO(data))
            data = z2.read(z2.namelist()[0])
        return data
    return open(path, "rb").read()


def read_snap_tiff_info(path: str) -> dict:
    """→ {"width", "height", "dtype", "gcps": [(id, pixel, line, x,
    y, z)], "crs", "band_name", "unit", "nodata"}."""
    import numpy as np

    buf = _load(path)
    if buf[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF")
    e = "<" if buf[:2] == b"II" else ">"
    off, = struct.unpack_from(e + "I", buf, 4)
    n, = struct.unpack_from(e + "H", buf, off)
    tags = {}
    for i in range(n):
        t, typ, cnt = struct.unpack_from(e + "HHI", buf, off + 2 + i * 12)
        val, = struct.unpack_from(e + "I", buf, off + 2 + i * 12 + 8)
        tags[t] = (typ, cnt, val)
    w = tags[256][2]
    h = tags[257][2]
    bits = tags.get(258, (0, 0, 8))[2]
    if tags.get(258, (3, 1, 0))[1] == 1 and bits > 0xFFFF:
        bits >>= 16                      # inline SHORT in a LONG slot
    sf = tags.get(339, (0, 0, 1))[2]
    if sf > 0xFFFF:
        sf >>= 16
    dtype = {(32, 3): "float32", (64, 3): "float64",
             (16, 1): "uint16", (8, 1): "uint8",
             (16, 2): "int16", (32, 2): "int32"}.get((bits, sf),
                                                     f"bits{bits}")

    out = {"width": w, "height": h, "dtype": dtype,
           "crs": "EPSG:4326", "gcps": [], "band_name": None,
           "unit": None, "nodata": None}

    # --- corner GCPs from the tie-point geolocation array
    if 33922 in tags:
        typ, cnt, voff = tags[33922]
        if typ == 12 and cnt % 6 == 0:
            num = cnt // 6
            gw = int(round((w * num / h) ** 0.5))
            gh = int(round((h * num / w) ** 0.5))
            if gw * gh == num and gh >= 3:
                per_line = gw * 6
                first = np.frombuffer(buf, e + "f8", per_line, voff)
                last = np.frombuffer(
                    buf, e + "f8", per_line,
                    voff + (gh - 1) * per_line * 8)
                sh = per_line - 6
                for gid, row, k in (("TL", first, 0), ("TR", first, sh),
                                    ("BL", last, 0), ("BR", last, sh)):
                    out["gcps"].append(
                        (gid, float(row[k + 0]), float(row[k + 1]),
                         float(row[k + 3]), float(row[k + 4]),
                         float(row[k + 5])))
                out["geoloc_grid"] = (gw, gh)

    # --- BEAM-DIMAP metadata (tag 65000)
    if 65000 in tags:
        import re
        typ, cnt, voff = tags[65000]
        xml = buf[voff:voff + cnt].split(b"\0")[0] \
            .decode("latin-1", "replace")
        # the DIMAP payload of truncated/sparse products may not be
        # well-formed end to end; extract the first band block
        m = re.search(r"<Spectral_Band_Info>(.*?)</Spectral_Band_Info>",
                      xml, re.S)
        if m:
            block = m.group(1)

            def tagval(name):
                mm = re.search(rf"<{name}>([^<]*)</{name}>", block)
                return mm.group(1).strip() if mm else None
            out["band_name"] = tagval("BAND_NAME")
            out["unit"] = tagval("PHYSICAL_UNIT")
            if (tagval("NO_DATA_VALUE_USED") or "").lower() in \
                    ("true", "1"):
                nd = tagval("NO_DATA_VALUE")
                if nd:
                    out["nodata"] = float(nd)
    return out
