"""WAsP .map (wind-atlas terrain) reader and writer.

Independent implementation of the WAsP map exchange format (the
reference is ogr/ogrsf_frmts/wasp/ogrwasplayer.cpp): 4 free-text
header lines, then per feature a record line of either
``elev npoints`` (elevation contours, ``%11.3f %11d``) or
``z_left z_right npoints`` (roughness-change lines), followed by the
x/y pairs (``%11.1f %11.1f``, wrapped every four pairs)."""

from __future__ import annotations

import pyarrow as pa

__all__ = ["read_wasp", "write_wasp"]


def read_wasp(path: str) -> pa.Table:
    """→ table (elev | z_left/z_right, wkb linestring)."""
    from ..core import wkb as W

    lines = open(path, encoding="latin-1").read().splitlines()
    body = lines[4:]
    rows = []
    i = 0
    roughness = None
    while i < len(body):
        head = body[i].split()
        i += 1
        if not head:
            continue
        if len(head) == 2:
            z, n = float(head[0]), int(head[1])
            zr = None
            if roughness is None:
                roughness = False
        elif len(head) >= 3:
            z, zr, n = float(head[0]), float(head[1]), int(head[2])
            roughness = True
        else:
            continue
        coords = []
        while len(coords) < 2 * n and i < len(body):
            coords.extend(float(v) for v in body[i].split())
            i += 1
        pts = [(coords[k], coords[k + 1])
               for k in range(0, 2 * n, 2)]
        rows.append((z, zr, pts))

    from_cols: dict = {}
    if roughness:
        from_cols["z_left"] = [r[0] for r in rows]
        from_cols["z_right"] = [r[1] for r in rows]
    else:
        from_cols["elev"] = [r[0] for r in rows]
    from_cols["wkb"] = [W.dumps(W.linestring(r[2])) if len(r[2]) >= 2
                        else None for r in rows]
    return pa.Table.from_pydict(from_cols)


def write_wasp(path: str, features, *, roughness: bool = False,
               header: str = "gdal_ray wasp map") -> None:
    """features: [(z, pts)] or [(z_left, z_right, pts)] with pts =
    [(x, y), ...]; writes the reference's record layout."""
    with open(path, "w", encoding="latin-1") as f:
        f.write(header + "\n")
        f.write(" 0.0 0.0\n")
        f.write(" 1.0 0.0\n")
        f.write(" 1.0 1.0\n")
        for feat in features:
            if roughness:
                zl, zr, pts = feat
                f.write(f"{zl:11.3f} {zr:11.3f} {len(pts):11d}\n")
            else:
                z, pts = feat
                f.write(f"{z:11.3f} {len(pts):11d}\n")
            buf = []
            for k, (x, y) in enumerate(pts):
                buf.append(f"{x:11.1f} {y:11.1f} ")
                if (k + 1) % 4 == 0:
                    f.write("".join(buf).rstrip() + "\n")
                    buf = []
            if buf:
                f.write("".join(buf).rstrip() + "\n")
