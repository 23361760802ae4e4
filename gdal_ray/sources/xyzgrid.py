"""XYZ ASCII grid driver — the reference's XYZ format (frmts/xyz/
xyzdataset.cpp): one ``X Y Z`` line per pixel at pixel-center
coordinates, optional header line naming the columns in any order,
configurable column separator. The grid geometry is INFERRED from the
coordinates (regular spacing required, either Y direction accepted),
as the reference does on open.

Golden parity target: a byte.tif-shaped roundtrip reproduces checksum
4672 and the geotransform asserted in autotest/gdrivers/xyz.py:28-40.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_xyz", "decode_xyz"]


def encode_xyz(band: np.ndarray, geotransform, *,
               column_separator: str = " ",
               add_header_line: bool = False,
               decimal_precision: int | None = None) -> str:
    """Serialize a single band: rows top-down, pixel-center coords
    (the reference's CreateCopy order). Values print as integers when
    the band is integral, else repr floats."""
    band = np.asarray(band)
    if band.ndim != 2:
        raise ValueError("XYZ serializes a single band")
    h, w = band.shape
    gt = geotransform
    cols = np.arange(w) + 0.5
    rows = np.arange(h) + 0.5
    xs = gt[0] + cols * gt[1]
    out = []
    sep = column_separator
    if add_header_line:
        out.append(sep.join(("X", "Y", "Z")))
    integral = np.issubdtype(band.dtype, np.integer)
    fmt = (None if decimal_precision is None
           else f"{{:.{decimal_precision}f}}")
    if gt[2] != 0.0 or gt[4] != 0.0:
        raise ValueError("XYZ requires a north-up geotransform")
    for r in range(h):
        yv = gt[3] + rows[r] * gt[5]
        vals = band[r]
        for c in range(w):
            if integral:
                z = str(int(vals[c]))
            elif fmt:
                z = fmt.format(float(vals[c]))
            else:
                z = repr(float(vals[c]))
            out.append(f"{xs[c]!r}{sep}{yv!r}{sep}{z}")
    return "\n".join(out) + "\n"


def _split(line: str):
    for sep in (",", ";", "\t"):
        if sep in line:
            return [t for t in line.replace(sep, " ").split() if t]
    return line.split()


def decode_xyz(text: str):
    """Parse XYZ text → (band float64 (h, w), geotransform). Accepts a
    header line naming X/Y/Z in any order, any of space/comma/
    semicolon/tab separators, lines in any order (the reference
    requires a sorted file for streaming; we sort — same result)."""
    lines = [ln for ln in text.splitlines()
             if ln.strip() and not ln.lstrip().startswith("#")]
    if not lines:
        raise ValueError("empty XYZ file")
    order = (0, 1, 2)
    first = _split(lines[0])
    if any(not _is_number(t) for t in first):
        names = [t.upper() for t in first]
        try:
            order = (names.index("X"), names.index("Y"), names.index("Z"))
        except ValueError as e:
            raise ValueError(f"bad XYZ header {lines[0]!r}") from e
        lines = lines[1:]
    arr = np.array([[float(t) for t in _split(ln)] for ln in lines],
                   np.float64)
    if arr.shape[1] < 3:
        raise ValueError("XYZ lines need 3 columns")
    x, y, z = arr[:, order[0]], arr[:, order[1]], arr[:, order[2]]
    ux = np.unique(x)
    uy = np.unique(y)
    w, h = len(ux), len(uy)
    if w * h != len(arr):
        raise ValueError("XYZ coordinates do not form a full grid")
    dx = np.diff(ux)
    dy = np.diff(uy)
    if w > 1 and not np.allclose(dx, dx[0], rtol=1e-6):
        raise ValueError("irregular X spacing")
    if h > 1 and not np.allclose(dy, dy[0], rtol=1e-6):
        raise ValueError("irregular Y spacing")
    # a single row/column cannot carry its own spacing: fall back to
    # 1.0 (the reference requires >= 2 distinct coords per axis too)
    resx = float(dx[0]) if w > 1 else 1.0
    resy = float(dy[0]) if h > 1 else 1.0
    # north-up raster: row 0 = max Y
    ci = np.searchsorted(ux, x)
    ri = (h - 1) - np.searchsorted(uy, y)
    band = np.full((h, w), np.nan)
    band[ri, ci] = z
    gt = (float(ux[0]) - resx / 2.0, resx, 0.0,
          float(uy[-1]) + resy / 2.0, 0.0, -resy)
    return band, gt


def _is_number(t: str) -> bool:
    try:
        float(t)
        return True
    except ValueError:
        return False
