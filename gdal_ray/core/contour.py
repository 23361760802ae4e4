"""Contour extraction — marching squares over a raster band.

Reference semantics: alg/contour.cpp + alg/marching_squares/* (segment
generation per 2×2 pixel-center cell, linear interpolation of the
crossing point along each edge, fixed-level and interval modes). GDAL
emits iso-LINES per level; segments are stitched into polylines.

Pure vectorized numpy: all cells are classified at once per level; the
per-level segment table is built from masks, then stitched with a
dict-based walk (O(n_segments), tiny compared to the raster).

Coordinates are pixel-center world coordinates through the
geotransform: pixel (r, c) center sits at gt * (c + 0.5, r + 0.5) —
matching GDAL's contour grid convention (pixel centers are the sample
lattice)."""

from __future__ import annotations

import numpy as np

from . import geotransform as gtr

# marching-squares case table: for each of 16 corner-sign cases, the
# (edge, edge) pairs the iso-line crosses. Edges: 0=top, 1=right,
# 2=bottom, 3=left of the 2x2 sample cell. Ambiguous saddles (5, 10)
# resolved by the cell-center average (standard disambiguation).
_CASES: dict[int, tuple] = {
    0: (), 15: (),
    1: ((3, 0),), 14: ((3, 0),),   # tl corner isolated
    2: ((0, 1),), 13: ((0, 1),),   # tr corner isolated
    4: ((1, 2),), 11: ((1, 2),),   # br corner isolated
    8: ((2, 3),), 7: ((2, 3),),    # bl corner isolated
    3: ((3, 1),), 12: ((3, 1),),   # top/bottom split
    6: ((0, 2),), 9: ((0, 2),),    # left/right split
    # 5 / 10 handled separately (saddle)
}


def _edge_points(level, tl, tr, br, bl, rows, cols, edge):
    """Interpolated crossing world-free (x=col, y=row) pixel coords for
    `edge` of cells at (rows, cols); corner values tl,tr,br,bl."""
    with np.errstate(divide="ignore", invalid="ignore"):
        if edge == 0:      # top: tl → tr
            t = (level - tl) / (tr - tl)
            return cols + t, rows + 0.0
        if edge == 1:      # right: tr → br
            t = (level - tr) / (br - tr)
            return cols + 1.0, rows + t
        if edge == 2:      # bottom: bl → br
            t = (level - bl) / (br - bl)
            return cols + t, rows + 1.0
        # left: tl → bl
        t = (level - tl) / (bl - tl)
        return cols + 0.0, rows + t


def contour_segments(band: np.ndarray, level: float):
    """All iso-line segments for one level: returns (n, 4) array of
    (x0, y0, x1, y1) in pixel coordinates (pixel-center lattice)."""
    b = np.asarray(band, np.float64)
    tl = b[:-1, :-1]
    tr = b[:-1, 1:]
    bl = b[1:, :-1]
    br = b[1:, 1:]
    case = ((tl >= level).astype(np.int8)
            | ((tr >= level).astype(np.int8) << 1)
            | ((br >= level).astype(np.int8) << 2)
            | ((bl >= level).astype(np.int8) << 3))
    segs = []
    rows_g, cols_g = np.mgrid[0:b.shape[0] - 1, 0:b.shape[1] - 1]
    for c, pairs in _CASES.items():
        if not pairs:
            continue
        m = case == c
        if not m.any():
            continue
        r = rows_g[m].astype(np.float64)
        cc = cols_g[m].astype(np.float64)
        v = (tl[m], tr[m], br[m], bl[m])
        for e0, e1 in pairs:
            x0, y0 = _edge_points(level, *v, r, cc, e0)
            x1, y1 = _edge_points(level, *v, r, cc, e1)
            segs.append(np.column_stack([x0, y0, x1, y1]))
    # saddles: cases 5 and 10 → two segments, disambiguated by center
    for c in (5, 10):
        m = case == c
        if not m.any():
            continue
        r = rows_g[m].astype(np.float64)
        cc = cols_g[m].astype(np.float64)
        v = (tl[m], tr[m], br[m], bl[m])
        center = (v[0] + v[1] + v[2] + v[3]) * 0.25
        hi = center >= level
        # case 5 (tl,br high): hi-center merges the diagonal → isolate
        # tr (0,1) and bl (2,3); lo-center isolates tl (3,0) and br (1,2).
        # case 10 (tr,bl high) is the mirror.
        if c == 5:
            pair_hi, pair_lo = ((0, 1), (2, 3)), ((3, 0), (1, 2))
        else:
            pair_hi, pair_lo = ((3, 0), (1, 2)), ((0, 1), (2, 3))
        for sel, prs in ((hi, pair_hi), (~hi, pair_lo)):
            if not sel.any():
                continue
            vs = tuple(a[sel] for a in v)
            rs_, cs_ = r[sel], cc[sel]
            for e0, e1 in prs:
                x0, y0 = _edge_points(level, *vs, rs_, cs_, e0)
                x1, y1 = _edge_points(level, *vs, rs_, cs_, e1)
                segs.append(np.column_stack([x0, y0, x1, y1]))
    if not segs:
        return np.empty((0, 4), np.float64)
    out = np.concatenate(segs)
    out = out[np.isfinite(out).all(axis=1)]
    # drop degenerate zero-length segments (corner value exactly at the
    # level makes both crossings collapse onto the lattice point)
    ln = np.hypot(out[:, 2] - out[:, 0], out[:, 3] - out[:, 1])
    return out[ln > 1e-12]


def stitch_segments(segs: np.ndarray, tol: float = 1e-9):
    """Join segments end-to-end into polylines. Returns list of (k, 2)
    arrays. Closed rings end where they start."""
    n = len(segs)
    if n == 0:
        return []
    # quantized endpoint keys, computed vectorized once
    q = np.round(segs / tol).astype(np.int64)
    ks = list(zip(q[:, 0].tolist(), q[:, 1].tolist()))
    ke = list(zip(q[:, 2].tolist(), q[:, 3].tolist()))
    s0 = segs[:, 0:2].tolist()
    s1 = segs[:, 2:4].tolist()
    adj: dict[tuple, list] = {}
    for i in range(n):
        adj.setdefault(ks[i], []).append((i, False))
        adj.setdefault(ke[i], []).append((i, True))
    used = bytearray(n)
    lines = []
    for start in range(n):
        if used[start]:
            continue
        used[start] = 1
        pts = [s0[start], s1[start]]
        kpts = [ks[start], ke[start]]
        for _ in range(2):
            while True:
                lst = adj.get(kpts[-1])
                nxt = None
                while lst:
                    i, rev = lst.pop()     # lazily discard used entries
                    if not used[i]:
                        nxt = (i, rev)
                        break
                if nxt is None:
                    break
                i, rev = nxt
                used[i] = 1
                if rev:                     # arrived at i's end → walk to start
                    pts.append(s0[i])
                    kpts.append(ks[i])
                else:
                    pts.append(s1[i])
                    kpts.append(ke[i])
            pts.reverse()
            kpts.reverse()
        lines.append(np.array(pts, np.float64))
    return lines


def contour_lines(band: np.ndarray, levels, gt=None):
    """Marching-squares contours: [(level, polyline (k,2) world coords)].

    gt: geotransform mapping the pixel-center lattice to world
    (None → pixel coordinates)."""
    out = []
    for level in levels:
        segs = contour_segments(band, float(level))
        for line in stitch_segments(segs):
            if gt is not None:
                x, y = gtr.apply(gt, line[:, 0] + 0.5, line[:, 1] + 0.5)
                line = np.column_stack([x, y])
            out.append((float(level), line))
    return out
