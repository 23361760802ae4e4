"""Raster↔vector algorithms — pure numpy (no scipy/GEOS).

Reference semantics:
  rasterize    alg/gdalrasterize.cpp:571-878 — default burn rule: pixel
               whose *center* is inside the polygon; MERGE_ALG
               REPLACE/ADD
  polygonize   alg/polygonize.cpp — connected components of equal-valued
               pixels (4- or 8-connected), boundary rings traced
  sieve        alg/gdalsievefilter.cpp — merge small components into
               their largest neighbor
  proximity    alg/gdalproximity.cpp — distance to nearest target pixel
               (two-pass chamfer here; exact for small rasters via the
               brute mode)
  fillnodata   alg/rasterfill.cpp — IDW fill from nearest valid pixels
  grid (IDW)   alg/gdalgrid.cpp:110 invdist
  interpolate  alg/gdal_interpolateatpoint.cpp:165 (near/bilinear)
"""

from __future__ import annotations

import numpy as np

from . import geom
from . import geotransform as gtr
from .wkb import Geometry

# ---------------------------------------------------------------------------
# rasterize
# ---------------------------------------------------------------------------

def rasterize(shapes, out_shape, transform, *, fill=0, merge_alg="replace",
              all_touched=False, dtype=np.float64):
    """Burn (geometry, value) pairs into a grid.

    shapes: iterable of (Geometry, value); transform: geotransform of
    the output grid; burn rule = pixel-center-in-polygon (GDAL default
    scanline semantics); merge_alg: 'replace' | 'add'.

    all_touched=True additionally burns every pixel whose CLOSED cell
    rectangle the geometry boundary intersects (gdalrasterize.cpp
    ALL_TOUCHED / GDALdllImageLineAllTouched): interior via the normal
    center test plus a supercover walk of each ring edge; an edge
    running exactly along a cell boundary burns both neighbors."""
    h, w = out_shape
    out = np.full((h, w), fill, dtype=dtype)
    inv = gtr.inverse(transform)
    for g, val in shapes:
        env = g.envelope()
        # envelope → pixel window (clamped)
        c0, r0 = gtr.apply(inv, env[0], env[3])
        c1, r1 = gtr.apply(inv, env[2], env[1])
        pad = 1 if all_touched else 0   # closed-boundary neighbors
        cmin = max(int(np.floor(min(c0, c1))) - pad, 0)
        cmax = min(int(np.ceil(max(c0, c1))) + pad, w)
        rmin = max(int(np.floor(min(r0, r1))) - pad, 0)
        rmax = min(int(np.ceil(max(r0, r1))) + pad, h)
        if cmin >= cmax or rmin >= rmax:
            continue
        cols = np.arange(cmin, cmax) + 0.5
        rows = np.arange(rmin, rmax) + 0.5
        cc, rr = np.meshgrid(cols, rows)
        xs, ys = gtr.apply(transform, cc.ravel(), rr.ravel())
        burn = geom.points_in_polygon(xs, ys, g).reshape(rr.shape)
        if all_touched:
            touched = np.zeros_like(burn)
            for ring in getattr(g, "rings", []) or []:
                pc, pr = gtr.apply(inv, ring[:, 0], ring[:, 1])
                for k in range(len(pc) - 1):
                    _burn_edge_touched(touched, pc[k] - cmin, pr[k] - rmin,
                                       pc[k + 1] - cmin, pr[k + 1] - rmin)
            burn |= touched
        win = out[rmin:rmax, cmin:cmax]
        if merge_alg == "add":
            win[burn] += val
        else:
            win[burn] = val
    return out


def _burn_edge_touched(mask: np.ndarray, x0, y0, x1, y1):
    """Mark every cell whose closed unit square the segment
    (x0,y0)→(x1,y1) intersects (pixel coordinates relative to the
    mask window). Supercover: split the segment at every gridline
    crossing; each sub-segment midpoint names a cell, and each
    breakpoint that lies exactly on a gridline also marks the
    neighbors sharing that boundary."""
    h, w = mask.shape
    ts = [0.0, 1.0]
    dx, dy = x1 - x0, y1 - y0
    for (p0, d, lo, hi) in ((x0, dx, min(x0, x1), max(x0, x1)),
                            (y0, dy, min(y0, y1), max(y0, y1))):
        if d != 0.0:
            for k in range(int(np.ceil(lo)), int(np.floor(hi)) + 1):
                t = (k - p0) / d
                if 0.0 <= t <= 1.0:
                    ts.append(t)
    ts = np.unique(np.clip(ts, 0.0, 1.0))

    def mark(px, py):
        xs = [int(np.floor(px))]
        if px == np.floor(px):
            xs.append(int(px) - 1)
        ys = [int(np.floor(py))]
        if py == np.floor(py):
            ys.append(int(py) - 1)
        for cx in xs:
            for cy in ys:
                if 0 <= cx < w and 0 <= cy < h:
                    mask[cy, cx] = True

    # sub-segment midpoints: the interior cells the segment passes
    mids = (ts[:-1] + ts[1:]) / 2.0
    for t in mids:
        px, py = x0 + t * dx, y0 + t * dy
        cx, cy = int(np.floor(px)), int(np.floor(py))
        if 0 <= cx < w and 0 <= cy < h:
            mask[cy, cx] = True
    # breakpoints: boundary touches include both neighbors
    for t in ts:
        mark(x0 + t * dx, y0 + t * dy)


# ---------------------------------------------------------------------------
# connected components (run-based union-find) + polygonize
# ---------------------------------------------------------------------------

def label_components(band: np.ndarray, connectedness: int = 4) -> np.ndarray:
    """Label connected components of equal-valued pixels (run-based
    union-find: runs are found vectorized per row, unions happen only
    between overlapping runs of adjacent rows — O(runs), not O(pixels),
    of Python work; alg/polygonize.cpp's two-scanline structure)."""
    h, w = band.shape
    # run starts per row, vectorized over the whole band
    starts_mask = np.ones((h, w), dtype=bool)
    starts_mask[:, 1:] = band[:, 1:] != band[:, :-1]
    run_id = np.cumsum(starts_mask.ravel()).reshape(h, w) - 1
    n_runs = int(run_id[-1, -1]) + 1
    parent = np.arange(n_runs, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    # per-row run tables
    rows_starts = [np.flatnonzero(starts_mask[y]) for y in range(h)]
    off = 1 if connectedness == 8 else 0
    for y in range(1, h):
        sa = rows_starts[y - 1]
        ea = np.append(sa[1:], w)          # prev-row run extents
        sb = rows_starts[y]
        eb = np.append(sb[1:], w)
        va = band[y - 1, sa]
        vb = band[y, sb]
        ida = run_id[y - 1, sa]
        idb = run_id[y, sb]
        # candidate overlaps ([sb-off, eb+off) vs [sa, ea)) via merge walk
        i = np.searchsorted(ea, sb - off, side="right")
        for j in range(len(sb)):
            k = i[j]
            while k < len(sa) and sa[k] < eb[j] + off:
                if va[k] == vb[j]:
                    ra, rb = find(int(ida[k])), find(int(idb[j]))
                    if ra != rb:
                        parent[rb] = ra
                k += 1
    # flatten with full path compression (vectorized repeat until fixed)
    roots = parent.copy()
    while True:
        nxt = roots[roots]
        if (nxt == roots).all():
            break
        roots = nxt
    # renumber in first-appearance (row-major) order
    uniq, first, inv = np.unique(roots, return_index=True, return_inverse=True)
    rank = np.argsort(np.argsort(first))
    return rank[inv][run_id]


def _trace_rings(mask: np.ndarray):
    """Boundary rings of a pixel mask: collect unit edges between mask
    and non-mask (or border), stitch into closed rings in pixel coords.
    Returns list of (ring_pts, is_outer). Pixel (x, y) spans
    [x, x+1] × [y, y+1]."""
    h, w = mask.shape
    # directed edges kept so interiors are always to the left:
    # outer rings CCW (in y-down pixel space: clockwise visually), holes CW
    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add(a, b):
        edges.setdefault(a, []).append(b)

    m = np.asarray(mask, bool)
    pad = np.zeros((1, w), bool)
    padc = np.zeros((h, 1), bool)
    # vectorized boundary detection: an edge exists where the neighbor
    # (or border) is outside the mask
    top = m & ~np.vstack([pad, m[:-1]])
    bot = m & ~np.vstack([m[1:], pad])
    left = m & ~np.hstack([padc, m[:, :-1]])
    right = m & ~np.hstack([m[:, 1:], padc])
    ys, xs = np.nonzero(top)
    for y, x in zip(ys.tolist(), xs.tolist()):   # top edge, left→right
        add((x, y), (x + 1, y))
    ys, xs = np.nonzero(bot)
    for y, x in zip(ys.tolist(), xs.tolist()):   # bottom edge, right→left
        add((x + 1, y + 1), (x, y + 1))
    ys, xs = np.nonzero(left)
    for y, x in zip(ys.tolist(), xs.tolist()):   # left edge, bottom→top
        add((x, y + 1), (x, y))
    ys, xs = np.nonzero(right)
    for y, x in zip(ys.tolist(), xs.tolist()):   # right edge, top→bottom
        add((x + 1, y), (x + 1, y + 1))

    rings = []
    while edges:
        start = next(iter(edges))
        ring = [start]
        cur = start
        prev_dir = None
        while True:
            outs = edges.get(cur)
            if not outs:
                break
            # prefer continuing straight, else turn; pop chosen edge
            nxt = outs.pop(0)
            if not outs:
                del edges[cur]
            ring.append(nxt)
            cur = nxt
            if cur == start:
                break
        # collapse collinear runs
        pts = np.array(ring, dtype=np.float64)
        keep = [0]
        for i in range(1, len(pts) - 1):
            d0 = pts[i] - pts[keep[-1]]
            d1 = pts[i + 1] - pts[i]
            if d0[0] * d1[1] - d0[1] * d1[0] != 0:
                keep.append(i)
        keep.append(len(pts) - 1)
        pts = pts[keep]
        area2 = float(np.sum(pts[:-1, 0] * pts[1:, 1] - pts[1:, 0] * pts[:-1, 1]))
        rings.append((pts, area2 > 0))  # edge scheme: outer rings close
        # with positive shoelace (interiors kept left in y-down coords)
    return rings


def polygonize(band: np.ndarray, transform=None, connectedness: int = 4,
               mask: np.ndarray | None = None):
    """Connected components → list of (value, Geometry polygon).

    Holes are attached to their enclosing component's polygon. transform
    maps pixel coords to world (None = pixel space)."""
    from .wkb import POLYGON

    labels = label_components(band, connectedness)
    out = []
    for lab in range(labels.max() + 1):
        m = labels == lab
        if mask is not None and not (m & mask).any():
            continue
        ys, xs = np.nonzero(m)
        val = band[ys[0], xs[0]]
        rings = _trace_rings(m)
        outers = [r for r, is_outer in rings if is_outer]
        holes = [r for r, is_outer in rings if not is_outer]
        if not outers:
            continue
        ring_list = outers + holes  # single outer expected per component
        if transform is not None:
            ring_list = [np.column_stack(gtr.apply(transform, r[:, 0], r[:, 1]))
                         for r in ring_list]
        out.append((val, Geometry(POLYGON, rings=[np.asarray(r) for r in ring_list])))
    return out


def sieve(band: np.ndarray, threshold: int, connectedness: int = 4) -> np.ndarray:
    """Replace components smaller than threshold px with the value of
    their largest neighboring component (gdalsievefilter semantics)."""
    out = band.copy()
    for _ in range(8):  # iterate: merging can create new small components
        labels = label_components(out, connectedness)
        sizes = np.bincount(labels.ravel())
        small = np.nonzero(sizes < threshold)[0]
        if len(small) == 0:
            break
        changed = False
        for lab in small:
            m = labels == lab
            # neighbor labels via shifted masks
            nb = np.zeros_like(m)
            nb[1:, :] |= m[:-1, :]; nb[:-1, :] |= m[1:, :]
            nb[:, 1:] |= m[:, :-1]; nb[:, :-1] |= m[:, 1:]
            nb &= ~m
            if not nb.any():
                continue
            nlabs = labels[nb]
            best = nlabs[np.argmax(sizes[nlabs])]
            # gdalsievefilter merges into the largest neighbor even if
            # that neighbor is itself small; iteration coalesces chains
            ys, xs = np.nonzero(labels == best)
            out[m] = out[ys[0], xs[0]]
            changed = True
        if not changed:
            break
    return out


# ---------------------------------------------------------------------------
# proximity / fillnodata
# ---------------------------------------------------------------------------

def proximity(target_mask: np.ndarray, cellsize: float = 1.0,
              max_dist: float | None = None) -> np.ndarray:
    """Exact Euclidean distance to the nearest target pixel
    (alg/gdalproximity.cpp computes true Euclidean via per-scanline
    nearest-target tracking; we use an equivalent exact two-phase EDT,
    fully vectorized).

    Phase 1: per column, |Δrow| to the nearest target in that column
    (two vectorized row sweeps). Phase 2: per row, min over columns of
    sqrt(d1² + Δcol²), evaluated as a chunked (rows × w × w) broadcast
    so no Python per-pixel loop runs."""
    h, w = target_mask.shape
    INF = np.float64(1e18)
    tm = np.asarray(target_mask, bool)
    # phase 1: vertical distance per column
    d1 = np.where(tm, 0.0, INF)
    for y in range(1, h):
        np.minimum(d1[y], d1[y - 1] + 1.0, out=d1[y])
    for y in range(h - 2, -1, -1):
        np.minimum(d1[y], d1[y + 1] + 1.0, out=d1[y])
    # phase 2: horizontal relaxation, exact min over source columns
    xs = np.arange(w, dtype=np.float64)
    dx2 = (xs[:, None] - xs[None, :]) ** 2            # (w, w)
    d1sq = np.where(d1 >= INF, INF, d1 * d1)
    out = np.empty((h, w), np.float64)
    chunk = max(1, int(4_000_000 // (w * w)) or 1)
    for y0 in range(0, h, chunk):
        blk = d1sq[y0:y0 + chunk]                     # (c, w)
        out[y0:y0 + chunk] = (blk[:, None, :] + dx2[None, :, :]).min(axis=2)
    d = np.sqrt(np.where(out >= INF, np.inf, out)) * cellsize
    if max_dist is not None:
        d = np.minimum(d, max_dist)
    return d


def fillnodata(band: np.ndarray, valid_mask: np.ndarray,
               max_iterations: int = 64) -> np.ndarray:
    """Fill invalid pixels by iterative 3×3 mean of valid neighbors
    (grows inward like rasterfill's ring expansion)."""
    out = band.astype(np.float64).copy()
    valid = valid_mask.copy()
    for _ in range(max_iterations):
        if valid.all():
            break
        vp = np.pad(valid, 1)
        op = np.pad(np.where(valid, out, 0.0), 1)
        cnt = np.zeros_like(out)
        acc = np.zeros_like(out)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                cnt += vp[1 + dy:1 + dy + out.shape[0], 1 + dx:1 + dx + out.shape[1]]
                acc += op[1 + dy:1 + dy + out.shape[0], 1 + dx:1 + dx + out.shape[1]]
        newly = (~valid) & (cnt > 0)
        out[newly] = acc[newly] / cnt[newly]
        valid |= newly
    return out


# ---------------------------------------------------------------------------
# grid interpolation + point probe
# ---------------------------------------------------------------------------

def grid_idw(px_pts: np.ndarray, values: np.ndarray, out_shape, transform,
             *, power: float = 2.0, radius: float | None = None,
             smoothing: float = 0.0) -> np.ndarray:
    """Inverse-distance-weighted interpolation of scattered points onto a
    grid (gdalgrid invdist). px_pts: (n, 2) world coords."""
    h, w = out_shape
    cols = np.arange(w) + 0.5
    rows = np.arange(h) + 0.5
    cc, rr = np.meshgrid(cols, rows)
    gx, gy = gtr.apply(transform, cc, rr)
    out = np.zeros((h, w), dtype=np.float64)
    d2 = ((gx[..., None] - px_pts[None, None, :, 0]) ** 2
          + (gy[..., None] - px_pts[None, None, :, 1]) ** 2 + smoothing**2)
    if radius is not None:
        d2 = np.where(d2 > radius**2, np.inf, d2)
    exact = d2 < 1e-18
    wgt = 1.0 / np.power(np.maximum(d2, 1e-300), power / 2.0)
    wgt = np.where(np.isinf(d2), 0.0, wgt)
    wsum = wgt.sum(axis=2)
    out = (wgt * values[None, None, :]).sum(axis=2) / np.where(wsum == 0, np.nan, wsum)
    # exact hits take the point value
    hit_any = exact.any(axis=2)
    if hit_any.any():
        first = exact.argmax(axis=2)
        out = np.where(hit_any, values[first], out)
    return out


def interpolate_at_point(band: np.ndarray, transform, xs, ys,
                         method: str = "bilinear"):
    """Sample a band at world coords (GDALInterpolateAtPoint near/
    bilinear). Returns (values, valid mask)."""
    inv = gtr.inverse(transform)
    cols, rows = gtr.apply(inv, np.asarray(xs, np.float64), np.asarray(ys, np.float64))
    h, w = band.shape
    if method == "near":
        ix = np.floor(cols).astype(np.int64)
        iy = np.floor(rows).astype(np.int64)
        ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        vals = np.zeros(len(np.atleast_1d(cols)))
        vals[ok] = band[iy[ok], ix[ok]]
        return vals, ok
    fx, fy = cols - 0.5, rows - 0.5
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    tx, ty = fx - x0, fy - y0
    vals = np.zeros_like(fx)
    wsum = np.zeros_like(fx)
    for dy in (0, 1):
        for dx in (0, 1):
            xx, yy = x0 + dx, y0 + dy
            ok = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
            wgt = (tx if dx else 1 - tx) * (ty if dy else 1 - ty) * ok
            vals += np.where(ok, band[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)], 0) * wgt
            wsum += wgt
    ok = wsum > 0
    return np.where(ok, vals / np.maximum(wsum, 1e-300), 0.0), ok


def footprint(band: np.ndarray, nodata=0, transform=None):
    """Raster footprint (apps/gdal_footprint_lib.cpp): the outline
    multipolygon of valid (!= nodata) pixels.

    Traces the binary validity mask ONCE (no per-component label pass):
    outer rings become parts, holes attach to the outer ring containing
    their first vertex."""
    from . import geom as _geom
    from .wkb import Geometry, POLYGON, multipolygon

    if isinstance(nodata, float) and np.isnan(nodata):
        mask = ~np.isnan(band)
    else:
        mask = band != nodata
    if not mask.any():
        return None
    rings = _trace_rings(mask)
    outers = [r for r, is_outer in rings if is_outer]
    holes = [r for r, is_outer in rings if not is_outer]
    if transform is not None:
        def to_world(r):
            x, y = gtr.apply(transform, r[:, 0], r[:, 1])
            return np.column_stack([x, y])
        outers = [to_world(r) for r in outers]
        holes = [to_world(r) for r in holes]
    if len(outers) == 1:
        return Geometry(POLYGON, rings=[outers[0]] + holes)
    polys = []
    for o in outers:
        mine = [hh for hh in holes
                if _geom.points_in_ring(hh[:1, 0], hh[:1, 1], o)[0]]
        polys.append(Geometry(POLYGON, rings=[o] + mine))
    return multipolygon(polys)
