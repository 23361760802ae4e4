"""Pairwise polygon overlay — intersection geometry/area without GEOS.

Reference semantics: OGR layer algebra Intersection
(ogr/ogrsf_frmts/generic/ogrlayer.cpp:5386, pairwise
`x_geom->Intersection(y_geom)` at :5566 via GEOS). We reproduce the
result *exactly for areas* with elementary machinery:

  * Sutherland–Hodgman clip of an arbitrary ring against a CONVEX
    clipper (exact; concave subjects may gain zero-width bridges, which
    do not affect area);
  * ear-clipping triangulation of a simple (possibly concave) ring;
    the triangles partition the polygon, so
    area(A ∩ B) = Σ_tri area(A ∩ tri) is exact for any simple B;
  * holes handled by inclusion–exclusion on both sides:
    area(A ∩ B) = area(Aout ∩ B) − Σ area(Ahole ∩ B), and B's holes
    subtract the same way.
"""

from __future__ import annotations

import numpy as np

from .geom import ring_area
from .wkb import Geometry, MULTIPOLYGON, POLYGON


def _close(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, np.float64)
    if len(r) and not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


def _open(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, np.float64)
    if len(r) > 1 and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    return r


def is_convex(ring: np.ndarray) -> bool:
    """True if the (open or closed) ring is convex."""
    r = _open(ring)
    if len(r) < 3:
        return False
    d = np.diff(np.vstack([r, r[:2]]), axis=0)
    cross = d[:-1, 0] * d[1:, 1] - d[:-1, 1] * d[1:, 0]
    return bool((cross >= -1e-9).all() or (cross <= 1e-9).all())


def sh_clip(subject: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip `subject` ring by CONVEX `clip_ring`.
    Returns the clipped ring (open, possibly empty)."""
    clip = _open(clip_ring)
    # ensure CCW orientation so "inside" is left of each edge
    if ring_area(_close(clip)) < 0:
        clip = clip[::-1]
    out = _open(subject)
    n = len(clip)
    for i in range(n):
        if len(out) == 0:
            break
        a = clip[i]
        b = clip[(i + 1) % n]
        ex, ey = b[0] - a[0], b[1] - a[1]
        # signed side of every subject vertex vs this clip edge
        sx = out[:, 0] - a[0]
        sy = out[:, 1] - a[1]
        side = ex * sy - ey * sx          # >=0 → inside (left)
        nxt = np.roll(side, -1)
        cur_in = side >= -1e-12
        nxt_in = nxt >= -1e-12
        res = []
        m = len(out)
        for j in range(m):
            p = out[j]
            q = out[(j + 1) % m]
            if cur_in[j]:
                res.append(p)
            if cur_in[j] != nxt_in[j]:
                t = side[j] / (side[j] - nxt[j])
                res.append(p + t * (q - p))
        out = np.array(res, np.float64) if res else np.empty((0, 2))
    return out


def triangulate(ring: np.ndarray) -> list:
    """Ear-clipping triangulation of a simple ring (no holes).
    Returns a list of (3, 2) arrays partitioning the polygon."""
    r = _open(ring)
    if ring_area(_close(r)) < 0:
        r = r[::-1]                        # CCW
    idx = list(range(len(r)))
    tris = []
    max_iters = 4 * len(r) + 16
    guard = 0
    while len(idx) > 3:
        guard += 1
        if guard > max_iters:
            raise ValueError(
                f"ear-clipping failed to converge on a {len(r)}-vertex "
                "ring (self-intersecting or degenerate input?)")
        n = len(idx)
        for k in range(n):
            i0, i1, i2 = idx[(k - 1) % n], idx[k], idx[(k + 1) % n]
            a, b, c = r[i0], r[i1], r[i2]
            # convex corner?
            cr = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            if cr <= 1e-12:
                continue
            # no other vertex inside the candidate ear
            others = [r[j] for j in idx if j not in (i0, i1, i2)]
            if others:
                P = np.array(others)
                d0 = (b[0] - a[0]) * (P[:, 1] - a[1]) - (b[1] - a[1]) * (P[:, 0] - a[0])
                d1 = (c[0] - b[0]) * (P[:, 1] - b[1]) - (c[1] - b[1]) * (P[:, 0] - b[0])
                d2 = (a[0] - c[0]) * (P[:, 1] - c[1]) - (a[1] - c[1]) * (P[:, 0] - c[0])
                # inside OR on the ear boundary blocks the ear (a vertex
                # on the diagonal means the ear spans a reflex region)
                if ((d0 >= -1e-12) & (d1 >= -1e-12) & (d2 >= -1e-12)).any():
                    continue
            tris.append(np.array([a, b, c]))
            idx.pop(k)
            break
        else:
            raise ValueError(
                "no ear found - ring is self-intersecting or degenerate; "
                "triangulation would silently drop area")
    if len(idx) == 3:
        tris.append(np.array([r[idx[0]], r[idx[1]], r[idx[2]]]))
    return tris


def _rings_of(g: Geometry):
    """[(outer, holes)] for polygon or multipolygon."""
    if g.geom_type == POLYGON:
        return [(g.rings[0], g.rings[1:])]
    if g.geom_type == MULTIPOLYGON:
        out = []
        for p in g.parts:
            out.append((p.rings[0], p.rings[1:]))
        return out
    raise ValueError(f"overlay expects polygonal input, got {g.type_name}")


def _area_vs_convex(a: Geometry, convex_ring: np.ndarray) -> float:
    """area(a ∩ convex_ring) by clipping each of a's rings."""
    total = 0.0
    for outer, holes in _rings_of(a):
        co = sh_clip(outer, convex_ring)
        if len(co) >= 3:
            total += abs(ring_area(_close(co)))
        for hh in holes:
            ch = sh_clip(hh, convex_ring)
            if len(ch) >= 3:
                total -= abs(ring_area(_close(ch)))
    return total


def intersection_area(a: Geometry, b: Geometry) -> float:
    """Exact area of a ∩ b for simple polygonal geometries (polygons,
    holes, multipolygons; concavity fine on both sides)."""
    total = 0.0
    for outer, holes in _rings_of(b):
        pieces = [outer] if is_convex(outer) else triangulate(outer)
        for piece in pieces:
            total += _area_vs_convex(a, piece)
        for hh in holes:
            hp = [hh] if is_convex(hh) else triangulate(hh)
            for piece in hp:
                total -= _area_vs_convex(a, piece)
    return total


def intersection_pieces(a: Geometry, b: Geometry):
    """Clipped geometry pieces of a ∩ b (one clipped ring per convex
    piece of b that a's outer rings survive). Exact for convex b (single
    piece); for concave b the pieces are the per-triangle clips —
    correct as a region (they partition the true intersection) though
    not dissolved into one polygon."""
    out = []
    for outer_b, _holes_b in _rings_of(b):
        pieces = [outer_b] if is_convex(outer_b) else triangulate(outer_b)
        for piece in pieces:
            for outer_a, _h in _rings_of(a):
                c = sh_clip(outer_a, piece)
                if len(c) >= 3 and abs(ring_area(_close(c))) > 1e-12:
                    out.append(Geometry(POLYGON, rings=[_close(c)]))
    return out
