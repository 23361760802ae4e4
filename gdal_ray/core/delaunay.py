"""Delaunay triangulation + linear (barycentric) grid interpolation.

Reference semantics: alg/gdalgrid.cpp GDALGridLinear (triangulate the
scattered points once, then interpolate each grid node inside its
containing triangle; nodes outside the convex hull fall back to the
nearest neighbour within `radius`, else nodata). The reference uses
qhull; this is an independent Bowyer-Watson implementation (published
algorithm, Bowyer 1981 / Watson 1981) in pure numpy — O(n·t) per
insertion with vectorized circumcircle tests, fine for the bounded
point layers gdal_grid targets (it holds all points in memory too).

Scale shape: the triangulation is GLOBAL state computed once from the
(bounded) point side and broadcast via ray.put; each grid tile
interpolates against only the triangles whose bbox intersects the
tile, so the per-task cost is local.
"""

from __future__ import annotations

import numpy as np


def delaunay(pts: np.ndarray) -> np.ndarray:
    """(n, 2) points → (m, 3) int32 triangle vertex indices (CCW).

    Bowyer-Watson with a super-triangle; duplicate points must be
    deduplicated by the caller."""
    pts = np.asarray(pts, np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), np.int32)

    # super-triangle comfortably containing everything
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    r = max(np.abs(pts[:, 0] - cx).max(), np.abs(pts[:, 1] - cy).max(),
            1.0) * 16.0
    sup = np.array([[cx - 2 * r, cy - r], [cx + 2 * r, cy - r],
                    [cx, cy + 2 * r]])
    vp = np.vstack([pts, sup])
    si = np.array([n, n + 1, n + 2])

    tris = [(si[0], si[1], si[2])]

    def circum(tri_arr):
        """Circumcenters + squared radii for an (m,3) index array."""
        a, b, c = vp[tri_arr[:, 0]], vp[tri_arr[:, 1]], vp[tri_arr[:, 2]]
        d = 2 * (a[:, 0] * (b[:, 1] - c[:, 1])
                 + b[:, 0] * (c[:, 1] - a[:, 1])
                 + c[:, 0] * (a[:, 1] - b[:, 1]))
        d = np.where(np.abs(d) < 1e-300, 1e-300, d)
        a2 = (a * a).sum(1); b2 = (b * b).sum(1); c2 = (c * c).sum(1)
        ux = (a2 * (b[:, 1] - c[:, 1]) + b2 * (c[:, 1] - a[:, 1])
              + c2 * (a[:, 1] - b[:, 1])) / d
        uy = (a2 * (c[:, 0] - b[:, 0]) + b2 * (a[:, 0] - c[:, 0])
              + c2 * (b[:, 0] - a[:, 0])) / d
        rr = (vp[tri_arr[:, 0], 0] - ux) ** 2 \
            + (vp[tri_arr[:, 0], 1] - uy) ** 2
        return ux, uy, rr

    tri_arr = np.array(tris, np.int64)
    ux, uy, rr = circum(tri_arr)

    for ip in range(n):
        px, py = vp[ip]
        bad = ((px - ux) ** 2 + (py - uy) ** 2) <= rr * (1 + 1e-12)
        bad_tris = tri_arr[bad]
        # cavity boundary = edges appearing exactly once among bad tris
        edges = {}
        for t in bad_tris:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                if k in edges:
                    del edges[k]
                else:
                    edges[k] = e
        keep = tri_arr[~bad]
        new = np.array([(e[0], e[1], ip) for e in edges.values()],
                       np.int64).reshape(-1, 3)
        tri_arr = np.vstack([keep, new])
        nux, nuy, nrr = circum(new) if len(new) else (np.empty(0),) * 3
        ux = np.concatenate([ux[~bad], nux])
        uy = np.concatenate([uy[~bad], nuy])
        rr = np.concatenate([rr[~bad], nrr])

    # drop triangles touching the super-triangle
    real = (tri_arr < n).all(axis=1)
    out = tri_arr[real]
    # orient CCW
    a, b, c = vp[out[:, 0]], vp[out[:, 1]], vp[out[:, 2]]
    cw = ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
          - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])) < 0
    out[cw] = out[cw][:, ::-1]
    return out.astype(np.int32)


def linear_interp(gx: np.ndarray, gy: np.ndarray, pts: np.ndarray,
                  vals: np.ndarray, tris: np.ndarray,
                  radius: float | None = None) -> np.ndarray:
    """Barycentric interpolation of grid nodes (gx, gy) over the
    triangulation; nodes outside the hull → nearest point within
    `radius` (GDALGridLinear's fallback) else NaN."""
    shape = gx.shape
    X = gx.ravel(); Y = gy.ravel()
    out = np.full(X.shape, np.nan)
    if len(tris):
        # prune triangles to the node bbox (tiles are local windows)
        a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
        tminx = np.minimum(np.minimum(a[:, 0], b[:, 0]), c[:, 0])
        tmaxx = np.maximum(np.maximum(a[:, 0], b[:, 0]), c[:, 0])
        tminy = np.minimum(np.minimum(a[:, 1], b[:, 1]), c[:, 1])
        tmaxy = np.maximum(np.maximum(a[:, 1], b[:, 1]), c[:, 1])
        sel = ((tmaxx >= X.min()) & (tminx <= X.max())
               & (tmaxy >= Y.min()) & (tminy <= Y.max()))
        tt = tris[sel]
        if len(tt):
            a, b, c = pts[tt[:, 0]], pts[tt[:, 1]], pts[tt[:, 2]]
            # barycentric coords for every (node, triangle) pair
            det = ((b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0])
                   + (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1]))
            det = np.where(np.abs(det) < 1e-300, 1e-300, det)
            dx = X[:, None] - c[None, :, 0]
            dy = Y[:, None] - c[None, :, 1]
            l1 = ((b[None, :, 1] - c[None, :, 1]) * dx
                  + (c[None, :, 0] - b[None, :, 0]) * dy) / det[None, :]
            l2 = ((c[None, :, 1] - a[None, :, 1]) * dx
                  + (a[None, :, 0] - c[None, :, 0]) * dy) / det[None, :]
            l3 = 1.0 - l1 - l2
            eps = 1e-10
            inside = (l1 >= -eps) & (l2 >= -eps) & (l3 >= -eps)
            hit = inside.argmax(axis=1)
            has = inside.any(axis=1)
            v = (l1[np.arange(len(X)), hit] * vals[tt[hit, 0]]
                 + l2[np.arange(len(X)), hit] * vals[tt[hit, 1]]
                 + l3[np.arange(len(X)), hit] * vals[tt[hit, 2]])
            out = np.where(has, v, out)
    if radius is not None:
        miss = np.isnan(out)
        if miss.any() and len(pts):
            d2 = ((X[miss, None] - pts[None, :, 0]) ** 2
                  + (Y[miss, None] - pts[None, :, 1]) ** 2)
            nd = d2.min(axis=1)
            ni = d2.argmin(axis=1)
            fb = np.where(nd <= radius * radius, vals[ni], np.nan)
            out[miss] = fb
    return out.reshape(shape)
