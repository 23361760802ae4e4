"""GCP transformers — affine fit, polynomial (order 1-3), thin-plate
spline. The pixel↔geo mapping family the reference builds from ground
control points.

Reference semantics:
  GDALGCPsToGeoTransform  gcore/gdal_misc.cpp:3155-3474 (2-GCP and
      TL-TR-BR-BL special cases, range normalization, closed-form LSQ,
      hour-glass degeneracy check, 0.25-px approx gate)
  GCP polynomial          alg/gdal_crs.cpp:174-299 (auto order: >=6
      GCPs -> 2 else 1; minimum (n+1)(n+2)/2 points; both directions
      fitted independently; 2-GCP rectangle synthesis :223-247)
  TPS                     alg/gdal_tps.cpp + alg/thinplatespline.cpp:
      kernel phi = d^2 * ln(d^2)  (VizGeorefSpline2DBase_func:175-182),
      affine part + sum constraints; forward and inverse splines each
      fitted on the GCPs.
Golden parity: autotest/gcore/gcps2geotransform.py and
autotest/gcore/transformer.py values replicated in tests/test_gcp.py.

GCPs are an (n, 4) float array of rows (pixel, line, geo_x, geo_y).
All transforms are vectorized over numpy arrays — inside map_batches
these run once per image with precomputed coefficients (fitting is
per-image driver-side or actor-__init__ work, never per batch).
"""

from __future__ import annotations

import numpy as np

__all__ = ["gcps_to_geotransform", "GCPPolynomial", "GCPTps"]


def _compose(a, b):
    """Affine compose: apply(a) then apply(b) (GDALComposeGeoTransforms)."""
    return (b[0] + b[1] * a[0] + b[2] * a[3],
            b[1] * a[1] + b[2] * a[4],
            b[1] * a[2] + b[2] * a[5],
            b[3] + b[4] * a[0] + b[5] * a[3],
            b[4] * a[1] + b[5] * a[4],
            b[4] * a[2] + b[5] * a[5])


def _inv_gt(gt):
    det = gt[1] * gt[5] - gt[2] * gt[4]
    if det == 0.0:
        return None
    inv_det = 1.0 / det
    return ((gt[2] * gt[3] - gt[0] * gt[5]) * inv_det,
            gt[5] * inv_det, -gt[2] * inv_det,
            (-gt[1] * gt[3] + gt[0] * gt[4]) * inv_det,
            -gt[4] * inv_det, gt[1] * inv_det)


def gcps_to_geotransform(gcps, approx_ok: bool = True,
                         pixel_threshold: float = 0.25):
    """First-order fit of GCPs as a geotransform; None when there is no
    (acceptable) solution — mirrors GDALGCPsToGeoTransform including
    its special cases and failure modes."""
    g = np.asarray(gcps, np.float64)
    n = len(g)
    if n < 2:
        return None
    px, ln, X, Y = g[:, 0], g[:, 1], g[:, 2], g[:, 3]

    if n == 2:
        if px[1] == px[0] or ln[1] == ln[0]:
            return None
        gt1 = (X[1] - X[0]) / (px[1] - px[0])
        gt5 = (Y[1] - Y[0]) / (ln[1] - ln[0])
        return (X[0] - px[0] * gt1, gt1, 0.0,
                Y[0] - ln[0] * gt5, 0.0, gt5)

    # 4 corners in TL-TR-BR-BL order, non-rotated: exact result.
    if (n == 4 and ln[0] == ln[1] and ln[2] == ln[3] and px[0] == px[3]
            and px[1] == px[2] and ln[0] != ln[2] and px[0] != px[1]
            and Y[0] == Y[1] and Y[2] == Y[3] and X[0] == X[3]
            and X[1] == X[2] and Y[0] != Y[2] and X[0] != X[1]):
        gt1 = (X[1] - X[0]) / (px[1] - px[0])
        gt5 = (Y[2] - Y[1]) / (ln[2] - ln[1])
        return (X[0] - px[0] * gt1, gt1, 0.0, Y[0] - ln[0] * gt5, 0.0, gt5)

    EPS = 1.0e-12
    if (np.ptp(px) < EPS or np.ptp(ln) < EPS
            or np.ptp(X) < EPS or np.ptp(Y) < EPS):
        return None

    # Range-normalize both spaces, least-squares the affine between the
    # unit squares, then compose the normalizations back out.
    pl_n = (-px.min() / np.ptp(px), 1.0 / np.ptp(px), 0.0,
            -ln.min() / np.ptp(ln), 0.0, 1.0 / np.ptp(ln))
    geo_n = (-X.min() / np.ptp(X), 1.0 / np.ptp(X), 0.0,
             -Y.min() / np.ptp(Y), 0.0, 1.0 / np.ptp(Y))
    x = pl_n[0] + pl_n[1] * px
    y = pl_n[3] + pl_n[5] * ln
    lon = geo_n[0] + geo_n[1] * X
    lat = geo_n[3] + geo_n[5] * Y
    A = np.column_stack([np.ones(n), x, y])
    AtA = A.T @ A
    if np.linalg.det(AtA) == 0.0:
        return None
    cx = np.linalg.solve(AtA, A.T @ lon)
    cy = np.linalg.solve(AtA, A.T @ lat)
    gt_norm = (cx[0], cx[1], cx[2], cy[0], cy[1], cy[2])
    inv_geo = _inv_gt(geo_n)
    if inv_geo is None:
        return None
    gt = _compose(_compose(pl_n, gt_norm), inv_geo)

    # Hour-glass GCP shapes collapse a scale coefficient to ~0.
    if abs(gt[1]) <= 1e-15 or abs(gt[5]) <= 1e-15:
        return None

    if not approx_ok:
        psize = 0.5 * (abs(gt[1]) + abs(gt[2]) + abs(gt[4]) + abs(gt[5]))
        if psize == 0.0:
            return None
        ex = (px * gt[1] + ln * gt[2] + gt[0]) - X
        ey = (px * gt[4] + ln * gt[5] + gt[3]) - Y
        if (np.abs(ex) > pixel_threshold * psize).any() or \
           (np.abs(ey) > pixel_threshold * psize).any():
            return None
    return gt


def _poly_terms(order: int, x, y):
    """Design columns x^i y^j, i+j <= order."""
    cols = []
    for total in range(order + 1):
        for j in range(total + 1):
            i = total - j
            cols.append((x ** i) * (y ** j))
    return np.column_stack(cols)


class _PolyDir:
    """One fitted direction (u, v) -> (s, t)."""

    def __init__(self, u, v, s, t, order: int):
        # Mean-shift normalization for conditioning (gdal_crs.cpp keeps
        # running sums of the coordinates for the same purpose).
        self.mu, self.mv = float(u.mean()), float(v.mean())
        A = _poly_terms(order, u - self.mu, v - self.mv)
        self.cs, *_ = np.linalg.lstsq(A, s, rcond=None)
        self.ct, *_ = np.linalg.lstsq(A, t, rcond=None)
        self.order = order

    def __call__(self, u, v):
        u = np.asarray(u, np.float64) - self.mu
        v = np.asarray(v, np.float64) - self.mv
        shp = u.shape
        A = _poly_terms(self.order, u.ravel(), v.ravel())
        return (A @ self.cs).reshape(shp), (A @ self.ct).reshape(shp)


class GCPPolynomial:
    """Polynomial GCP transformer; ``order=0`` auto-selects like the
    reference (>= 6 GCPs -> order 2, else 1). Forward maps
    (pixel, line) -> (geo_x, geo_y); inverse is its own fit."""

    def __init__(self, gcps, order: int = 0):
        g = np.asarray(gcps, np.float64)
        if order == 0:
            order = 2 if len(g) >= 6 else 1
        if not 1 <= order <= 3:
            raise ValueError("order must be 1, 2 or 3")
        if len(g) == 2 and order == 1 and g[0, 2] != g[1, 2] \
                and g[0, 3] != g[1, 3]:
            # synthesize the 3rd rectangle corner (gdal_crs.cpp:223-247)
            g = np.vstack([g, [g[1, 0], g[0, 1], g[1, 2], g[0, 3]]])
        need = (order + 1) * (order + 2) // 2
        if len(g) < need:
            raise ValueError(f"order {order} needs >= {need} GCPs, "
                             f"got {len(g)}")
        self.order = order
        self._fwd = _PolyDir(g[:, 0], g[:, 1], g[:, 2], g[:, 3], order)
        self._inv = _PolyDir(g[:, 2], g[:, 3], g[:, 0], g[:, 1], order)

    def forward(self, pixel, line):
        return self._fwd(pixel, line)

    def inverse(self, x, y):
        return self._inv(x, y)


def _tps_phi(d2):
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(d2 > 0.0, d2 * np.log(np.maximum(d2, 1e-300)), 0.0)


class _TpsDir:
    """One thin-plate spline direction: f(p) = a0 + a1 u + a2 v +
    sum w_k phi(|p - p_k|^2), phi(d2) = d2 ln d2, with the standard
    sum-zero constraints."""

    def __init__(self, u, v, s, t):
        n = len(u)
        self.u, self.v = u.copy(), v.copy()
        d2 = (u[:, None] - u[None, :]) ** 2 + (v[:, None] - v[None, :]) ** 2
        K = _tps_phi(d2)
        P = np.column_stack([np.ones(n), u, v])
        A = np.zeros((n + 3, n + 3))
        A[:n, :n] = K
        A[:n, n:] = P
        A[n:, :n] = P.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n, 0] = s
        rhs[:n, 1] = t
        sol = np.linalg.solve(A, rhs)
        self.w = sol[:n]
        self.a = sol[n:]

    def __call__(self, u, v):
        u = np.asarray(u, np.float64)
        v = np.asarray(v, np.float64)
        shp = u.shape
        uf, vf = u.ravel(), v.ravel()
        d2 = (uf[:, None] - self.u[None, :]) ** 2 \
            + (vf[:, None] - self.v[None, :]) ** 2
        B = _tps_phi(d2)
        s = self.a[0, 0] + self.a[1, 0] * uf + self.a[2, 0] * vf \
            + B @ self.w[:, 0]
        t = self.a[0, 1] + self.a[1, 1] * uf + self.a[2, 1] * vf \
            + B @ self.w[:, 1]
        return s.reshape(shp), t.reshape(shp)


class GCPTps:
    """Thin-plate-spline GCP transformer (exact at every GCP); forward
    and inverse are independently fitted splines, as in gdal_tps.cpp."""

    def __init__(self, gcps):
        g = np.asarray(gcps, np.float64)
        if len(g) < 3:
            raise ValueError("TPS needs >= 3 GCPs")
        self._fwd = _TpsDir(g[:, 0], g[:, 1], g[:, 2], g[:, 3])
        self._inv = _TpsDir(g[:, 2], g[:, 3], g[:, 0], g[:, 1])

    def forward(self, pixel, line):
        return self._fwd(pixel, line)

    def inverse(self, x, y):
        return self._inv(x, y)
