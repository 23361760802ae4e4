"""RPC (rational polynomial coefficient) transformer — the satellite
sensor model the reference exposes as ``METHOD=RPC``.

Reference semantics (alg/gdal_rpc.cpp):
  RPCComputeTerms   :300-330  — the RPC00B 20-term cubic basis in
      normalized (long, lat, height), term order 1, L, P, H, LP, LH,
      PH, LL, PP, HH, PLH, LLL, LPP, LHH, LLP, PPP, PHH, LLH, PPH, HHH
  RPCTransformPoint :420-466  — geo→image is the direct ratio
      num/den per axis, then de-normalized with SAMP/LINE scale+off
      and shifted +0.5 (RPC uses center-of-pixel = 0,0; GDAL uses
      top-left corner = 0,0)
  RPCInverseTransformPoint :1128+ — image→geo has no closed form;
      GDAL starts from a linear approximation fitted at the reference
      point and iterates until the back-projected pixel error is
      below a threshold (default 0.1 px · 1e-2, up to 10/20/40
      iterations).  We run the same fixed-point scheme vectorized
      over numpy arrays with a per-iteration linearization (secant
      update from the last two residuals, exactly the
      bLastPixelDeltaValid refinement at :1240-1260).

A fixed ``height`` per call stands in for the optional DEM lookup
(GDALRPCGetHeightAtLongLat); the DEM path is out of scope here.

Coefficients are plain numpy arrays — an actor holds an ``RPCModel``
in ``__init__`` and transforms whole batches per call.
"""

from __future__ import annotations

import numpy as np

__all__ = ["RPCModel", "rpc_terms"]


def rpc_terms(L, P, H):
    """The 20 RPC00B basis terms, vectorized: shape (..., 20).
    L = normalized longitude, P = normalized latitude, H = height."""
    one = np.ones_like(L)
    return np.stack([
        one, L, P, H,
        L * P, L * H, P * H, L * L, P * P, H * H,
        L * P * H, L * L * L, L * P * P, L * H * H, L * L * P,
        P * P * P, P * H * H, L * L * H, P * P * H, H * H * H,
    ], axis=-1)


class RPCModel:
    """One sensor's RPC set. All eight OFF/SCALE constants plus four
    20-vectors (line/samp × num/den), as in GDALRPCInfoV2."""

    def __init__(self, *, line_off, samp_off, lat_off, long_off,
                 height_off, line_scale, samp_scale, lat_scale,
                 long_scale, height_scale,
                 line_num, line_den, samp_num, samp_den):
        self.line_off = float(line_off)
        self.samp_off = float(samp_off)
        self.lat_off = float(lat_off)
        self.long_off = float(long_off)
        self.height_off = float(height_off)
        self.line_scale = float(line_scale)
        self.samp_scale = float(samp_scale)
        self.lat_scale = float(lat_scale)
        self.long_scale = float(long_scale)
        self.height_scale = float(height_scale)
        self.line_num = np.asarray(line_num, np.float64)
        self.line_den = np.asarray(line_den, np.float64)
        self.samp_num = np.asarray(samp_num, np.float64)
        self.samp_den = np.asarray(samp_den, np.float64)
        for c in (self.line_num, self.line_den,
                  self.samp_num, self.samp_den):
            if c.shape != (20,):
                raise ValueError("RPC coefficient vectors must have "
                                 "exactly 20 terms")

    # ---------------------------------------------------------- direct
    def geo_to_pixel(self, lon, lat, height=0.0):
        """(lon, lat, h) → (pixel, line); RPCTransformPoint semantics
        including the +0.5 center→corner shift."""
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        H = (np.asarray(height, np.float64) - self.height_off) \
            / self.height_scale
        L = (lon - self.long_off) / self.long_scale
        P = (lat - self.lat_off) / self.lat_scale
        if H.shape != L.shape:
            H = np.broadcast_to(H, L.shape)
        T = rpc_terms(L, P, H)
        x = (T @ self.samp_num) / (T @ self.samp_den)
        y = (T @ self.line_num) / (T @ self.line_den)
        pixel = x * self.samp_scale + self.samp_off + 0.5
        line = y * self.line_scale + self.line_off + 0.5
        return pixel, line

    # ----------------------------------------------------------- seed
    def _linear_seed(self):
        """The pixel→geo linear approximation GDAL fits once at setup
        (adfPLToLatLongGeoTransform, gdal_rpc.cpp:GDALCreateRPCTransformerV2):
        finite differences of the direct transform around the offsets."""
        lon0, lat0 = self.long_off, self.lat_off
        eps_l = self.long_scale * 1e-3
        eps_p = self.lat_scale * 1e-3
        px0, ln0 = self.geo_to_pixel(lon0, lat0, self.height_off)
        px_l, ln_l = self.geo_to_pixel(lon0 + eps_l, lat0, self.height_off)
        px_p, ln_p = self.geo_to_pixel(lon0, lat0 + eps_p, self.height_off)
        # Jacobian d(pixel,line)/d(lon,lat), then invert.
        J = np.array([[(px_l - px0) / eps_l, (px_p - px0) / eps_p],
                      [(ln_l - ln0) / eps_l, (ln_p - ln0) / eps_p]])
        Jinv = np.linalg.inv(J)
        return float(px0), float(ln0), Jinv

    # --------------------------------------------------------- inverse
    def pixel_to_geo(self, pixel, line, height=0.0,
                     max_iterations: int = 10, threshold: float = 1e-3):
        """(pixel, line) → (lon, lat): the iterative inverse.  Returns
        (lon, lat, converged_mask).  threshold is in pixels (GDAL's
        default is 0.1 × 1e-2 of a pixel for the non-DEM path)."""
        pixel = np.asarray(pixel, np.float64)
        line = np.asarray(line, np.float64)
        px0, ln0, Jinv = self._linear_seed()
        dlon = Jinv[0, 0] * (pixel - px0) + Jinv[0, 1] * (line - ln0)
        dlat = Jinv[1, 0] * (pixel - px0) + Jinv[1, 1] * (line - ln0)
        lon = self.long_off + dlon
        lat = self.lat_off + dlat
        done = np.zeros(pixel.shape, bool)
        for _ in range(max_iterations):
            bpx, bln = self.geo_to_pixel(lon, lat, height)
            ex, ey = bpx - pixel, bln - line
            done = (np.abs(ex) <= threshold) & (np.abs(ey) <= threshold)
            if done.all():
                break
            # One linearized correction step through the same constant
            # Jacobian — GDAL's update uses the last residual pair the
            # same way (dfResultX -= delta through the seed transform).
            lon = np.where(done, lon, lon - (Jinv[0, 0] * ex
                                             + Jinv[0, 1] * ey))
            lat = np.where(done, lat, lat - (Jinv[1, 0] * ex
                                             + Jinv[1, 1] * ey))
        return lon, lat, done


def synthetic_rpc(k: int) -> RPCModel:
    """A deterministic, well-conditioned RPC set parameterized by an
    integer — used by tests and the battery oracle.  Denominators are
    1 (plus a tiny quadratic term) and numerators carry linear +
    cross + quadratic structure, so the direct transform is exactly
    expressible in SQL."""
    k = int(k)
    a = 0.02 * (k % 5)          # cross-term strength
    b = 0.01 * (k % 3)          # quadratic strength
    num_s = np.zeros(20)
    num_s[1] = 1.0              # L
    num_s[4] = a                # L·P
    num_s[7] = b                # L²
    num_l = np.zeros(20)
    num_l[2] = 1.0              # P
    num_l[4] = -a               # L·P
    num_l[8] = b                # P²
    den = np.zeros(20)
    den[0] = 1.0
    den[9] = 0.001 * (k % 2)    # H² — inert at h=0, exercised in tests
    return RPCModel(
        line_off=2048.0 + 16.0 * k, samp_off=2048.0 - 8.0 * k,
        lat_off=44.0, long_off=5.0, height_off=0.0,
        line_scale=2048.0, samp_scale=2048.0,
        lat_scale=0.5, long_scale=0.5, height_scale=500.0,
        line_num=num_l, line_den=den, samp_num=num_s, samp_den=den)
