"""Geolocation-array transformer — the reference's GEOLOCATION domain
(``-geoloc`` warps): per-node (geo_x, geo_y) arrays sampled every
PIXEL_STEP×LINE_STEP pixels, interpolated bilinearly for pixel→geo and
inverted through a generated backmap for geo→pixel.

Reference semantics (alg/gdalgeoloc.cpp):
  forward  GDALGeoLocTransform :589-648 — geoloc-grid coords are
      (pixel − PIXEL_OFFSET)/PIXEL_STEP − (0.5 unless the arrays are
      top-left-corner georeferenced), then PixelLineToXY :393-520
      bilinear-interpolates the arrays, clamping indices at the edges
      ("infinite extension beyond borders ... based on closest grid
      square") and failing on nodata nodes.
  inverse  :651-700 — a backmap raster over the geo extent holds, per
      backmap cell, the (pixel, line) that lands there; lookups read
      it bilinearly.  GDAL builds it by splatting geoloc nodes with an
      oversampling factor (GenerateBackMap) and hole-filling; we splat
      the same way, hole-fill by neighbor dilation, then polish every
      query point with Newton steps against the exact forward mapping
      (GDAL's quadtree path reaches the same fixed point through
      per-quad inverse bilinear interpolation).

Arrays are plain numpy; an actor holds a ``GeolocTransformer`` in
``__init__`` and transforms whole batches per call.
"""

from __future__ import annotations

import numpy as np

__all__ = ["GeolocTransformer"]


class GeolocTransformer:
    def __init__(self, geo_x, geo_y, *, pixel_offset: float = 0.0,
                 line_offset: float = 0.0, pixel_step: float = 1.0,
                 line_step: float = 1.0, origin_top_left: bool = True,
                 nodata: float | None = None, oversample: float = 1.3):
        self.gx = np.asarray(geo_x, np.float64)
        self.gy = np.asarray(geo_y, np.float64)
        if self.gx.shape != self.gy.shape or self.gx.ndim != 2:
            raise ValueError("geo_x/geo_y must be equal-shape 2D arrays")
        self.pixel_offset = float(pixel_offset)
        self.line_offset = float(line_offset)
        self.pixel_step = float(pixel_step)
        self.line_step = float(line_step)
        # bOriginIsTopLeftCorner: no half-node shift when the arrays are
        # georeferenced at node corners (gdalgeoloc.cpp:605-607)
        self.conv_off = 0.0 if origin_top_left else 0.5
        self.nodata = nodata
        self._backmap = None
        self._oversample = float(oversample)

    # ------------------------------------------------------------ fwd
    def _grid_coords(self, pixel, line):
        gp = (np.asarray(pixel, np.float64) - self.pixel_offset) \
            / self.pixel_step - self.conv_off
        gl = (np.asarray(line, np.float64) - self.line_offset) \
            / self.line_step - self.conv_off
        return gp, gl

    def pixel_to_geo(self, pixel, line):
        """Raster (pixel, line) → (geo_x, geo_y, ok): bilinear in the
        geoloc arrays with index clamping at the borders."""
        gp, gl = self._grid_coords(pixel, line)
        h, w = self.gx.shape
        # clamp like PixelLineToXY: the cell anchor stays in-range and
        # the fractional part extrapolates linearly beyond the edges
        i = np.clip(np.floor(gp).astype(np.int64), 0, max(w - 2, 0))
        j = np.clip(np.floor(gl).astype(np.int64), 0, max(h - 2, 0))
        fx = gp - i
        fy = gl - j
        i1 = np.minimum(i + 1, w - 1)
        j1 = np.minimum(j + 1, h - 1)

        def bil(a):
            return ((1 - fx) * (1 - fy) * a[j, i] + fx * (1 - fy) * a[j, i1]
                    + (1 - fx) * fy * a[j1, i] + fx * fy * a[j1, i1])

        X, Y = bil(self.gx), bil(self.gy)
        if self.nodata is not None:
            bad = ((self.gx[j, i] == self.nodata)
                   | (self.gx[j, i1] == self.nodata)
                   | (self.gx[j1, i] == self.nodata)
                   | (self.gx[j1, i1] == self.nodata))
            return X, Y, ~bad
        return X, Y, np.ones(np.shape(X), bool)

    # ------------------------------------------------------- backmap
    def _build_backmap(self):
        h, w = self.gx.shape
        valid = np.ones((h, w), bool) if self.nodata is None \
            else (self.gx != self.nodata)
        xs, ys = self.gx[valid], self.gy[valid]
        jj, ii = np.nonzero(valid)
        bw = max(2, int(w * self._oversample))
        bh = max(2, int(h * self._oversample))
        x0, x1 = xs.min(), xs.max()
        y0, y1 = ys.min(), ys.max()
        rx = (x1 - x0) / (bw - 1) or 1.0
        ry = (y1 - y0) / (bh - 1) or 1.0
        # splat node (pixel, line) into its backmap cell (mean of hits)
        ci = np.clip(np.round((xs - x0) / rx).astype(np.int64), 0, bw - 1)
        cj = np.clip(np.round((ys - y0) / ry).astype(np.int64), 0, bh - 1)
        flat = cj * bw + ci
        cnt = np.bincount(flat, minlength=bw * bh).astype(np.float64)
        sp = np.bincount(flat, weights=ii.astype(np.float64),
                         minlength=bw * bh)
        sl = np.bincount(flat, weights=jj.astype(np.float64),
                         minlength=bw * bh)
        with np.errstate(invalid="ignore"):
            bp = (sp / cnt).reshape(bh, bw)
            bl = (sl / cnt).reshape(bh, bw)
        # hole-fill by repeated 4-neighbour averaging of known cells
        known = cnt.reshape(bh, bw) > 0
        for _ in range(bw + bh):
            if known.all():
                break
            kp = np.pad(known, 1)
            vp = np.pad(np.where(known, bp, 0.0), 1)
            wp = np.pad(np.where(known, bl, 0.0), 1)
            nsum = (kp[:-2, 1:-1].astype(np.float64) + kp[2:, 1:-1]
                    + kp[1:-1, :-2] + kp[1:-1, 2:])
            vsum = vp[:-2, 1:-1] + vp[2:, 1:-1] + vp[1:-1, :-2] + vp[1:-1, 2:]
            wsum = wp[:-2, 1:-1] + wp[2:, 1:-1] + wp[1:-1, :-2] + wp[1:-1, 2:]
            fill = ~known & (nsum > 0)
            bp[fill] = vsum[fill] / nsum[fill]
            bl[fill] = wsum[fill] / nsum[fill]
            known |= fill
        self._backmap = (bp, bl, x0, y0, rx, ry, bw, bh)

    # ------------------------------------------------------------ inv
    def geo_to_pixel(self, x, y, max_iterations: int = 10,
                     threshold: float = 1e-9):
        """(geo_x, geo_y) → (pixel, line, ok): backmap seed + Newton
        polish against the exact forward bilinear. threshold is in
        geo units."""
        if self._backmap is None:
            self._build_backmap()
        bp, bl, x0, y0, rx, ry, bw, bh = self._backmap
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        ci = np.clip((x - x0) / rx, 0, bw - 1)
        cj = np.clip((y - y0) / ry, 0, bh - 1)
        i = np.clip(np.floor(ci).astype(np.int64), 0, bw - 2)
        j = np.clip(np.floor(cj).astype(np.int64), 0, bh - 2)
        fx, fy = ci - i, cj - j
        gp = ((1 - fx) * (1 - fy) * bp[j, i] + fx * (1 - fy) * bp[j, i + 1]
              + (1 - fx) * fy * bp[j + 1, i] + fx * fy * bp[j + 1, i + 1])
        gl = ((1 - fx) * (1 - fy) * bl[j, i] + fx * (1 - fy) * bl[j, i + 1]
              + (1 - fx) * fy * bl[j + 1, i] + fx * fy * bl[j + 1, i + 1])
        # geoloc-grid → raster pixel coords
        px = (gp + self.conv_off) * self.pixel_step + self.pixel_offset
        ln = (gl + self.conv_off) * self.line_step + self.line_offset
        ok = np.ones(px.shape, bool)
        eps_p, eps_l = 0.25 * self.pixel_step, 0.25 * self.line_step
        for _ in range(max_iterations):
            X, Y, good = self.pixel_to_geo(px, ln)
            ex, ey = X - x, Y - y
            done = (np.abs(ex) <= threshold) & (np.abs(ey) <= threshold)
            if done.all():
                break
            # local Jacobian by finite differences of the forward map
            Xp, Yp, _ = self.pixel_to_geo(px + eps_p, ln)
            Xl, Yl, _ = self.pixel_to_geo(px, ln + eps_l)
            a = (Xp - X) / eps_p
            b = (Xl - X) / eps_l
            c = (Yp - Y) / eps_p
            d = (Yl - Y) / eps_l
            det = a * d - b * c
            sing = np.abs(det) < 1e-300
            det = np.where(sing, 1.0, det)
            dp = (d * ex - b * ey) / det
            dl = (a * ey - c * ex) / det
            px = np.where(done | sing, px, px - dp)
            ln = np.where(done | sing, ln, ln - dl)
            ok &= ~sing
        X, Y, good = self.pixel_to_geo(px, ln)
        ok &= good & (np.abs(X - x) <= max(threshold, 1e-7)) \
            & (np.abs(Y - y) <= max(threshold, 1e-7))
        return px, ln, ok
