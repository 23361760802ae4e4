"""Viewshed (observer visibility over a DEM) — exact re-implementation of
the reference's Wang/line-sweep algorithm.

Reference semantics: alg/viewshed/viewshed_executor.cpp —
  CalcHeightLine      :61-78   (z·n/(n-1) along axis/diagonal rays)
  CalcHeightDiagonal  :85-87   ((Za·i + Zb·j)/(i+j-1))
  CalcHeightEdge      :94-98   ((Za·i + Zb·(j-i))/(j-1))
  adjustHeight        :352-446 (curvature drop, min/max limits)
  setOutputNormal     :233-254 (visible test + running max)
  processFirstLine(L/R):585-630,805-855 / processLine(L/R):858-1030
Output window quirk math: alg/viewshed/viewshed.cpp:340-376.
Golden parity: autotest/cpp/test_viewshed.cpp fixtures replicated in
tests/test_viewshed.py (simple_height, dem_vs_ground, oor_*, min_max).

The sweep is strictly sequential outward from the observer line; within a
line, cells with |dx| < |dy| (the "inner wedge") depend only on the
previous line in edge mode and are vectorized with numpy; cells with
|dx| >= |dy| carry a running dependence on the just-updated neighbor and
run as a scalar scan (Python floats — the lists are tiny vs the numpy
part). Distribution across observers/DEMs happens in Ray (map_batches),
not inside one sweep — matching the reference, whose per-observer sweep
is also sequential per line (2 threads, left|right).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["viewshed", "viewshed_window"]


def _calc_height_line(n: int, za: float) -> float:
    return za * n / (n - 1)


def _calc_height_edge(i: int, j: int, za: float, zb: float) -> float:
    return (za * i + zb * (j - i)) / (j - 1)


def _calc_height_diagonal(i: int, j: int, za: float, zb: float) -> float:
    return (za * i + zb * j) / (i + j - 1)


def _z_edge(dx, dy, this_prev, last, last_prev):
    if dx >= dy:
        return _calc_height_edge(dy, dx, last_prev, this_prev)
    return _calc_height_edge(dx, dy, last_prev, last)


def _z_diagonal(dx, dy, this_prev, last, last_prev):
    return _calc_height_diagonal(dx, dy, this_prev, last)


def _z_min(dx, dy, this_prev, last, last_prev):
    return min(_z_edge(dx, dy, this_prev, last, last_prev),
               _z_diagonal(dx, dy, this_prev, last, last_prev))


def _z_max(dx, dy, this_prev, last, last_prev):
    return max(_z_edge(dx, dy, this_prev, last, last_prev),
               _z_diagonal(dx, dy, this_prev, last, last_prev))


_ZCALC = {"edge": _z_edge, "diagonal": _z_diagonal,
          "min": _z_min, "max": _z_max}


def viewshed_window(w: int, h: int, ox: int, oy: int, max_distance: float,
                    gt=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0)):
    """Output window [(xs, xe), (ys, ye)) — replicates the reference's
    max-distance window math verbatim, including its off-by-one on the
    Y side for a positive y-scale (viewshed.cpp:340-376, the 'ABELL'
    comments flag it in-source; parity requires keeping it)."""
    if max_distance <= 0:
        return 0, w, 0, h
    EPS = 1e-8
    inv_px = 1.0 / abs(gt[1])
    inv_py = 1.0 / abs(gt[5])
    xs = int(math.floor(ox - inv_px * max_distance + EPS))
    xe = int(math.ceil(ox + inv_px * max_distance - EPS) + 1)
    # gt[5] > 0 -> inverse y-scale > 0 -> start gets an extra -1;
    # gt[5] < 0 (north-up) -> stop gets an extra +1.
    ys = int(math.floor(oy - inv_py * max_distance + EPS)) - (1 if gt[5] > 0 else 0)
    ye = int(math.ceil(oy + inv_py * max_distance - EPS)) + (1 if gt[5] < 0 else 0)
    if xs >= w or xe < 0 or ys >= h or ye < 0:
        raise ValueError("max_distance window does not intersect the raster")
    return max(xs, 0), min(xe, w), max(ys, 0), min(ye, h)


def viewshed(dem: np.ndarray, ox: int, oy: int, *,
             observer_height: float = 0.0, target_height: float = 0.0,
             min_distance: float = 0.0, max_distance: float = 0.0,
             curve_coeff: float = 0.85714, semi_major: float | None = None,
             mode: str = "normal", visible_val: float = 255.0,
             invisible_val: float = 0.0, out_of_range_val: float = 0.0,
             cell_mode: str = "edge",
             gt=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0)):
    """Compute the viewshed of ``dem`` (h, w) from observer pixel
    (ox, oy) — may lie outside the raster (then ``observer_height`` is
    its absolute Z; inside, it is an offset above the DEM).

    mode: 'normal' (visible_val / invisible_val / out_of_range_val),
    'dem' (minimum DEM height at which the cell becomes visible),
    'ground' (height to add above ground for visibility).
    Earth-curvature drop ``curve_coeff·d²/(2a)`` applies only when
    ``semi_major`` is given (the reference applies it only with an SRS).

    Returns ``(out, (xs, ys))`` — float64 raster over the max-distance
    window and that window's origin in input pixel coords.
    """
    dem = np.asarray(dem, np.float64)
    if dem.ndim == 3:
        dem = dem[:, :, 0]
    h, w = dem.shape
    if mode not in ("normal", "dem", "ground"):
        raise ValueError(f"unknown viewshed mode {mode!r}")
    zcalc = _ZCALC[cell_mode]
    fast_edge = cell_mode == "edge"

    xs, xe, ys, ye = viewshed_window(w, h, ox, oy, max_distance, gt)
    ow, oh = xe - xs, ye - ys
    nx = ox - xs                       # observer x in window coords
    min2 = min_distance * min_distance
    max2 = max_distance * max_distance if max_distance > 0 else math.inf
    adj = curve_coeff / (2.0 * semi_major) if semi_major else 0.0
    normal = mode == "normal"

    first = min(max(oy, ys), ye - 1)   # clampY
    z_obs = observer_height
    if 0 <= nx < ow:
        z_obs += float(dem[first, xs + nx])

    out = np.empty((oh, ow), np.float64)

    def adjust(gline: int):
        """Read + normalize one line; return (cur, result, ll) where
        ll = (left, left_min, right_min, right) in window coords."""
        yoff = gline - oy
        cur = dem[gline, xs:xe].astype(np.float64)
        if mode == "dem":
            res = cur.copy()
        elif mode == "ground":
            res = np.zeros(ow)
        else:
            res = np.full(ow, np.nan)
        left, right = 0, ow
        left_min = right_min = nx + 1
        nxs = min(max(nx, 0), ow - 1)  # clampX
        dy_x = gt[2] * yoff            # hoisted line terms
        dy_y = gt[5] * yoff
        # squared ground distance per cell (axis terms from the gt)
        offs = np.arange(ow) - nx
        dxw = gt[1] * offs + dy_x
        dyw = gt[4] * offs + dy_y
        r2 = dxw * dxw + dyw * dyw
        # left scan: center..0 — stop adjusting at the first > max²
        lo = 0
        for i in range(nxs, -1, -1):
            if r2[i] < min2:
                left_min -= 1
            elif r2[i] > max2:
                left = i + 1
                lo = i + 1
                break
        # right scan
        hi = ow
        for i in range(nxs + 1, ow):
            if r2[i] < min2:
                right_min += 1
            elif r2[i] > max2:
                right = i
                hi = i
                break
        cur[lo:hi] -= adj * r2[lo:hi] + z_obs
        return cur, res, (left, left_min, right_min, right)

    def set_output(cur, res, i, z):
        """setOutputNormal: visibility or min-height adjustment, then
        propagate the running max into cur."""
        if normal:
            res[i] = invisible_val if cur[i] + target_height < z else visible_val
        else:
            d = z - cur[i]
            if d > 0:
                res[i] += d
        if z > cur[i]:
            cur[i] = z

    def set_output_vec(cur, res, sl, z):
        if normal:
            res[sl] = np.where(cur[sl] + target_height < z,
                               invisible_val, visible_val)
        else:
            res[sl] += np.maximum(z - cur[sl], 0.0)
        np.maximum(cur[sl], z, out=cur[sl])

    def mask_left(res, ll):
        left, left_min = ll[0], ll[1]
        res[:left] = out_of_range_val
        if left_min < nx:
            res[max(left_min, 0):max(nx, 0)] = out_of_range_val

    def mask_right(res, ll):
        right_min, right = ll[2], ll[3]
        if nx + 1 < right_min:
            res[max(nx + 1, 0):right_min] = out_of_range_val
        if right <= ow:
            res[right:] = out_of_range_val

    # ---- first line (observer row, clamped) --------------------------
    cur, res, ll = adjust(first)
    if 0 <= nx < ow:
        if ll[1] != ll[2]:
            res[nx] = out_of_range_val
        elif normal:
            res[nx] = visible_val

    if not (ys <= oy < ye):
        # Observer above/below the raster: everything in range on the
        # first line is visible (processFirstLineTopOrBottom).
        for i in range(ll[0], ll[3]):
            if normal:
                res[i] = visible_val
            else:
                set_output(cur, res, i, cur[i])
        res[:ll[0]] = out_of_range_val
        res[ll[3]:] = out_of_range_val
    else:
        # left of observer
        i_start, i_end = nx - 1, ll[0] - 1
        if i_start > i_end:
            i_start = min(max(i_start, 0), ow - 1)
            if i_start + 1 == nx or i_start + 1 == ow:
                if normal:
                    res[i_start] = visible_val
                else:
                    set_output(cur, res, i_start, cur[i_start])
                i_start -= 1
            c = cur.tolist()
            for i in range(i_start, i_end, -1):
                z = _calc_height_line(abs(i - nx), c[i + 1])
                if normal:
                    res[i] = invisible_val if c[i] + target_height < z else visible_val
                else:
                    d = z - c[i]
                    if d > 0:
                        res[i] += d
                if z > c[i]:
                    c[i] = z
            if i_start > i_end:
                cur[i_end + 1:i_start + 1] = c[i_end + 1:i_start + 1]
        mask_left(res, ll)
        # right of observer
        i_start, i_end = nx + 1, ll[3]
        if i_start < i_end:
            i_start = min(max(i_start, 0), ow - 1)
            if i_start - 1 == nx or i_start == 0:
                if normal:
                    res[i_start] = visible_val
                else:
                    set_output(cur, res, i_start, cur[i_start])
                i_start += 1
            c = cur.tolist()
            for i in range(i_start, i_end):
                z = _calc_height_line(abs(i - nx), c[i - 1])
                if normal:
                    res[i] = invisible_val if c[i] + target_height < z else visible_val
                else:
                    d = z - c[i]
                    if d > 0:
                        res[i] += d
                if z > c[i]:
                    c[i] = z
            wb = max(nx + 1, 0)
            cur[wb:i_end] = c[wb:i_end]
        mask_right(res, ll)

    out[first - ys] = res
    first_cur = cur

    # ---- remaining lines, outward from the first ---------------------
    def process_line(gline: int, prev: np.ndarray):
        yoff = gline - oy
        ady = abs(yoff)
        cur, res, ll = adjust(gline)
        if 0 <= nx < ow:
            if ll[0] >= ll[3] or ll[1] != ll[2]:
                res[nx] = out_of_range_val
            else:
                z = cur[nx] if ady == 1 else _calc_height_line(ady, prev[nx])
                set_output(cur, res, nx, z)
        # LEFT: inner wedge |dx| < |dy| is previous-line-only in edge
        # mode -> vectorized; |dx| >= |dy| runs the scalar scan.
        i_start, i_end = nx - 1, ll[0] - 1
        if i_start > i_end:
            i_start = min(max(i_start, 0), ow - 1)
            if i_start == ow - 1 and nx >= ow:
                if normal:
                    res[i_start] = visible_val
                else:
                    set_output(cur, res, i_start, cur[i_start])
                i_start -= 1
            wedge_lo = nx - ady + 1          # innermost |dx| < |dy| index
            if fast_edge and wedge_lo <= i_start:
                lo = max(wedge_lo, i_end + 1)
                sl = slice(lo, i_start + 1)
                dx = nx - np.arange(lo, i_start + 1)
                z = (prev[lo + 1:i_start + 2] * dx
                     + prev[lo:i_start + 1] * (ady - dx)) / (ady - 1)
                set_output_vec(cur, res, sl, z)
                i_start = lo - 1
            if i_start > i_end:
                c, p = cur.tolist(), prev.tolist()
                for i in range(i_start, i_end, -1):
                    dx = abs(i - nx)
                    if dx == ady:
                        z = c[i] if ady == 1 else _calc_height_line(ady, p[i + 1])
                    else:
                        z = zcalc(dx, ady, c[i + 1], p[i], p[i + 1])
                    if normal:
                        res[i] = invisible_val if c[i] + target_height < z else visible_val
                    else:
                        d = z - c[i]
                        if d > 0:
                            res[i] += d
                    if z > c[i]:
                        c[i] = z
                cur[i_end + 1:i_start + 1] = c[i_end + 1:i_start + 1]
        mask_left(res, ll)
        # RIGHT
        i_start, i_end = nx + 1, ll[3]
        if i_start < i_end:
            i_start = min(max(i_start, 0), ow - 1)
            if i_start == 0 and nx < 0:
                if normal:
                    res[0] = visible_val
                else:
                    set_output(cur, res, 0, cur[0])
                i_start += 1
            wedge_hi = nx + ady - 1          # outermost |dx| < |dy| index
            if fast_edge and wedge_hi >= i_start:
                hi = min(wedge_hi, i_end - 1)
                sl = slice(i_start, hi + 1)
                dx = np.arange(i_start, hi + 1) - nx
                z = (prev[i_start - 1:hi] * dx
                     + prev[i_start:hi + 1] * (ady - dx)) / (ady - 1)
                set_output_vec(cur, res, sl, z)
                i_start = hi + 1
            if i_start < i_end:
                c, p = cur.tolist(), prev.tolist()
                for i in range(i_start, i_end):
                    dx = abs(i - nx)
                    if dx == ady:
                        z = c[i] if ady == 1 else _calc_height_line(ady, p[i - 1])
                    else:
                        z = zcalc(dx, ady, c[i - 1], p[i], p[i - 1])
                    if normal:
                        res[i] = invisible_val if c[i] + target_height < z else visible_val
                    else:
                        d = z - c[i]
                        if d > 0:
                            res[i] += d
                    if z > c[i]:
                        c[i] = z
                cur[i_start:i_end] = c[i_start:i_end]
        mask_right(res, ll)
        out[gline - ys] = res
        return cur

    prev = first_cur
    for gl in range(first - 1, ys - 1, -1):
        prev = process_line(gl, prev)
    prev = first_cur
    for gl in range(first + 1, ye):
        prev = process_line(gl, prev)

    return out, (xs, ys)
