"""Color quantization — rgb2pct's two halves: median-cut palette
computation and error-diffusion dithering.

Reference semantics:
  GDALComputeMedianCutPCT  alg/gdalmediancut.cpp — colors quantized to
      nBits (default 5) per channel (:503-505 ``>> nColorShift``);
      boxes split largest-total-first (largest_box :625-635); split
      axis = widest channel range (splitbox :855-865), split point =
      first bin where the cumulative count reaches total/2, bumped by
      one when it equals the box start (:1055-1065); both halves are
      shrunk to their tight bounds; final palette entry per box =
      ((min+max) << shift) / 2 per channel (:1120-1130).
  GDALDitherRGB2PCT  alg/gdaldither.cpp — nearest palette color by L1
      distance, first index wins ties (FindNearestColor :731-757);
      error diffusion is GDAL's 3-tap kernel, NOT classic
      Floyd-Steinberg: with e = value − palette and s = trunc(e/6),
      the same line's next pixel gets 2s, the next line gets s (left),
      e − 5s (center, accumulated) and s (right, assigned)
      (:566-605); diffused values clamp to [0,255] before matching.

The palette fit is per-image driver work (or actor ``__init__`` state
when one palette serves a whole corpus); remap/dither run per image
inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["median_cut_pct", "remap_to_pct", "dither_rgb2pct"]


def median_cut_pct(px: np.ndarray, n_colors: int = 256, n_bits: int = 5):
    """Compute a median-cut palette from an (h, w, 3+) uint8 image.
    Returns (palette (n,3) uint8, counts (n,) int64) — counts are the
    per-box pixel totals, as GDAL's panPixelCountPerColorTableEntry."""
    v = np.asarray(px)
    if v.ndim != 3 or v.shape[2] < 3:
        raise ValueError("median_cut_pct needs an (h, w, >=3) image")
    shift = 8 - n_bits
    lev = 1 << n_bits
    q = (v[:, :, :3].reshape(-1, 3).astype(np.int64) >> shift)
    codes = (q[:, 0] * lev + q[:, 1]) * lev + q[:, 2]
    hist = np.bincount(codes, minlength=lev ** 3)
    nz = np.nonzero(hist)[0]
    cnt = hist[nz].astype(np.int64)
    r = nz // (lev * lev)
    g = (nz // lev) % lev
    b = nz % lev

    # one box holding everything, then split largest-total-first
    boxes = [np.arange(len(nz))]
    totals = [int(cnt.sum())]

    def bounds(idx):
        return (r[idx].min(), r[idx].max(), g[idx].min(), g[idx].max(),
                b[idx].min(), b[idx].max())

    while len(boxes) < n_colors:
        order = int(np.argmax(totals))
        idx = boxes[order]
        if totals[order] <= 0 or len(idx) == 0:
            break
        rmin, rmax, gmin, gmax, bmin, bmax = bounds(idx)
        # widest axis, RED >= GREEN >= BLUE priority (splitbox:855-865)
        dr, dg, db = rmax - rmin, gmax - gmin, bmax - bmin
        if dr >= dg and dr >= db:
            ax, first, last = r, rmin, rmax
        elif dg >= db:
            ax, first, last = g, gmin, gmax
        else:
            ax, first, last = b, bmin, bmax
        if last == first:
            # unsplittable singleton cell: GDAL still "splits" it into
            # itself + an empty box; we stop allocating instead
            totals[order] = -totals[order]   # mark visited, keep count
            if all(t <= 0 for t in totals):
                break
            continue
        axv = ax[idx]
        h2 = np.bincount(axv - first, weights=cnt[idx],
                         minlength=last - first + 1)
        # GDAL's loop stops at the first bin where the cumulative
        # count reaches total/2 (splitbox:1055-1062)
        half = abs(totals[order]) // 2
        cum = np.cumsum(h2)
        i = first + int(np.searchsorted(cum, half, side="left"))
        if i == first:
            i += 1
        lo = idx[axv < i]
        hi = idx[axv >= i]
        boxes[order] = hi
        totals[order] = int(cnt[hi].sum())
        boxes.append(lo)
        totals.append(int(cnt[lo].sum()))

    pal = np.zeros((len(boxes), 3), np.uint8)
    outc = np.zeros(len(boxes), np.int64)
    for k, idx in enumerate(boxes):
        rmin, rmax, gmin, gmax, bmin, bmax = bounds(idx)
        pal[k] = (((rmin + rmax) << shift) // 2,
                  ((gmin + gmax) << shift) // 2,
                  ((bmin + bmax) << shift) // 2)
        outc[k] = abs(totals[k])
    return pal, outc


def _nearest_l1(colors: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """L1-nearest palette index per color, first index wins ties
    (FindNearestColor semantics), fully vectorized."""
    d = np.abs(colors[:, None, :].astype(np.int64)
               - palette[None, :, :3].astype(np.int64)).sum(axis=2)
    return np.argmin(d, axis=1)


def remap_to_pct(px: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Non-dithered remap: every pixel to its L1-nearest palette index.
    Unique-color memoization mirrors the reference's dynamic color map
    (gdaldither.cpp:560-576) — the argmin runs once per distinct
    color, not per pixel."""
    v = np.asarray(px)[:, :, :3].reshape(-1, 3)
    codes = (v[:, 0].astype(np.int64) * 256 + v[:, 1]) * 256 + v[:, 2]
    uniq, inv = np.unique(codes, return_inverse=True)
    uc = np.column_stack([uniq // 65536, (uniq // 256) % 256, uniq % 256])
    lut = _nearest_l1(uc, np.asarray(palette))
    return lut[inv].astype(np.uint8).reshape(px.shape[:2])


def dither_rgb2pct(px: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """GDAL's error-diffusion dither (gdaldither.cpp:440-605): serial
    scanline pass with the 3-tap integer kernel. Returns (h, w) uint8
    palette indices."""
    v = np.asarray(px)[:, :, :3].astype(np.int64)
    pal = np.asarray(palette)[:, :3].astype(np.int64)
    h, w = v.shape[:2]
    out = np.zeros((h, w), np.uint8)
    nline = np.zeros((w + 2, 3), np.int64)   # next-line error buffer
    cache: dict[int, int] = {}
    for y in range(h):
        line = v[y] + nline[1:w + 1]
        np.clip(line, 0, 255, out=line)
        nline[:] = 0
        last = np.zeros(3, np.int64)
        for x in range(w):
            val = np.clip(line[x] + last, 0, 255)
            code = int(val[0]) * 65536 + int(val[1]) * 256 + int(val[2])
            idx = cache.get(code)
            if idx is None:
                idx = int(np.abs(pal - val).sum(axis=1).argmin())
                cache[code] = idx
            out[y, x] = idx
            err = val - pal[idx]
            # C integer division truncates toward zero
            sixth = np.fix(err / 6).astype(np.int64)
            nline[x] += sixth                   # next line, left
            nline[x + 2] = sixth                # next line, right (assign)
            nline[x + 1] += err - 5 * sixth     # next line, center
            last = 2 * sixth                    # same line, next pixel
    return out
