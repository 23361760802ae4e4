"""Distributed contour — iso-lines stitched across tile boundaries.

Reference: alg/contour.cpp runs one raster; SURVEY §2.10 plans the
distributed form as "per-tile marching squares + edge stitching, same
shuffle as polygonize". The stitch key here is an iso-line's CROSSING
POINT on a shared tile edge: a contour leaving tile A through its east
edge at parametric position t enters tile B's west edge at the same t
(marching squares interpolates the crossing from the same two pixel
values on both sides), so quantized (level, edge, position) triples
match exactly.

Tiles must be cut with a ONE-PIXEL OVERLAP column/row (tile covers
[x0-1, x1) of the global grid) so both tiles see the boundary cell;
`split_with_overlap` below produces that layout from a global grid and
the stitcher accounts for it.

Pipeline shape (identical skeleton to poly_merge):
  per-tile map_batches → polyline pieces (length, level) + open-end
  rows keyed by shared edge → groupby(edge) matches endpoint pairs →
  driver union-find → broadcast component map → per-component stats.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core.contour import contour_lines
from .poly_merge import map_int64

_QUANT = 1e-6


def split_with_overlap(grid: np.ndarray, th: int, tw: int):
    """Global grid → tile rows with one shared sample column/row between
    horizontal/vertical neighbors (marching squares needs both boundary
    samples on each side)."""
    H, W = grid.shape
    rows = []
    ny = -(-(H - 1) // (th - 1))       # ceil: remainders get SMALLER
    nx = -(-(W - 1) // (tw - 1))       # tiles (never re-traced strips)
    for ty in range(ny):
        for tx in range(nx):
            y0 = ty * (th - 1)
            x0 = tx * (tw - 1)
            hh = min(th, H - y0)
            ww = min(tw, W - x0)
            if hh < 2 or ww < 2:       # only the shared row/col left
                continue
            sub = grid[y0:y0 + hh, x0:x0 + ww]
            rows.append({"tile_x": tx, "tile_y": ty,
                         "off_x": x0, "off_y": y0,
                         "h": hh, "w": ww,
                         "grid": np.ascontiguousarray(
                             sub, np.float64).tobytes()})
    return rows


class TileContour:
    """map_batches callable: tile rows → piece rows + endpoint rows."""

    def __init__(self, levels):
        self.levels = [float(v) for v in levels]

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"kind": [], "tile_x": [], "tile_y": [], "piece": [],
               "level": [], "length": [], "closed": [],
               "edge_key": [], "pos": []}
        for i in range(t.num_rows):
            tx = int(t["tile_x"][i].as_py())
            ty = int(t["tile_y"][i].as_py())
            ox = int(t["off_x"][i].as_py())
            oy = int(t["off_y"][i].as_py())
            h = int(t["h"][i].as_py())
            w = int(t["w"][i].as_py())
            grid = np.frombuffer(t["grid"][i].as_py(),
                                 np.float64).reshape(h, w)
            # piece ids are PER TILE (contour_lines order is
            # deterministic for a given grid), so a task retry or a
            # different batch composition assigns identical (tile, pid)
            # identities — required for the pairs↔pieces groupby match
            tile_pid = 0
            for level, line in contour_lines(grid, self.levels):
                # gt=None → tile-local PIXEL coords in [0, w-1]/[0, h-1];
                # global = local + tile offset
                gx = line[:, 0] + ox
                gy = line[:, 1] + oy
                seg = np.hypot(np.diff(gx), np.diff(gy)).sum()
                closed = bool(np.allclose(line[0], line[-1]))
                pid = tile_pid
                tile_pid += 1
                out["kind"].append("P")
                out["tile_x"].append(tx)
                out["tile_y"].append(ty)
                out["piece"].append(pid)
                out["level"].append(float(level))
                out["length"].append(float(seg))
                out["closed"].append(closed)
                out["edge_key"].append(0)
                out["pos"].append(0.0)
                if closed:
                    continue
                # open endpoints: which tile edge does each end sit on?
                for ex, ey in ((gx[0], gy[0]), (gx[-1], gy[-1])):
                    ek, pos = self._edge_of(ex, ey, tx, ty, ox, oy, h, w)
                    if ek is None:
                        continue
                    out["kind"].append("B")
                    out["tile_x"].append(tx)
                    out["tile_y"].append(ty)
                    out["piece"].append(pid)
                    out["level"].append(float(level))
                    out["length"].append(0.0)
                    out["closed"].append(False)
                    out["edge_key"].append(ek)
                    out["pos"].append(pos)
        return pa.table({
            "kind": pa.array(out["kind"], pa.string()),
            "tile_x": pa.array(out["tile_x"], pa.int64()),
            "tile_y": pa.array(out["tile_y"], pa.int64()),
            "piece": pa.array(out["piece"], pa.int64()),
            "level": pa.array(out["level"], pa.float64()),
            "length": pa.array(out["length"], pa.float64()),
            "closed": pa.array(out["closed"], pa.bool_()),
            "edge_key": pa.array(out["edge_key"], pa.int64()),
            "pos": pa.array(out["pos"], pa.float64()),
        })

    @staticmethod
    def _edge_of(gx, gy, tx, ty, ox, oy, h, w, tol=1e-9):
        """Global pixel coords → canonical shared-edge key + position
        along it; None for ends on the global border / interior.

        The tile lattice spans global columns [ox, ox+w-1]; the last
        column ox+w-1 is the overlap shared with tile tx+1."""
        M = (1 << 30) - 1
        # east edge (last sample column, shared with tile tx+1)
        if abs(gx - (ox + w - 1)) < tol:
            return (1 << 60) | ((tx & M) << 30) | (ty & M), gy
        # west edge (first column, shared with tile tx-1)
        if abs(gx - ox) < tol and tx > 0:
            return (1 << 60) | (((tx - 1) & M) << 30) | (ty & M), gy
        # south edge (last row)
        if abs(gy - (oy + h - 1)) < tol:
            return (2 << 60) | ((tx & M) << 30) | (ty & M), gx
        # north edge (first row)
        if abs(gy - oy) < tol and ty > 0:
            return (2 << 60) | ((tx & M) << 30) | (((ty - 1) & M)), gx
        return None, 0.0


def _pid(tx, ty, piece):
    return (((int(tx) << 20) | int(ty)) << 20) | int(piece)


def distributed_contour(tiles_ds, levels, as_dataset: bool = False):
    """Tile dataset (from split_with_overlap) → per-contour-component
    stats (level, total_length, n_pieces, closed); a ray Dataset when
    ``as_dataset=True``."""
    import ray
    from .join import salted_bucket

    tc = TileContour(levels)
    parts = tiles_ds.map_batches(tc, batch_format="pyarrow").materialize()
    pieces = parts.filter(expr="kind == 'P'")
    bounds = parts.filter(expr="kind == 'B'")

    def match(g: pd.DataFrame) -> pd.DataFrame:
        out = {"a": [], "b": []}
        for (_, _lv), sub in g.groupby(["edge_key", "level"], sort=False):
            if len(sub) < 2:
                continue
            pos = np.round(sub["pos"].to_numpy() / 1e-6).astype(np.int64)
            ids = [_pid(r.tile_x, r.tile_y, r.piece)
                   for r in sub.itertuples()]
            tiles = list(zip(sub["tile_x"], sub["tile_y"]))
            byq: dict[int, list] = {}
            for k, q in enumerate(pos):
                byq.setdefault(int(q), []).append(k)
            for q, ks in byq.items():
                # endpoints at the same quantized position from
                # DIFFERENT tiles are the same contour crossing
                for x in range(len(ks)):
                    for y in range(x + 1, len(ks)):
                        if tiles[ks[x]] != tiles[ks[y]]:
                            out["a"].append(ids[ks[x]])
                            out["b"].append(ids[ks[y]])
        return pd.DataFrame({"a": pd.Series(out["a"], dtype="int64"),
                             "b": pd.Series(out["b"], dtype="int64")})

    pairs = bounds.map_batches(lambda b: salted_bucket(b, "edge_key"),
                               batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            lambda g: match(g), batch_format="pandas").to_pandas()
    if "a" not in pairs.columns:
        pairs = pd.DataFrame({"a": [], "b": []})

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[rb] = ra
    roots = {k: find(k) for k in list(parent)}
    ref = ray.put(roots)

    # piece table ∝ contours × tiles — never driver-materialized.
    # Broadcast root map → per-batch partial combine by (component,
    # level) → salted groupby(component) final (same shape as
    # poly_merge's final aggregation).
    def assign_partial(t: pa.Table) -> pa.Table:
        cm = ray.get(ref)
        pid = ((((t["tile_x"].to_numpy().astype(np.int64) << 20)
                 | t["tile_y"].to_numpy()) << 20) | t["piece"].to_numpy())
        comp = map_int64(pid, cm)
        df = pd.DataFrame({"component": comp,
                           "level": t["level"].to_numpy(),
                           "length": t["length"].to_numpy(),
                           "closed": t["closed"].to_numpy()})
        part = df.groupby(["component", "level"], sort=False).agg(
            total_length=("length", "sum"), n_pieces=("length", "size"),
            closed=("closed", "all")).reset_index()
        return pa.Table.from_pandas(part, preserve_index=False)

    def final_agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["component", "level"], sort=False).agg(
            total_length=("total_length", "sum"),
            n_pieces=("n_pieces", "sum"),
            closed=("closed", "all")).reset_index()

    agg_ds = pieces.map_batches(assign_partial, batch_format="pyarrow") \
        .map_batches(lambda b: salted_bucket(b, "component"),
                     batch_format="pyarrow") \
        .groupby("bucket").map_groups(final_agg, batch_format="pandas")
    if as_dataset:
        return agg_ds
    return agg_ds.to_pandas()
