"""Distributed polygonize — connected components across tile boundaries.

Reference: alg/polygonize.cpp runs single-image; SURVEY §2.10 marks the
distributed version's hard part as "groupby(value) boundary-merge of
polygons touching tile edges". This module implements that merge:

  1. per tile (map_batches, vectorized): label components of the tile's
     grid, compute per-component pixel areas, and extract the runs each
     component exposes on the tile's four edges;
  2. shuffle the edge runs by SHARED-EDGE key (the edge between tiles
     (x,y) and (x+1,y) is one key, owned by the left tile): a
     `groupby(edge_key)` brings both sides of every boundary together;
     matching runs (same value, overlapping pixel intervals) become
     merge pairs ((tile,label) ↔ (tile,label));
  3. the pair list is tiny (∝ boundary components, not pixels): a
     driver-side union-find assigns global component ids, broadcast
     back as a lookup to label the per-tile pieces;
  4. final small `groupby(component)`: total area, piece/tile counts.

Geometry stays as per-tile pieces (exact as a region, like
intersection_pieces); the stitched statistics (area, extent, piece
count) are what the cross-tile merge adds. Pixels never cross a
shuffle; edge runs are (value, interval) integers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core.rastervec import label_components


def map_int64(pid: np.ndarray, table: dict) -> np.ndarray:
    """Map int64 ids through ``table`` (missing → identity) WITHOUT a
    float64 round-trip: packed piece ids use bits 40-59 for tile
    coords, so ids exceed 2^53 at tile_x/y >= 2^13 and pandas'
    map().fillna() (which promotes to float64 on any miss) would
    silently round them. Vectorized via searchsorted on the (small,
    boundary-only) mapping table."""
    out = pid.astype(np.int64, copy=True)
    if not table:
        return out
    keys = np.fromiter(table.keys(), np.int64, len(table))
    vals = np.fromiter(table.values(), np.int64, len(table))
    order = np.argsort(keys)
    keys, vals = keys[order], vals[order]
    idx = np.searchsorted(keys, out)
    idx_c = np.minimum(idx, len(keys) - 1)
    hit = keys[idx_c] == out
    out[hit] = vals[idx_c[hit]]
    return out


def tile_pieces_and_edges(tile_id: int, grid: np.ndarray,
                          connectedness: int = 4):
    """One tile's grid → (pieces rows, edge-run rows).

    pieces: (tile_id, label, value, n_px)
    edges:  (side ∈ {N,S,W,E}, label, value, start, end) — run intervals
    in tile-local pixel indices along that edge."""
    labels = label_components(grid, connectedness)
    n = int(labels.max()) + 1
    counts = np.bincount(labels.ravel(), minlength=n)
    # representative value per label = value at its first pixel
    flat_lab = labels.ravel()
    first_idx = np.zeros(n, np.int64)
    uniq, first = np.unique(flat_lab, return_index=True)
    first_idx[uniq] = first
    values = grid.ravel()[first_idx]

    pieces = {"tile_id": np.full(n, tile_id, np.int64),
              "label": np.arange(n, dtype=np.int64),
              "value": values.astype(np.int64),
              "n_px": counts.astype(np.int64)}

    def runs(line_labels: np.ndarray, line_values: np.ndarray):
        """Consecutive equal-label runs along one edge line."""
        m = len(line_labels)
        if m == 0:
            return []
        brk = np.flatnonzero(np.diff(line_labels)) + 1
        starts = np.concatenate([[0], brk])
        ends = np.concatenate([brk, [m]])
        return [(int(line_labels[s]), int(line_values[s]), int(s), int(e))
                for s, e in zip(starts, ends)]

    edges = []
    for side, lab_line, val_line in (
            ("N", labels[0], grid[0]), ("S", labels[-1], grid[-1]),
            ("W", labels[:, 0], grid[:, 0]), ("E", labels[:, -1], grid[:, -1])):
        for lab, val, s, e in runs(lab_line, val_line):
            edges.append((side, lab, val, s, e))
    # corner pixels (NW, NE, SW, SE) for the 8-connect point-adjacency
    corners = ([int(labels[0, 0]), int(labels[0, -1]),
                int(labels[-1, 0]), int(labels[-1, -1])],
               [int(grid[0, 0]), int(grid[0, -1]),
                int(grid[-1, 0]), int(grid[-1, -1])])
    return pieces, edges, corners


class TilePolygonize:
    """map_batches callable: tile rows (tile_x, tile_y, grid bytes +
    shape) → union of piece rows and edge-run rows (side-tagged)."""

    def __init__(self, connectedness: int = 4):
        self.conn = connectedness

    def __call__(self, t: pa.Table) -> pa.Table:
        # outer loop is over TILES (few, fat rows — each is a whole
        # grid); all per-piece / per-edge emission is numpy-vectorized
        pp, ee, cc = [], [], []  # per-tile (tx, ty, pieces) / edges / corners
        for i in range(t.num_rows):
            tx = int(t["tile_x"][i].as_py())
            ty = int(t["tile_y"][i].as_py())
            h = int(t["h"][i].as_py())
            w = int(t["w"][i].as_py())
            grid = np.frombuffer(t["grid"][i].as_py(),
                                 np.int64).reshape(h, w)
            tile_id = (tx << 32) | ty
            pieces, edges, corners = tile_pieces_and_edges(
                tile_id, grid, self.conn)
            pp.append((tx, ty, pieces))
            cc.append((tx, ty) + corners)
            if edges:
                side, lab, val, s, e = zip(*edges)
                ee.append((tx, ty, np.array(side), np.asarray(lab, np.int64),
                           np.asarray(val, np.int64),
                           np.asarray(s, np.int64), np.asarray(e, np.int64)))

        def full(vals, n):
            return np.concatenate([np.full(k, v, np.int64)
                                   for v, k in zip(vals, n)]) \
                if n else np.empty(0, np.int64)

        np_per = [len(p["label"]) for _, _, p in pp]
        p_tx = full([tx for tx, _, _ in pp], np_per)
        p_ty = full([ty for _, ty, _ in pp], np_per)
        p_lab = np.concatenate([p["label"] for _, _, p in pp]) \
            if pp else np.empty(0, np.int64)
        p_val = np.concatenate([p["value"] for _, _, p in pp]) \
            if pp else np.empty(0, np.int64)
        p_npx = np.concatenate([p["n_px"] for _, _, p in pp]) \
            if pp else np.empty(0, np.int64)
        n_p = len(p_lab)

        ne_per = [len(x[3]) for x in ee]
        e_tx = full([x[0] for x in ee], ne_per)
        e_ty = full([x[1] for x in ee], ne_per)
        if ee:
            e_side = np.concatenate([x[2] for x in ee])
            e_lab = np.concatenate([x[3] for x in ee])
            e_val = np.concatenate([x[4] for x in ee])
            e_s = np.concatenate([x[5] for x in ee])
            e_e = np.concatenate([x[6] for x in ee])
        else:
            e_side = np.empty(0, "U1")
            e_lab = e_val = e_s = e_e = np.empty(0, np.int64)
        # shared-edge canonical key, owned by the W/N tile: vertical
        # edge between (tx-1,ty)|(tx,ty), horizontal (tx,ty-1)|(tx,ty)
        M = np.int64((1 << 30) - 1)    # 30-bit tile coords (z ≤ 30)
        kx = np.where(e_side == "W", e_tx - 1, e_tx) & M
        ky = np.where(e_side == "N", e_ty - 1, e_ty) & M
        vert = (e_side == "W") | (e_side == "E")
        e_key = (np.where(vert, np.int64(1) << 60, np.int64(2) << 60)
                 | (kx << 30) | ky)

        if self.conn == 8 and pp:
            # corner records: 8-connect components can also meet
            # diagonally at a point shared by FOUR tiles — an
            # adjacency on no shared edge. Emit each tile's 4 corner
            # pixels keyed by the corner POINT (tile (tx,ty) spans
            # points [tx,tx+1]x[ty,ty+1]); the match rule pairs the
            # two diagonals (SE<->NW, SW<->NE).
            c_tx, c_ty, c_side, c_lab, c_val, c_px, c_py = \
                [], [], [], [], [], [], []
            for (tx, ty, _), (_, _, la, va) in zip(pp, cc):
                for name, lb, vv, dx, dy in (
                        ("NW", la[0], va[0], 0, 0),
                        ("NE", la[1], va[1], 1, 0),
                        ("SW", la[2], va[2], 0, 1),
                        ("SE", la[3], va[3], 1, 1)):
                    c_tx.append(tx)
                    c_ty.append(ty)
                    c_side.append(name)
                    c_lab.append(lb)
                    c_val.append(vv)
                    c_px.append(tx + dx)
                    c_py.append(ty + dy)
            c_key = ((np.int64(3) << 60)
                     | ((np.asarray(c_px, np.int64) & M) << 30)
                     | (np.asarray(c_py, np.int64) & M))
            e_tx = np.concatenate([e_tx, np.asarray(c_tx, np.int64)])
            e_ty = np.concatenate([e_ty, np.asarray(c_ty, np.int64)])
            e_side = np.concatenate([e_side.astype("U2"),
                                     np.asarray(c_side)])
            e_lab = np.concatenate([e_lab,
                                    np.asarray(c_lab, np.int64)])
            e_val = np.concatenate([e_val,
                                    np.asarray(c_val, np.int64)])
            e_s = np.concatenate([e_s, np.zeros(len(c_tx), np.int64)])
            e_e = np.concatenate([e_e, np.zeros(len(c_tx), np.int64)])
            e_key = np.concatenate([e_key, c_key])
        n_e = len(e_lab)

        z = np.zeros
        return pa.table({
            "kind": pa.array(np.concatenate([np.full(n_p, "P"),
                                             np.full(n_e, "B")]), pa.string()),
            "tile_x": pa.array(np.concatenate([p_tx, e_tx]), pa.int64()),
            "tile_y": pa.array(np.concatenate([p_ty, e_ty]), pa.int64()),
            "label": pa.array(np.concatenate([p_lab, e_lab]), pa.int64()),
            "value": pa.array(np.concatenate([p_val, e_val]), pa.int64()),
            "n_px": pa.array(np.concatenate([p_npx, z(n_e, np.int64)]),
                             pa.int64()),
            "side": pa.array(np.concatenate([np.full(n_p, ""), e_side]),
                             pa.string()),
            "start": pa.array(np.concatenate([z(n_p, np.int64), e_s]),
                              pa.int64()),
            "end": pa.array(np.concatenate([z(n_p, np.int64), e_e]),
                            pa.int64()),
            "edge_key": pa.array(np.concatenate([z(n_p, np.int64), e_key]),
                                 pa.int64()),
        })


def _match_edge_group(g: pd.DataFrame, conn: int = 4) -> pd.DataFrame:
    """All runs on one shared edge → merge pairs (same value, interval
    overlap, opposite sides). With ``conn=8`` the overlap test widens
    by one pixel (diagonal adjacency along the edge), and corner-point
    groups pair the two tile diagonals (SE<->NW, SW<->NE)."""
    out = {"a": [], "b": []}
    # the two sides of a vertical edge are E (left tile) and W (right
    # tile); of a horizontal edge S (upper) and N (lower); corner
    # points (conn=8) pair the diagonally-opposite tiles
    sides = [("E", "W"), ("S", "N")]
    if conn == 8:
        sides += [("SE", "NW"), ("SW", "NE")]
    for sa, sb in sides:
        A = g[g["side"] == sa]
        B = g[g["side"] == sb]
        if not len(A) or not len(B):
            continue
        av = A["value"].to_numpy(); bv = B["value"].to_numpy()
        as_ = A["start"].to_numpy(); ae = A["end"].to_numpy()
        bs = B["start"].to_numpy(); be = B["end"].to_numpy()
        # piece id: (tx, ty, label) packed 20 bits each (fits z<=20
        # tile grids and 256^2-pixel tiles in 60 bits)
        aid = ((((A["tile_x"].to_numpy().astype(np.int64) << 20)
                 | A["tile_y"].to_numpy()) << 20) | A["label"].to_numpy())
        bid = ((((B["tile_x"].to_numpy().astype(np.int64) << 20)
                 | B["tile_y"].to_numpy()) << 20) | B["label"].to_numpy())
        if sa in ("SE", "SW"):
            # corner-point groups: single pixels, value match suffices
            ov = av[:, None] == bv[None, :]
        elif conn == 8:
            # |i-j| <= 1 between run members: intervals widened by one
            ov = ((as_[:, None] <= be[None, :])
                  & (bs[None, :] <= ae[:, None])
                  & (av[:, None] == bv[None, :]))
        else:
            ov = ((as_[:, None] < be[None, :])
                  & (bs[None, :] < ae[:, None])
                  & (av[:, None] == bv[None, :]))
        ii, jj = np.nonzero(ov)
        out["a"].extend(aid[ii].tolist())
        out["b"].extend(bid[jj].tolist())
    return pd.DataFrame({"a": pd.Series(out["a"], dtype="int64"),
                         "b": pd.Series(out["b"], dtype="int64")})


def distributed_polygonize(tiles_ds, connectedness: int = 4,
                           as_dataset: bool = False):
    """Tile dataset (tile_x, tile_y, h, w, grid: int64 bytes) →
    per-component stats (component, value, total_px, n_pieces, n_tiles)
    as a pandas frame, or a ray Dataset when ``as_dataset=True``.

    Components are stitched across tile boundaries exactly; verified
    against single-grid polygonize in tests. 8-connectivity
    (GDAL's -8 polygonize option) widens the edge-run overlap test by
    one pixel and adds corner-point records for the diagonal
    adjacency at points shared by four tiles."""
    import ray
    from .join import salted_bucket

    if connectedness not in (4, 8):
        raise ValueError("connectedness must be 4 or 8")

    tp = TilePolygonize(connectedness)
    parts = tiles_ds.map_batches(tp, batch_format="pyarrow").materialize()

    pieces = parts.filter(expr="kind == 'P'")
    bounds = parts.filter(expr="kind == 'B'")

    def edge_groups(g: pd.DataFrame) -> pd.DataFrame:
        frames = [r for _, sub in g.groupby("edge_key", sort=False)
                  for r in (_match_edge_group(sub, connectedness),)
                  if len(r)]
        if not frames:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    pairs = bounds.map_batches(lambda b: salted_bucket(b, "edge_key"),
                               batch_format="pyarrow") \
        .groupby("bucket").map_groups(edge_groups, batch_format="pandas") \
        .to_pandas()

    # driver-side union-find over the (small) boundary pair list
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    if "a" not in pairs.columns:   # Ray drops all-empty block schemas
        pairs = pd.DataFrame({"a": [], "b": []})
    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[rb] = ra

    roots = {k: find(k) for k in list(parent)}
    ref = ray.put(roots)

    # the piece table is ∝ components × tiles — it must NEVER be pulled
    # to the driver. Final aggregation is a Ray shuffle: broadcast root
    # map → per-batch partial combine by (component, value, tile) →
    # salted-bucket groupby(component) final. Only the per-component
    # result (the operator's answer) leaves the cluster.
    def assign_partial(t: pa.Table) -> pa.Table:
        comp_map = ray.get(ref)
        pid = ((((t["tile_x"].to_numpy().astype(np.int64) << 20)
                 | t["tile_y"].to_numpy()) << 20) | t["label"].to_numpy())
        comp = map_int64(pid, comp_map)
        tile = (t["tile_x"].to_numpy().astype(np.int64) << 32) \
            | t["tile_y"].to_numpy().astype(np.int64)
        df = pd.DataFrame({"component": comp,
                           "value": t["value"].to_numpy(),
                           "tile": tile,
                           "n_px": t["n_px"].to_numpy()})
        part = df.groupby(["component", "value", "tile"], sort=False).agg(
            total_px=("n_px", "sum"),
            n_pieces=("n_px", "size")).reset_index()
        return pa.Table.from_pandas(part, preserve_index=False)

    def final_agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["component", "value"], sort=False).agg(
            total_px=("total_px", "sum"), n_pieces=("n_pieces", "sum"),
            n_tiles=("tile", "nunique")).reset_index()

    agg_ds = pieces.map_batches(assign_partial, batch_format="pyarrow") \
        .map_batches(lambda b: salted_bucket(b, "component"),
                     batch_format="pyarrow") \
        .groupby("bucket").map_groups(final_agg, batch_format="pandas")
    if as_dataset:
        return agg_ds
    # per-component stats ARE the result: bounded by component count
    return agg_ds.to_pandas()
