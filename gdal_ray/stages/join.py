"""Spatial joins: cell-partitioned image×polygon join, point-in-polygon
join, kNN join — the flagship shuffles.

Semantics mirror OGR's spatial-filter evaluation
(reference: ogr/ogrsf_frmts/generic/ogrlayer.cpp:4005-4072): envelope
reject → rectangle-contains fast accept → exact Intersects; and the
layer-algebra candidate-pair pattern (ogrlayer.cpp:5386+).

Partitioning: both sides flat-map to covering quadkey cells at a join
zoom, then one groupby(cell) co-partitions candidates. Pairs whose
geometries span several cells are deduplicated with the PBSM
*reference-point* rule — a pair is emitted only from the cell that
contains the top-left corner of the envelope intersection — so no
second dedup shuffle is needed.

Scale note: join zoom picks the partition granularity; higher zoom →
more, smaller cells (better balance, more duplication of large
polygons). Hot cells can additionally be handled by broadcasting the
small side (ray.put) when |polygons| is small — see
broadcast_spatial_filter below, the semi-join fast path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core import geom, mercator as merc, wkb as wkb_mod


N_JOIN_BUCKETS = 128


def salted_bucket(batch: pa.Table, key: str,
                  n_buckets: int = N_JOIN_BUCKETS) -> pa.Table:
    """Append a Fibonacci-hashed shuffle bucket for `key` — the shared
    salt-bucket recipe (all rows of a key share its bucket; hot/adjacent
    keys spread): used by every join/render shuffle."""
    k = batch[key].to_numpy().astype(np.uint64)
    b = ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) \
        % np.uint64(n_buckets)
    return batch.append_column("bucket", pa.array(b.astype(np.int64),
                                                  pa.int64()))


def _cover_cells_batch(batch: pa.Table, zoom: int, keep: list[str],
                       max_cells: int = 65536) -> pa.Table:
    """Envelope columns → one output row per covering cell (flat-map)."""
    minx = batch["minx"].to_numpy(); miny = batch["miny"].to_numpy()
    maxx = batch["maxx"].to_numpy(); maxy = batch["maxy"].to_numpy()
    cells_out, idx_out = [], []
    for i in range(batch.num_rows):
        cells = merc.cells_for_envelope(minx[i], miny[i], maxx[i], maxy[i],
                                        zoom, max_cells=max_cells)
        cells_out.append(cells)
        idx_out.append(np.full(len(cells), i, dtype=np.int64))
    if cells_out:
        cells_all = np.concatenate(cells_out)
        idx_all = np.concatenate(idx_out)
    else:
        cells_all = np.empty(0, dtype=np.uint64)
        idx_all = np.empty(0, dtype=np.int64)
    taken = batch.select(keep).take(pa.array(idx_all))
    return taken.append_column("cell", pa.array(cells_all, pa.uint64()))


def with_cells(ds, zoom: int, keep: list[str]):
    """Dataset with envelope cols → flat-mapped (cell, keep...) rows."""
    return ds.map_batches(lambda b: _cover_cells_batch(b, zoom, keep),
                          batch_format="pyarrow")


def reference_cell(minx_a, miny_a, minx_b, miny_b, zoom: int):
    """Cell of the envelope-intersection bottom-left reference point
    (PBSM dedup rule). Vectorized.

    The same +eps nudge as cells_for_envelope: a reference point landing
    exactly on a tile boundary must resolve to the same cell that the
    envelope cover listed, or the pair is silently dropped.

    Known boundary-semantics limit: two envelopes that TOUCH exactly on
    a tile boundary (zero-width intersection aligned with the grid)
    have no common cell in the two covers and the pair is not emitted;
    OGC Intersects is true for touching geometries, but the
    intersection has measure zero and every area-based consumer
    (zonal, layer_intersection with min_area) is unaffected."""
    eps = merc.resolution(zoom) * 1e-6
    rx = np.maximum(minx_a, minx_b) + eps
    ry = np.maximum(miny_a, miny_b) + eps
    tx, ty = merc.meters_to_tile(rx, ry, zoom)
    n = 2**zoom
    tx = np.clip(tx, 0, n - 1)
    ty = np.clip(ty, 0, n - 1)
    return merc.cell_id(zoom, tx, merc.tms_to_xyz(ty, zoom))


class SpatialJoinCell:
    """map_groups callable over one cell: images (side I, axis-aligned
    footprint boxes) × polygons (side P, WKB) → matched pairs."""

    def __init__(self, zoom: int, predicate: str = "intersects"):
        self.zoom = zoom
        self.predicate = predicate
        self._geom_cache: dict[int, object] = {}

    def _poly(self, fid: int, wkb_bytes: bytes):
        g = self._geom_cache.get(fid)
        if g is None:
            g = wkb_mod.loads(wkb_bytes)
            if len(self._geom_cache) > 4096:
                self._geom_cache.clear()
            self._geom_cache[fid] = g
        return g

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        cell = np.uint64(group["cell"].iloc[0])
        imgs = group[group["side"] == "I"]
        polys = group[group["side"] == "P"]
        out = {"image_id": [], "fid": [], "name": [], "category": []}
        if len(imgs) == 0 or len(polys) == 0:
            return _typed_pairs_frame(out)
        ia = imgs[["minx", "miny", "maxx", "maxy"]].to_numpy()
        pa_ = polys[["minx", "miny", "maxx", "maxy"]].to_numpy()
        # vectorized envelope prefilter: (n_img, n_poly) mask
        overlap = ((ia[:, None, 0] <= pa_[None, :, 2]) & (pa_[None, :, 0] <= ia[:, None, 2])
                   & (ia[:, None, 1] <= pa_[None, :, 3]) & (pa_[None, :, 1] <= ia[:, None, 3]))
        # PBSM reference-point dedup
        ii, jj = np.nonzero(overlap)
        if len(ii) == 0:
            return _typed_pairs_frame(out)
        ref = reference_cell(ia[ii, 0], ia[ii, 1], pa_[jj, 0], pa_[jj, 1], self.zoom)
        own = ref == cell
        oi, oj = ii[own], jj[own]
        if not len(oi):
            return _typed_pairs_frame(out)
        img_ids = imgs["image_id"].to_numpy()
        p_fids = polys["fid"].to_numpy()
        p_names = polys["name"].to_numpy()
        p_cats = polys["category"].to_numpy()
        p_wkbs = polys["wkb"].to_numpy()
        # vectorize the exact predicate per polygon over all of its
        # candidate image boxes (image footprints are axis-aligned)
        order = np.argsort(oj, kind="stable")
        oi, oj = oi[order], oj[order]
        for j0 in np.split(np.arange(len(oj)),
                           np.flatnonzero(np.diff(oj)) + 1):
            j = int(oj[j0[0]])
            cand = oi[j0]
            poly = self._poly(int(p_fids[j]), p_wkbs[j])
            if self.predicate == "intersects":
                if _is_rect(poly):
                    # a rectangle IS its envelope: the envelope overlap
                    # prefilter already decided (ogrlayer.cpp:4039-4042)
                    hits = np.ones(len(cand), bool)
                else:
                    hits = geom.boxes_intersect_polygon(
                        ia[cand, 0], ia[cand, 1], ia[cand, 2], ia[cand, 3],
                        poly)
            elif self.predicate == "contains":  # polygon contains image
                hits = np.array([
                    geom.contains(poly, wkb_mod.box(*ia[c])) for c in cand])
            else:
                raise ValueError(self.predicate)
            for c in cand[hits]:
                out["image_id"].append(img_ids[c])
                out["fid"].append(np.int64(p_fids[j]))
                out["name"].append(p_names[j])
                out["category"].append(p_cats[j])
        return _typed_pairs_frame(out)


def _typed_pairs_frame(out: dict) -> pd.DataFrame:
    return pd.DataFrame({
        "image_id": pd.Series(out["image_id"], dtype=object),
        "fid": pd.Series(out["fid"], dtype="int64"),
        "name": pd.Series(out["name"], dtype=object),
        "category": pd.Series(out["category"], dtype=object),
    })


def _typed_pip_frame(out: dict) -> pd.DataFrame:
    return pd.DataFrame({
        "pt_fid": pd.Series(out["pt_fid"], dtype="int64"),
        "fid": pd.Series(out["fid"], dtype="int64"),
        "name": pd.Series(out["name"], dtype=object),
        "category": pd.Series(out["category"], dtype=object),
    })


def _is_rect(g) -> bool:
    if g.geom_type != wkb_mod.POLYGON or len(g.rings) != 1:
        return False
    r = g.rings[0]
    if len(r) != 5:
        return False
    xs, ys = set(r[:, 0].tolist()), set(r[:, 1].tolist())
    return len(xs) == 2 and len(ys) == 2


def spatial_join(images_geo, polygons, zoom: int = 7,
                 predicate: str = "intersects"):
    """images (georef'd) × polygons → (image_id, fid, name, category).

    Inner spatial join on footprint-intersects-polygon. Both inputs are
    Datasets; images_geo must already carry envelope columns (georef
    stage), polygons the T2 schema."""
    import pyarrow as pa

    imgs = with_cells(images_geo, zoom, ["image_id", "minx", "miny", "maxx", "maxy"])
    imgs = imgs.map_batches(
        lambda b: (b.append_column("side", pa.array(["I"] * b.num_rows))
                   .append_column("fid", pa.nulls(b.num_rows, pa.int64()))
                   .append_column("wkb", pa.nulls(b.num_rows, pa.binary()))
                   .append_column("name", pa.nulls(b.num_rows, pa.string()))
                   .append_column("category", pa.nulls(b.num_rows, pa.string()))),
        batch_format="pyarrow")
    pols = with_cells(polygons, zoom,
                      ["fid", "wkb", "minx", "miny", "maxx", "maxy", "name", "category"])
    pols = pols.map_batches(
        lambda b: (b.append_column("side", pa.array(["P"] * b.num_rows))
                   .append_column("image_id", pa.nulls(b.num_rows, pa.string()))),
        batch_format="pyarrow")
    cols = ["cell", "side", "image_id", "fid", "wkb",
            "minx", "miny", "maxx", "maxy", "name", "category"]
    both = imgs.select_columns(cols).union(pols.select_columns(cols))
    joiner = SpatialJoinCell(zoom, predicate)

    def bucketize(b: pa.Table) -> pa.Table:
        return salted_bucket(b, "cell")

    def join_cell_group(g):
        if g["cell"].nunique() > 1:
            frames = [joiner(sub) for _, sub in g.groupby("cell", sort=False)]
            frames = [f for f in frames if len(f)]
            if not frames:
                return _typed_pairs_frame(
                    {"image_id": [], "fid": [], "name": [], "category": []})
            return pd.concat(frames, ignore_index=True)
        return joiner(g)

    return both.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(join_cell_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# point-in-polygon join
# ---------------------------------------------------------------------------

class PiPJoinCell:
    """Per-cell point-in-polygon: points are in exactly one cell, so no
    pair dedup is needed (polygons are the duplicated side)."""

    def __init__(self, emit: str = "inner"):
        self.emit = emit  # inner | semi | anti

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        pts = group[group["side"] == "I"]
        polys = group[group["side"] == "P"]
        out = {"pt_fid": [], "fid": [], "name": [], "category": []}
        if len(pts) == 0:
            return _typed_pip_frame(out)
        px = pts["minx"].to_numpy()  # for points minx==maxx==x
        py = pts["miny"].to_numpy()
        pt_ids = pts["image_id"].to_numpy()
        matched = np.zeros(len(pts), dtype=bool)
        for _, prow in polys.iterrows():
            env_ok = ((px >= prow["minx"]) & (px <= prow["maxx"])
                      & (py >= prow["miny"]) & (py <= prow["maxy"]))
            if not env_ok.any():
                continue
            g = wkb_mod.loads(prow["wkb"])
            inside = np.zeros(len(pts), dtype=bool)
            inside[env_ok] = geom.points_in_polygon(px[env_ok], py[env_ok], g)
            matched |= inside
            if self.emit == "inner":
                # vectorized emit: slice the hit rows at once instead of
                # iloc-per-row (the round-1 per-row loop)
                hit = np.nonzero(inside)[0]
                if len(hit):
                    out["pt_fid"].extend(
                        pt_ids[hit].astype(np.int64).tolist())
                    out["fid"].extend([np.int64(prow["fid"])] * len(hit))
                    out["name"].extend([prow["name"]] * len(hit))
                    out["category"].extend([prow["category"]] * len(hit))
        if self.emit in ("semi", "anti"):
            sel = np.nonzero(matched if self.emit == "semi" else ~matched)[0]
            if len(sel):
                out["pt_fid"].extend(pt_ids[sel].astype(np.int64).tolist())
                out["fid"].extend([np.int64(-1)] * len(sel))
                out["name"].extend([None] * len(sel))
                out["category"].extend([None] * len(sel))
        return _typed_pip_frame(out)


def pip_join(points, polygons, zoom: int = 7, emit: str = "inner"):
    """points (T3 schema) × polygons (T2) → point-in-polygon pairs.

    emit='inner' returns one row per (point, containing polygon);
    'semi'/'anti' return points with/without any container."""
    def pts_prep(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(); y = b["y"].to_numpy()
        tx, ty = merc.meters_to_tile(x, y, zoom)
        n = 2**zoom
        tx = np.clip(tx, 0, n - 1); ty = np.clip(ty, 0, n - 1)
        cells = merc.cell_id(zoom, tx, merc.tms_to_xyz(ty, zoom))
        return pa.table({
            "cell": pa.array(cells, pa.uint64()),
            "side": pa.array(["I"] * b.num_rows),
            "image_id": b["fid"],  # point fid rides in the image_id slot
            "fid": pa.nulls(b.num_rows, pa.int64()),
            "wkb": pa.nulls(b.num_rows, pa.binary()),
            "minx": pa.array(x), "miny": pa.array(y),
            "maxx": pa.array(x), "maxy": pa.array(y),
            "name": pa.nulls(b.num_rows, pa.string()),
            "category": pa.nulls(b.num_rows, pa.string()),
        })

    pts = points.map_batches(pts_prep, batch_format="pyarrow")
    pols = with_cells(polygons, zoom,
                      ["fid", "wkb", "minx", "miny", "maxx", "maxy", "name", "category"])
    pols = pols.map_batches(
        lambda b: (b.append_column("side", pa.array(["P"] * b.num_rows))
                   .append_column("image_id", pa.nulls(b.num_rows, pa.int64()))),
        batch_format="pyarrow")
    cols = ["cell", "side", "image_id", "fid", "wkb",
            "minx", "miny", "maxx", "maxy", "name", "category"]
    both = pts.select_columns(cols).union(pols.select_columns(cols))
    j = PiPJoinCell(emit)

    def bucketize(b: pa.Table) -> pa.Table:
        return salted_bucket(b, "cell")

    def pip_cell_group(g):
        if g["cell"].nunique() > 1:
            frames = [j(sub) for _, sub in g.groupby("cell", sort=False)]
            frames = [f for f in frames if len(f)]
            if not frames:
                return _typed_pip_frame(
                    {"pt_fid": [], "fid": [], "name": [], "category": []})
            return pd.concat(frames, ignore_index=True)
        return j(g)

    both = both.map_batches(bucketize, batch_format="pyarrow")

    return both.groupby("bucket").map_groups(pip_cell_group,
                                             batch_format="pandas")


# ---------------------------------------------------------------------------
# broadcast semi-join (small filter side)
# ---------------------------------------------------------------------------

def broadcast_spatial_filter(ds, filter_wkb: bytes, *, x_col="x", y_col="y"):
    """OGR SetSpatialFilter semantics as a broadcast semi-join: the
    filter geometry ships once (captured in the task closure / object
    store), each batch tests its points vectorized — no shuffle at all.
    (ogrlayer.cpp:4005-4072 path for one filter geometry.)"""
    g = wkb_mod.loads(filter_wkb)
    env = g.envelope()

    def f(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(); y = b[y_col].to_numpy()
        m = (x >= env[0]) & (x <= env[2]) & (y >= env[1]) & (y <= env[3])
        if m.any():
            m[m] = geom.points_in_polygon(x[m], y[m], g)
        return b.filter(pa.array(m))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# kNN join
# ---------------------------------------------------------------------------

class KnnCell:
    """Per-cell brute-force kNN candidates: queries were flat-mapped to
    their cell + ring-1 halo, so every data point within one cell radius
    is a candidate. Emits (qid, fid, dist) candidates; a global
    groupby(qid) top-k merge finishes the join.

    Partitioning assumption (documented per SURVEY §2.4): the true kth
    neighbor lies within the 3×3 cell halo — choose the join zoom so a
    cell is ≥ the expected kth-neighbor radius."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        qs = group[group["side"] == "Q"]
        ps = group[group["side"] == "P"]
        if len(qs) == 0 or len(ps) == 0:
            return pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                                 "fid": pd.Series([], dtype="int64"),
                                 "dist": pd.Series([], dtype="float64")})
        qx = qs["x"].to_numpy()[:, None]; qy = qs["y"].to_numpy()[:, None]
        px = ps["x"].to_numpy()[None, :]; py = ps["y"].to_numpy()[None, :]
        d2 = (qx - px) ** 2 + (qy - py) ** 2
        k = min(self.k, d2.shape[1])
        nn = np.argpartition(d2, k - 1, axis=1)[:, :k]
        qids = qs["qid"].to_numpy()
        fids = ps["fid"].to_numpy()
        # vectorized emit: gather the (query, neighbor) matrix at once
        qrep = np.repeat(qids, k).astype(np.int64)
        frep = fids[nn.ravel()].astype(np.int64)
        drep = np.sqrt(np.take_along_axis(d2, nn, axis=1)).ravel()
        return pd.DataFrame({"qid": qrep, "fid": frep,
                             "dist": drep.astype(np.float64)})


def knn_join(points, queries, k: int = 3, zoom: int = 6):
    """For each query point: k nearest data points (euclidean in 3857).

    points/queries: Datasets with fid/x/y columns. Returns
    (qid, fid, dist) rows, k per query. Candidates are generated
    per-cell with a ring-1 halo and merged with a groupby(qid) top-k."""
    def cell_of(x, y):
        tx, ty = merc.meters_to_tile(x, y, zoom)
        n = 2**zoom
        tx = np.clip(tx, 0, n - 1); ty = np.clip(ty, 0, n - 1)
        return merc.cell_id(zoom, tx, merc.tms_to_xyz(ty, zoom))

    def pts_prep(b: pa.Table) -> pa.Table:
        cells = cell_of(b["x"].to_numpy(), b["y"].to_numpy())
        return pa.table({
            "cell": pa.array(cells, pa.uint64()),
            "side": pa.array(["P"] * b.num_rows),
            "qid": pa.nulls(b.num_rows, pa.int64()),
            "fid": b["fid"], "x": b["x"], "y": b["y"],
        })

    def q_prep(b: pa.Table) -> pa.Table:
        # flat-map each query into its 3×3 cell neighborhood —
        # fully vectorized: repeat each query 9×, tile the offsets,
        # mask the out-of-grid neighbors
        x = b["x"].to_numpy(); y = b["y"].to_numpy()
        fid = b["fid"].to_numpy()
        nq = len(x)
        n = 2**zoom
        tx, ty = merc.meters_to_tile(x, y, zoom)
        tx = np.clip(tx, 0, n - 1).astype(np.int64)
        ty = np.clip(ty, 0, n - 1).astype(np.int64)
        dx = np.tile(np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1]), nq)
        dy = np.tile(np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1]), nq)
        cx = np.repeat(tx, 9) + dx
        cy = np.repeat(ty, 9) + dy
        ok = (cx >= 0) & (cx < n) & (cy >= 0) & (cy < n)
        cx, cy = cx[ok], cy[ok]
        cells = merc.cell_id(zoom, cx.astype(np.uint64),
                             merc.tms_to_xyz(cy, zoom).astype(np.uint64))
        m = int(ok.sum())
        return pa.table({
            "cell": pa.array(cells, pa.uint64()),
            "side": pa.array(np.full(m, "Q"), pa.string()),
            "qid": pa.array(np.repeat(fid, 9)[ok].astype(np.int64), pa.int64()),
            "fid": pa.nulls(m, pa.int64()),
            "x": pa.array(np.repeat(x, 9)[ok], pa.float64()),
            "y": pa.array(np.repeat(y, 9)[ok], pa.float64()),
        })

    pts = points.map_batches(pts_prep, batch_format="pyarrow")
    qs = queries.map_batches(q_prep, batch_format="pyarrow")
    cols = ["cell", "side", "qid", "fid", "x", "y"]
    both = pts.select_columns(cols).union(qs.select_columns(cols))
    knn = KnnCell(k)

    def bucketize(b: pa.Table, key: str) -> pa.Table:
        return salted_bucket(b, key)

    def knn_cell_group(g):
        if g["cell"].nunique() > 1:
            frames = [knn(sub) for _, sub in g.groupby("cell", sort=False)]
            frames = [f for f in frames if len(f)]
            if not frames:
                return knn(g.iloc[0:0])
            return pd.concat(frames, ignore_index=True)
        return knn(g)

    cands = both.map_batches(lambda b: bucketize(b, "cell"),
                             batch_format="pyarrow") \
        .groupby("bucket").map_groups(knn_cell_group, batch_format="pandas")

    # final top-k per query: salt-bucket by qid, vectorized inner head(k)
    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("dist", kind="stable") \
            .drop_duplicates(subset=["qid", "fid"])
        return g.groupby("qid", sort=False).head(k)

    return cands.map_batches(lambda b: bucketize(b, "qid"),
                             batch_format="pyarrow") \
        .groupby("bucket").map_groups(topk, batch_format="pandas") \
        .drop_columns(["bucket"])
