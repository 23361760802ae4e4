"""OGR layer algebra — cell-partitioned pairwise overlay.

Reference: ogrlayer.cpp Intersection :5386 (pairwise GEOS intersection
of envelope-overlapping features), Clip :7189, Erase :7538. All share
one skeleton — candidate pairs from a spatial filter, per-pair geometry
combine — which here becomes the SAME shuffle as the spatial join:
cell-index both layers, groupby(cell), PBSM reference-point dedup, then
the per-pair combine from core/overlay (exact intersection areas via
convex decomposition; no GEOS).

Clip/Erase against a rectangle are per-row map_batches (no shuffle):
clip_to_rect is exact, erase area = area(A) − area(A ∩ rect).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core import geom
from ..core import wkb as wkb_mod
from ..core.overlay import intersection_area
from .join import reference_cell, with_cells


class IntersectCell:
    """map_groups callable: pairwise exact intersection areas within a
    cell (A side × B side)."""

    def __init__(self, zoom: int, min_area: float = 0.0):
        self.zoom = zoom
        self.min_area = min_area

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        cell = np.uint64(group["cell"].iloc[0])
        A = group[group["side"] == "A"]
        B = group[group["side"] == "B"]
        out = {"fid_a": [], "fid_b": [], "inter_area": []}
        if len(A) and len(B):
            ea = A[["minx", "miny", "maxx", "maxy"]].to_numpy()
            eb = B[["minx", "miny", "maxx", "maxy"]].to_numpy()
            ov = ((ea[:, None, 0] <= eb[None, :, 2])
                  & (eb[None, :, 0] <= ea[:, None, 2])
                  & (ea[:, None, 1] <= eb[None, :, 3])
                  & (eb[None, :, 1] <= ea[:, None, 3]))
            ii, jj = np.nonzero(ov)
            if len(ii):
                ref = reference_cell(ea[ii, 0], ea[ii, 1],
                                     eb[jj, 0], eb[jj, 1], self.zoom)
                own = ref == cell
                ga: dict[int, object] = {}
                gb: dict[int, object] = {}
                for i, j in zip(ii[own], jj[own]):
                    ra, rb = A.iloc[i], B.iloc[j]
                    fa, fb = int(ra["fid"]), int(rb["fid"])
                    a = ga.get(fa) or ga.setdefault(
                        fa, wkb_mod.loads(ra["wkb"]))
                    b = gb.get(fb) or gb.setdefault(
                        fb, wkb_mod.loads(rb["wkb"]))
                    ar = intersection_area(a, b)
                    if ar > self.min_area:
                        out["fid_a"].append(fa)
                        out["fid_b"].append(fb)
                        out["inter_area"].append(float(ar))
        return pd.DataFrame({
            "fid_a": pd.Series(out["fid_a"], dtype="int64"),
            "fid_b": pd.Series(out["fid_b"], dtype="int64"),
            "inter_area": pd.Series(out["inter_area"], dtype="float64"),
        })


def _tagged(ds, zoom: int, side: str):
    t = with_cells(ds, zoom, ["fid", "wkb", "minx", "miny", "maxx", "maxy"])
    return t.map_batches(
        lambda b, s=side: b.append_column("side", pa.array([s] * b.num_rows)),
        batch_format="pyarrow")


def layer_intersection(layer_a, layer_b, zoom: int = 7,
                       min_area: float = 1e-9):
    """A × B → (fid_a, fid_b, inter_area) for every intersecting pair
    (exact areas; ogrlayer.cpp:5386 semantics minus geometry output)."""
    cols = ["cell", "side", "fid", "wkb", "minx", "miny", "maxx", "maxy"]
    both = _tagged(layer_a, zoom, "A").select_columns(cols) \
        .union(_tagged(layer_b, zoom, "B").select_columns(cols))
    ic = IntersectCell(zoom, min_area)

    def intersect_cell_group(g):
        return ic(g)

    return both.groupby("cell").map_groups(intersect_cell_group,
                                           batch_format="pandas")


def layer_clip_rect(layer, minx, miny, maxx, maxy):
    """Clip every geometry to a rectangle (vector clip,
    apps/gdalalg_vector_clip.cpp) — per-row, no shuffle. Rows whose
    geometry vanishes are dropped; envelope columns refreshed."""
    def clip_batch(t: pa.Table) -> pa.Table:
        keep, wkbs = [], []
        for buf in t["wkb"].to_pylist():
            g = wkb_mod.loads(buf)
            c = geom.clip_to_rect(g, minx, miny, maxx, maxy)
            ok = c is not None
            keep.append(ok)
            wkbs.append(wkb_mod.dumps(c) if ok else None)
        t = t.set_column(t.schema.get_field_index("wkb"), "wkb",
                         pa.array(wkbs, pa.binary()))
        t = t.filter(pa.array(keep))
        env = wkb_mod.envelopes_of_wkb(t["wkb"].to_pylist())
        for k, name in enumerate(["minx", "miny", "maxx", "maxy"]):
            if name in t.column_names:
                t = t.set_column(t.schema.get_field_index(name), name,
                                 pa.array(env[:, k], pa.float64()))
        return t

    return layer.map_batches(clip_batch, batch_format="pyarrow")


def layer_erase_rect(layer, minx, miny, maxx, maxy):
    """Erase a rectangle from every geometry — area accounting
    (ogrlayer.cpp:7538 Erase semantics): emits
    (fid, area, erased_area = area − area(g ∩ rect))."""
    rect = wkb_mod.box(minx, miny, maxx, maxy)

    def erase_batch(t: pa.Table) -> pa.Table:
        fids, areas, erased = [], [], []
        for fid, buf in zip(t["fid"].to_pylist(), t["wkb"].to_pylist()):
            g = wkb_mod.loads(buf)
            a = geom.area(g)
            inter = intersection_area(g, rect)
            fids.append(fid)
            areas.append(float(a))
            erased.append(float(a - inter))
        return pa.table({"fid": pa.array(fids, pa.int64()),
                         "area": pa.array(areas, pa.float64()),
                         "erased_area": pa.array(erased, pa.float64())})

    return layer.map_batches(erase_batch, batch_format="pyarrow")


class SetOpCell:
    """map_groups callable: pairwise set-operation AREAS within a cell
    (ogrlayer.cpp Union :5804 / SymDifference :6341 per-pair semantics,
    area-exact via convex decomposition, attributes carried).

    Emits one row per intersecting (A, B) pair:
      fid_a, fid_b, area_a, area_b, inter_area,
      union_area = a + b − inter, symdiff_area = a + b − 2·inter.
    PBSM reference-point dedup: each pair counted in exactly one cell."""

    def __init__(self, zoom: int, min_area: float = 1e-9):
        self.zoom = zoom
        self.min_area = min_area

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        cell = np.uint64(group["cell"].iloc[0])
        A = group[group["side"] == "A"]
        B = group[group["side"] == "B"]
        out = {"fid_a": [], "fid_b": [], "area_a": [], "area_b": [],
               "inter_area": [], "union_area": [], "symdiff_area": []}
        if len(A) and len(B):
            ea = A[["minx", "miny", "maxx", "maxy"]].to_numpy()
            eb = B[["minx", "miny", "maxx", "maxy"]].to_numpy()
            ov = ((ea[:, None, 0] <= eb[None, :, 2])
                  & (eb[None, :, 0] <= ea[:, None, 2])
                  & (ea[:, None, 1] <= eb[None, :, 3])
                  & (eb[None, :, 1] <= ea[:, None, 3]))
            ii, jj = np.nonzero(ov)
            if len(ii):
                ref = reference_cell(ea[ii, 0], ea[ii, 1],
                                     eb[jj, 0], eb[jj, 1], self.zoom)
                own = ref == cell
                ga: dict[int, tuple] = {}
                gb: dict[int, tuple] = {}
                for i, j in zip(ii[own], jj[own]):
                    ra, rb = A.iloc[i], B.iloc[j]
                    fa, fb = int(ra["fid"]), int(rb["fid"])
                    if fa not in ga:
                        g = wkb_mod.loads(ra["wkb"])
                        ga[fa] = (g, geom.area(g))
                    if fb not in gb:
                        g = wkb_mod.loads(rb["wkb"])
                        gb[fb] = (g, geom.area(g))
                    a_geom, a_area = ga[fa]
                    b_geom, b_area = gb[fb]
                    inter = intersection_area(a_geom, b_geom)
                    if inter <= self.min_area:
                        continue
                    out["fid_a"].append(fa)
                    out["fid_b"].append(fb)
                    out["area_a"].append(float(a_area))
                    out["area_b"].append(float(b_area))
                    out["inter_area"].append(float(inter))
                    out["union_area"].append(float(a_area + b_area - inter))
                    out["symdiff_area"].append(
                        float(a_area + b_area - 2.0 * inter))
        return pd.DataFrame({k: pd.Series(v, dtype="float64" if "area" in k
                                          else "int64")
                             for k, v in out.items()})


def layer_set_op_pairs(layer_a, layer_b, zoom: int = 7,
                       min_area: float = 1e-9):
    """A × B → per-pair intersection/union/symmetric-difference areas
    (the pairwise layer-algebra core shared by Union/SymDifference/
    Identity, ogrlayer.cpp:5804/6341/6771)."""
    cols = ["cell", "side", "fid", "wkb", "minx", "miny", "maxx", "maxy"]
    both = _tagged(layer_a, zoom, "A").select_columns(cols) \
        .union(_tagged(layer_b, zoom, "B").select_columns(cols))
    sc = SetOpCell(zoom, min_area)

    def setop_cell_group(g):
        return sc(g)

    return both.groupby("cell").map_groups(setop_cell_group,
                                           batch_format="pandas")


def layer_erase_layer(layer_a, layer_b, zoom: int = 7):
    """Erase(A, B): per-A-feature area minus its total intersection with
    B (ogrlayer.cpp:7847). EXACT when B's features do not overlap each
    other (tile grids, admin boundaries, parcel layers); self-overlapping
    B over-subtracts — the same caveat GDAL documents for
    non-noded inputs."""
    from ray.data.aggregate import Sum

    pairs = layer_set_op_pairs(layer_a, layer_b, zoom)
    sums = pairs.groupby("fid_a").aggregate(
        Sum("inter_area", alias_name="inter_total"))
    sums_df = sums.to_pandas()        # bounded: one row per A feature

    def erase_batch(t: pa.Table) -> pa.Table:
        fids, areas = [], []
        for fid, buf in zip(t["fid"].to_pylist(), t["wkb"].to_pylist()):
            fids.append(fid)
            areas.append(float(geom.area(wkb_mod.loads(buf))))
        df = pd.DataFrame({"fid": fids, "area": areas})
        df = df.merge(sums_df, left_on="fid", right_on="fid_a", how="left")
        df["erased_area"] = df["area"] - df["inter_total"].fillna(0.0)
        return pa.Table.from_pandas(
            df[["fid", "area", "erased_area"]], preserve_index=False)

    return layer_a.map_batches(erase_batch, batch_format="pyarrow")


def layer_update_layer(layer_a, layer_b, zoom: int = 7):
    """Update(A, B) area accounting (ogrlayer.cpp:7189): B features
    unchanged + A reduced to its part outside B. Emits
    (fid, side, out_area)."""
    era = layer_erase_layer(layer_a, layer_b, zoom)

    def a_rows(t: pa.Table) -> pa.Table:
        return pa.table({"fid": t["fid"],
                         "side": pa.array(["A"] * t.num_rows, pa.string()),
                         "out_area": t["erased_area"]})

    def b_rows(t: pa.Table) -> pa.Table:
        fids, areas = [], []
        for fid, buf in zip(t["fid"].to_pylist(), t["wkb"].to_pylist()):
            fids.append(fid)
            areas.append(float(geom.area(wkb_mod.loads(buf))))
        return pa.table({"fid": pa.array(fids, pa.int64()),
                         "side": pa.array(["B"] * len(fids), pa.string()),
                         "out_area": pa.array(areas, pa.float64())})

    return era.map_batches(a_rows, batch_format="pyarrow").union(
        layer_b.map_batches(b_rows, batch_format="pyarrow"))


def layer_clip_geom(layer, clip_geom):
    """Clip every feature of a layer to an ARBITRARY polygon geometry
    (apps/gdalalg_vector_clip.cpp with a polygon cutline, not just a
    rect): emits clipped piece-multipolygon WKB + exact clip area.
    Convex clippers clip exactly; concave clippers clip against their
    triangulation (pieces partition the result, areas exact)."""
    from ..core.overlay import intersection_pieces

    cwkb = wkb_mod.dumps(clip_geom)

    def clip_batch(t: pa.Table) -> pa.Table:
        cg = wkb_mod.loads(cwkb)
        fids, wkbs, areas = [], [], []
        for fid, buf in zip(t["fid"].to_pylist(), t["wkb"].to_pylist()):
            g = wkb_mod.loads(buf)
            pieces = intersection_pieces(g, cg)   # list of POLYGON geoms
            if not pieces:
                continue
            mp = wkb_mod.multipolygon(pieces) if len(pieces) > 1 else pieces[0]
            fids.append(fid)
            wkbs.append(wkb_mod.dumps(mp))
            # area via the hole-aware exact path (pieces alone ignore
            # holes of the SUBJECT geometry)
            areas.append(float(intersection_area(g, cg)))
        return pa.table({"fid": pa.array(fids, pa.int64()),
                         "wkb": pa.array(wkbs, pa.binary()),
                         "clip_area": pa.array(areas, pa.float64())})

    return layer.map_batches(clip_batch, batch_format="pyarrow")
