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
