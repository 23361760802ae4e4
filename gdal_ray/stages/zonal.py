"""Zonal statistics — per-polygon stats of raster pixels.

Reference semantics: alg/zonal.cpp (2,233 LoC) + the
`gdal raster zonal-stats` step (apps/gdalalg_raster_zonal_stats.cpp):
for every (raster, zone polygon) pair, the polygon is burned onto the
raster grid and the covered pixels are reduced (count/sum/min/max/mean).

Ray-Data-first plan (the partial+final aggregation pattern from
gcore/gdalrasterband.cpp:5217 ComputeStatistics, distributed):

  1. index both sides by mercator cell (`with_cells`) — ONE shuffle key
     shared with the spatial-join stages;
  2. `groupby(cell).map_groups(ZonalCell)` — inside a cell: vectorized
     envelope prefilter → PBSM reference-point dedup (each pair counted
     in exactly one cell) → decode image, scanline-rasterize the
     polygon mask on the image's own grid, emit a PARTIAL row
     (fid, sum, count, min, max) per pair;
  3. tiny final `groupby(fid).aggregate(Sum/Sum/Min/Max)` — the only
     all-to-all on the small partials table, never on pixels.

Image bytes ship through the cell shuffle once; pixel decode happens
exactly once per (pair, cell-owner).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core import geom
from ..core import wkb as wkb_mod
from ..core.rastervec import rasterize
from .join import reference_cell, with_cells


class ZonalCell:
    """map_groups callable over one cell: emit per-(image, polygon)
    partial pixel statistics."""

    def __init__(self, zoom: int, band: int = 0):
        from ..codecs import decode
        self.zoom = zoom
        self.band = band
        self._decode = decode
        self._px_cache: dict[str, np.ndarray] = {}

    def _pixels(self, image_id: str, blob: bytes, fmt: str) -> np.ndarray:
        px = self._px_cache.get(image_id)
        if px is None:
            px = self._decode(blob, fmt)
            if px.ndim == 3:
                px = px[:, :, self.band]
            if len(self._px_cache) > 512:
                self._px_cache.clear()
            self._px_cache[image_id] = px
        return px

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        cell = np.uint64(group["cell"].iloc[0])
        imgs = group[group["side"] == "I"]
        polys = group[group["side"] == "P"]
        out = {"fid": [], "psum": [], "pcount": [], "pmin": [], "pmax": []}
        if len(imgs) and len(polys):
            ia = imgs[["minx", "miny", "maxx", "maxy"]].to_numpy()
            pe = polys[["minx", "miny", "maxx", "maxy"]].to_numpy()
            overlap = ((ia[:, None, 0] <= pe[None, :, 2])
                       & (pe[None, :, 0] <= ia[:, None, 2])
                       & (ia[:, None, 1] <= pe[None, :, 3])
                       & (pe[None, :, 1] <= ia[:, None, 3]))
            ii, jj = np.nonzero(overlap)
            if len(ii):
                ref = reference_cell(ia[ii, 0], ia[ii, 1],
                                     pe[jj, 0], pe[jj, 1], self.zoom)
                own = ref == cell
                geoms: dict[int, object] = {}
                for i, j in zip(ii[own], jj[own]):
                    irow = imgs.iloc[i]
                    prow = polys.iloc[j]
                    fid = int(prow["fid"])
                    g = geoms.get(fid)
                    if g is None:
                        g = geoms.setdefault(fid, wkb_mod.loads(prow["wkb"]))
                    px = self._pixels(irow["image_id"], irow["bytes"],
                                      irow["fmt"])
                    h, w = px.shape
                    gt = (irow["gt0"], irow["gt1"], irow["gt2"],
                          irow["gt3"], irow["gt4"], irow["gt5"])
                    mask = rasterize([(g, 1)], (h, w), gt,
                                     dtype=np.uint8).astype(bool)
                    if not mask.any():
                        continue
                    vals = px[mask].astype(np.float64)
                    out["fid"].append(fid)
                    out["psum"].append(float(vals.sum()))
                    out["pcount"].append(int(vals.size))
                    out["pmin"].append(float(vals.min()))
                    out["pmax"].append(float(vals.max()))
        return pd.DataFrame({
            "fid": pd.Series(out["fid"], dtype="int64"),
            "psum": pd.Series(out["psum"], dtype="float64"),
            "pcount": pd.Series(out["pcount"], dtype="int64"),
            "pmin": pd.Series(out["pmin"], dtype="float64"),
            "pmax": pd.Series(out["pmax"], dtype="float64"),
        })


def zonal_raster_stats(images_geo, polygons, zoom: int = 7, band: int = 0):
    """Per-polygon stats of raster band pixels across all intersecting
    images. images_geo must carry georef columns (with_georef);
    polygons the T2 schema. Returns Dataset
    (fid, pixel_count, pixel_sum, pixel_min, pixel_max, pixel_mean)."""
    from ray.data.aggregate import Max, Min, Sum

    img_keep = ["image_id", "bytes", "fmt", "gt0", "gt1", "gt2", "gt3",
                "gt4", "gt5", "minx", "miny", "maxx", "maxy"]
    imgs = with_cells(images_geo, zoom, img_keep)
    imgs = imgs.map_batches(
        lambda b: (b.append_column("side", pa.array(["I"] * b.num_rows))
                   .append_column("fid", pa.nulls(b.num_rows, pa.int64()))
                   .append_column("wkb", pa.nulls(b.num_rows, pa.binary()))),
        batch_format="pyarrow")
    pols = with_cells(polygons, zoom,
                      ["fid", "wkb", "minx", "miny", "maxx", "maxy"])

    def pol_pad(b: pa.Table) -> pa.Table:
        b = b.append_column("side", pa.array(["P"] * b.num_rows))
        b = b.append_column("image_id", pa.nulls(b.num_rows, pa.string()))
        b = b.append_column("bytes", pa.nulls(b.num_rows, pa.binary()))
        b = b.append_column("fmt", pa.nulls(b.num_rows, pa.string()))
        for i in range(6):
            b = b.append_column(f"gt{i}", pa.nulls(b.num_rows, pa.float64()))
        return b

    pols = pols.map_batches(pol_pad, batch_format="pyarrow")
    cols = ["cell", "side", "image_id", "bytes", "fmt",
            "gt0", "gt1", "gt2", "gt3", "gt4", "gt5",
            "minx", "miny", "maxx", "maxy", "fid", "wkb"]
    both = imgs.select_columns(cols).union(pols.select_columns(cols))
    zc = ZonalCell(zoom, band)

    def zonal_cell_group(g):
        return zc(g)

    partials = both.groupby("cell").map_groups(zonal_cell_group,
                                               batch_format="pandas")
    agg = partials.groupby("fid").aggregate(
        Sum("psum", alias_name="pixel_sum"),
        Sum("pcount", alias_name="pixel_count"),
        Min("pmin", alias_name="pixel_min"),
        Max("pmax", alias_name="pixel_max"))

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("pixel_sum").to_numpy()
        n = t.column("pixel_count").to_numpy()
        mean = np.where(n > 0, s / np.maximum(n, 1), 0.0)
        return t.append_column("pixel_mean", pa.array(mean, pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")
