"""Tile cutting: cover-list expansion, per-tile render, overview cascade.

Ray-Data-first re-expression of gdal2tiles / `gdal raster tile`
semantics (reference: swig/python/gdal-utils/osgeo_utils/gdal2tiles.py
lifecycle; apps/gdalalg_raster_tile.cpp:642-700 per-tile work unit):

  Stage A (max zoom): metadata-only flat_map computes each image's
  covering (z, x, y) tiles — the "TileDetail manifest" — then
  groupby(cell) co-locates all image contributions per tile and a
  map_groups actor renders: decode → affine warp onto the tile grid →
  composite in image_id order → encode PNG. The shuffle moves *encoded*
  bytes only; pixels exist only inside the render actor (wide-row rule,
  SURVEY §7.5.6).

  Stage B (overviews): zoom-descending 4→1 combine
  (create_overview_tile semantics, gdal2tiles.py:1466-1494) with a
  per-zoom barrier (gdal2tiles.py:4547).

Skew: contributions for hot cells can be range-salted by image rank so
salt buckets composite disjoint image_id ranges; merging buckets in
salt order preserves global compositing order (PBSM-style).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..codecs import decode as codec_decode
from ..codecs import encode as codec_encode
from ..core import geotransform as gtr
from ..core import mercator as merc
from ..core import resample as rs
from ..core.checksum import checksum_multiband

TILE_SIZE = 256

COVER_SCHEMA = pa.schema([
    ("cell", pa.uint64()),
    ("z", pa.int32()), ("x", pa.int64()), ("y", pa.int64()),
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("fmt", pa.string()),
    ("gt0", pa.float64()), ("gt1", pa.float64()), ("gt2", pa.float64()),
    ("gt3", pa.float64()), ("gt4", pa.float64()), ("gt5", pa.float64()),
    ("img_w", pa.int32()), ("img_h", pa.int32()),
])

TILE_SCHEMA = pa.schema([
    ("cell", pa.uint64()),
    ("z", pa.int32()), ("x", pa.int64()), ("y", pa.int64()),
    ("png", pa.binary()),
    ("n_src", pa.int32()),
    ("cs_r", pa.int32()), ("cs_g", pa.int32()), ("cs_b", pa.int32()),
])


def cover_batch(batch: pa.Table, zoom: int | None = None,
                max_cells_per_image: int = 4096) -> pa.Table:
    """Image rows (with georef cols) → one row per covering tile at
    `zoom` (or each image's native_z when zoom is None). Metadata-only:
    carries encoded bytes through to the render stage."""
    n = batch.num_rows
    minx = batch["minx"].to_numpy(); miny = batch["miny"].to_numpy()
    maxx = batch["maxx"].to_numpy(); maxy = batch["maxy"].to_numpy()
    native = batch["native_z"].to_numpy()
    out_rows: dict[str, list] = {k.name: [] for k in COVER_SCHEMA}
    ids = batch["image_id"].to_pylist()
    bys = batch["bytes"].to_pylist()
    fmts = batch["fmt"].to_pylist()
    gts = [batch[f"gt{k}"].to_numpy() for k in range(6)]
    ws = batch["w"].to_numpy(); hs = batch["h"].to_numpy()
    for i in range(n):
        z = int(zoom if zoom is not None else native[i])
        cells = merc.cells_for_envelope(minx[i], miny[i], maxx[i], maxy[i], z,
                                        max_cells=max_cells_per_image)
        if len(cells) == 0:
            continue
        zz, xx, yy = merc.cell_decode(cells)
        k = len(cells)
        out_rows["cell"].extend(cells.tolist())
        out_rows["z"].extend([z] * k)
        out_rows["x"].extend(xx.tolist())
        out_rows["y"].extend(yy.tolist())
        out_rows["image_id"].extend([ids[i]] * k)
        out_rows["bytes"].extend([bys[i]] * k)
        out_rows["fmt"].extend([fmts[i]] * k)
        for g in range(6):
            out_rows[f"gt{g}"].extend([float(gts[g][i])] * k)
        out_rows["img_w"].extend([int(ws[i])] * k)
        out_rows["img_h"].extend([int(hs[i])] * k)
    return pa.Table.from_pydict(out_rows, schema=COVER_SCHEMA)


def tile_geotransform(z: int, x: int, y_xyz: int, tile_size: int = TILE_SIZE):
    """North-up geotransform of an XYZ tile's pixel grid."""
    ty_tms = int(merc.xyz_to_tms(y_xyz, z))
    minx, miny, maxx, maxy = merc.tile_bounds(x, ty_tms, z, tile_size)
    return gtr.from_bounds(float(minx), float(miny), float(maxx), float(maxy),
                           tile_size, tile_size)


FRAGMENT_SCHEMA = pa.schema([
    ("cell", pa.uint64()),
    ("z", pa.int32()), ("x", pa.int64()), ("y", pa.int64()),
    ("image_id", pa.string()),
    ("r0", pa.int32()), ("c0", pa.int32()),
    ("frag", pa.binary()),          # RGBA png: rgb + validity alpha
])

_KERNEL_RADIUS = {"near": 1, "bilinear": 1, "cubic": 2,
                  "cubicspline": 2, "lanczos": 3}


def _footprint_window(src_gt, w, h, dst_gt, ts, resampling):
    """dst sub-window (c0, r0, c1, r1) covered by a source footprint,
    padded by the resampling kernel's reach (ComputeSourceWindow's dual,
    alg/gdalwarpoperation.cpp:134)."""
    exs = (src_gt[0], src_gt[0] + w * src_gt[1])
    eys = (src_gt[3], src_gt[3] + h * src_gt[5])
    c0 = int(np.floor((min(exs) - dst_gt[0]) / dst_gt[1]))
    c1 = int(np.ceil((max(exs) - dst_gt[0]) / dst_gt[1]))
    r0 = int(np.floor((max(eys) - dst_gt[3]) / dst_gt[5]))
    r1 = int(np.ceil((min(eys) - dst_gt[3]) / dst_gt[5]))
    radius = _KERNEL_RADIUS.get(resampling, 2)
    pad = int(np.ceil(radius * abs(src_gt[1]) / abs(dst_gt[1]))) + 1
    return (max(c0 - pad, 0), max(r0 - pad, 0),
            min(c1 + pad, ts), min(r1 + pad, ts))


def warp_fragments_batch(batch: pa.Table, zoom: int | None = None,
                         *, resampling: str = "bilinear",
                         tile_size: int = TILE_SIZE,
                         max_cells_per_image: int = 4096) -> pa.Table:
    """Image rows (with georef cols) → one PRE-WARPED tile fragment per
    covering tile: decode once in the map stage, warp each covering
    tile's sub-window, re-encode the fragment as RGBA PNG (alpha =
    validity).

    This is the scale fix for the render shuffle: the exchange carries
    ≤tile_size² encoded fragments totalling ≈1× the corpus, instead of
    the full source bytes duplicated once per covering cell
    (cover-factor×). Per-pixel results are IDENTICAL to warping inside
    the render group: to_uint8 is elementwise and compositing is
    later-id-wins either way (checksum-verified in tests)."""
    n = batch.num_rows
    minx = batch["minx"].to_numpy(); miny = batch["miny"].to_numpy()
    maxx = batch["maxx"].to_numpy(); maxy = batch["maxy"].to_numpy()
    native = batch["native_z"].to_numpy()
    ids = batch["image_id"].to_pylist()
    bys = batch["bytes"].to_pylist()
    fmts = batch["fmt"].to_pylist()
    gts = [batch[f"gt{k}"].to_numpy() for k in range(6)]
    ts = tile_size
    out: dict[str, list] = {k.name: [] for k in FRAGMENT_SCHEMA}
    for i in range(n):
        z = int(zoom if zoom is not None else native[i])
        cells = merc.cells_for_envelope(minx[i], miny[i], maxx[i], maxy[i], z,
                                        max_cells=max_cells_per_image)
        if len(cells) == 0:
            continue
        src_gt = tuple(float(g[i]) for g in gts)
        px = codec_decode(bys[i], fmts[i])
        h, w = px.shape[:2]
        zz, xx, yy = merc.cell_decode(cells)
        for cell, tx, ty in zip(cells.tolist(), xx.tolist(), yy.tolist()):
            dst_gt = tile_geotransform(z, int(tx), int(ty), ts)
            c0, r0, c1, r1 = _footprint_window(src_gt, w, h, dst_gt, ts,
                                               resampling)
            if c0 >= c1 or r0 >= r1:
                continue
            sub_gt = (dst_gt[0] + c0 * dst_gt[1], dst_gt[1], 0.0,
                      dst_gt[3] + r0 * dst_gt[5], 0.0, dst_gt[5])
            warped, valid = rs.warp(px, src_gt, sub_gt, (r1 - r0, c1 - c0),
                                    resampling)
            if not valid.any():
                continue
            rgb = rs.to_uint8(np.where(valid[:, :, None], warped, 0.0))
            rgba = np.dstack([rgb, (valid * 255).astype(np.uint8)])
            out["cell"].append(np.uint64(cell))
            out["z"].append(z); out["x"].append(int(tx)); out["y"].append(int(ty))
            out["image_id"].append(ids[i])
            out["r0"].append(r0); out["c0"].append(c0)
            # level-1 deflate: fragments live only through one exchange,
            # so trade ~15% size for ~3x faster encode
            out["frag"].append(codec_encode(rgba, "png", level=1))
    return pa.Table.from_pydict(out, schema=FRAGMENT_SCHEMA)


class RenderFragments:
    """map_groups callable: pre-warped fragments of one (z,x,y) tile →
    one rendered RGBA tile row. Compositing order: ascending image_id,
    later wins on valid pixels — identical to RenderTile."""

    def __init__(self, tile_size: int = TILE_SIZE, skip_blank: bool = True):
        self.tile_size = tile_size
        self.skip_blank = skip_blank

    def _render_one(self, group: pd.DataFrame, out: dict) -> None:
        z = int(group["z"].iloc[0]); x = int(group["x"].iloc[0])
        y = int(group["y"].iloc[0]); cell = np.uint64(group["cell"].iloc[0])
        ts = self.tile_size
        acc = np.zeros((ts, ts, 3), dtype=np.uint8)
        alpha = np.zeros((ts, ts), dtype=bool)
        ids = group["image_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        frags = group["frag"].to_numpy()
        r0s = group["r0"].to_numpy()
        c0s = group["c0"].to_numpy()
        n_src = 0
        for ridx in order:
            rgba = codec_decode(frags[ridx], "png")
            fh, fw = rgba.shape[:2]
            r0, c0 = int(r0s[ridx]), int(c0s[ridx])
            valid = rgba[:, :, 3] > 0
            if not valid.any():
                continue
            win = acc[r0:r0 + fh, c0:c0 + fw]
            win[valid] = rgba[:, :, :3][valid]
            alpha[r0:r0 + fh, c0:c0 + fw] |= valid
            n_src += 1
        if self.skip_blank and not alpha.any():
            return
        rgba_out = np.dstack([acc, (alpha * 255).astype(np.uint8)])
        cs = checksum_multiband(acc)
        out["cell"].append(np.uint64(cell)); out["z"].append(z)
        out["x"].append(x); out["y"].append(y)
        out["png"].append(codec_encode(rgba_out, "png"))
        out["n_src"].append(n_src)
        out["cs_r"].append(int(cs[0])); out["cs_g"].append(int(cs[1]))
        out["cs_b"].append(int(cs[2]))

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        out = {k: [] for k in ("cell", "z", "x", "y", "png", "n_src",
                               "cs_r", "cs_g", "cs_b")}
        if "bucket" in group.columns and group["cell"].nunique() > 1:
            for _, sub in group.groupby("cell", sort=False):
                self._render_one(sub, out)
        elif len(group):
            self._render_one(group, out)
        if not out["cell"]:
            return _empty_tile_frame()
        return pd.DataFrame({
            "cell": pd.Series(out["cell"], dtype="uint64"),
            "z": pd.Series(out["z"], dtype="int32"),
            "x": pd.Series(out["x"], dtype="int64"),
            "y": pd.Series(out["y"], dtype="int64"),
            "png": pd.Series(out["png"], dtype=object),
            "n_src": pd.Series(out["n_src"], dtype="int32"),
            "cs_r": pd.Series(out["cs_r"], dtype="int32"),
            "cs_g": pd.Series(out["cs_g"], dtype="int32"),
            "cs_b": pd.Series(out["cs_b"], dtype="int32"),
        })


class RenderTile:
    """map_groups callable: all contributions of one (z,x,y) tile →
    one rendered RGBA tile row.

    Actor-pool stage: per-actor decode cache (an image overlapping k
    tiles in this actor's groups decodes once — GDAL's block-cache role,
    gcore/gdalrasterblock.cpp, scoped per worker instead of global).
    """

    def __init__(self, resampling: str = "bilinear", tile_size: int = TILE_SIZE,
                 skip_blank: bool = True):
        self.resampling = resampling
        self.tile_size = tile_size
        self.skip_blank = skip_blank
        self._cache: dict[str, np.ndarray] = {}
        self._cache_bytes = 0
        self._cache_limit = 256 * 1024 * 1024

    def _decode(self, image_id: str, buf: bytes, fmt: str) -> np.ndarray:
        px = self._cache.get(image_id)
        if px is None:
            px = codec_decode(buf, fmt)
            if self._cache_bytes + px.nbytes > self._cache_limit:
                self._cache.clear()
                self._cache_bytes = 0
            self._cache[image_id] = px
            self._cache_bytes += px.nbytes
        return px

    def _render_one(self, group: pd.DataFrame, out: dict) -> None:
        """Render one tile's contribution group; append to column lists."""
        z = int(group["z"].iloc[0]); x = int(group["x"].iloc[0])
        y = int(group["y"].iloc[0]); cell = np.uint64(group["cell"].iloc[0])
        ts = self.tile_size
        dst_gt = tile_geotransform(z, x, y, ts)
        acc = np.zeros((ts, ts, 3), dtype=np.float64)
        alpha = np.zeros((ts, ts), dtype=bool)
        # deterministic compositing order: ascending image_id, later wins
        ids = group["image_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        blobs = group["bytes"].to_numpy()
        fmts = group["fmt"].to_numpy()
        gts = [group[f"gt{k}"].to_numpy() for k in range(6)]
        ws = group["img_w"].to_numpy()
        hs = group["img_h"].to_numpy()
        n_src = 0
        for ridx in order:
            src_gt = tuple(g[ridx] for g in gts)
            # dst sub-window covered by this image's footprint — warping
            # only it makes hot tiles (hundreds of small images) linear
            # in footprint area, not in tile area × images
            # (ComputeSourceWindow's dual, alg/gdalwarpoperation.cpp:134)
            exs = (src_gt[0], src_gt[0] + ws[ridx] * src_gt[1])
            eys = (src_gt[3], src_gt[3] + hs[ridx] * src_gt[5])
            c0 = int(np.floor((min(exs) - dst_gt[0]) / dst_gt[1]))
            c1 = int(np.ceil((max(exs) - dst_gt[0]) / dst_gt[1]))
            r0 = int(np.floor((max(eys) - dst_gt[3]) / dst_gt[5]))
            r1 = int(np.ceil((min(eys) - dst_gt[3]) / dst_gt[5]))
            # pad by the kernel's reach: a dst pixel center up to
            # radius src-px outside the footprint can still get weight;
            # convert to dst px via the src/dst resolution ratio
            radius = {"near": 1, "bilinear": 1, "cubic": 2,
                      "cubicspline": 2, "lanczos": 3}.get(self.resampling, 2)
            pad = int(np.ceil(radius * abs(src_gt[1]) / abs(dst_gt[1]))) + 1
            c0 = max(c0 - pad, 0); r0 = max(r0 - pad, 0)
            c1 = min(c1 + pad, ts); r1 = min(r1 + pad, ts)
            if c0 >= c1 or r0 >= r1:
                continue
            sub_gt = (dst_gt[0] + c0 * dst_gt[1], dst_gt[1], 0.0,
                      dst_gt[3] + r0 * dst_gt[5], 0.0, dst_gt[5])
            px = self._decode(ids[ridx], blobs[ridx], fmts[ridx])
            warped, valid = rs.warp(px, src_gt, sub_gt, (r1 - r0, c1 - c0),
                                    self.resampling)
            if not valid.any():
                continue
            acc[r0:r1, c0:c1][valid] = warped[valid]
            alpha[r0:r1, c0:c1] |= valid
            n_src += 1
        if self.skip_blank and not alpha.any():
            return
        rgb = rs.to_uint8(acc)
        rgba = np.dstack([rgb, (alpha * 255).astype(np.uint8)])
        cs = checksum_multiband(rgb)
        out["cell"].append(np.uint64(cell)); out["z"].append(z)
        out["x"].append(x); out["y"].append(y)
        out["png"].append(codec_encode(rgba, "png"))
        out["n_src"].append(n_src)
        out["cs_r"].append(int(cs[0])); out["cs_g"].append(int(cs[1]))
        out["cs_b"].append(int(cs[2]))

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        """Salt-bucket group: many tiles per call (all rows of a cell are
        in the same bucket); renders each cell's tile, one frame out."""
        out = {k: [] for k in ("cell", "z", "x", "y", "png", "n_src",
                               "cs_r", "cs_g", "cs_b")}
        if "bucket" in group.columns and group["cell"].nunique() > 1:
            for _, sub in group.groupby("cell", sort=False):
                self._render_one(sub, out)
        elif len(group):
            self._render_one(group, out)
        if not out["cell"]:
            return _empty_tile_frame()
        return pd.DataFrame({
            "cell": pd.Series(out["cell"], dtype="uint64"),
            "z": pd.Series(out["z"], dtype="int32"),
            "x": pd.Series(out["x"], dtype="int64"),
            "y": pd.Series(out["y"], dtype="int64"),
            "png": pd.Series(out["png"], dtype=object),
            "n_src": pd.Series(out["n_src"], dtype="int32"),
            "cs_r": pd.Series(out["cs_r"], dtype="int32"),
            "cs_g": pd.Series(out["cs_g"], dtype="int32"),
            "cs_b": pd.Series(out["cs_b"], dtype="int32"),
        })


def _empty_tile_frame() -> pd.DataFrame:
    return pd.DataFrame({
        "cell": pd.Series([], dtype="uint64"), "z": pd.Series([], dtype="int32"),
        "x": pd.Series([], dtype="int64"), "y": pd.Series([], dtype="int64"),
        "png": pd.Series([], dtype=object), "n_src": pd.Series([], dtype="int32"),
        "cs_r": pd.Series([], dtype="int32"), "cs_g": pd.Series([], dtype="int32"),
        "cs_b": pd.Series([], dtype="int32"),
    })


class CombineChildren:
    """Overview cascade 4→1: map_groups over parent cell; places ≤4 child
    tiles into a 2×2 mosaic and box-downsamples (gdal2tiles
    create_overview_tile semantics)."""

    def __init__(self, tile_size: int = TILE_SIZE, alg: str = "average"):
        self.tile_size = tile_size
        self.alg = alg

    def _combine_one(self, group: pd.DataFrame, out: dict) -> None:
        ts = self.tile_size
        pz = int(group["z"].iloc[0]) - 1
        px_ = int(group["x"].iloc[0]) >> 1
        py_ = int(group["y"].iloc[0]) >> 1
        mosaic = np.zeros((2 * ts, 2 * ts, 4), dtype=np.uint8)
        n_src = 0
        xs = group["x"].to_numpy()
        ys = group["y"].to_numpy()
        pngs = group["png"].to_numpy()
        srcs = group["n_src"].to_numpy()
        for i in range(len(group)):
            child = codec_decode(pngs[i], "png")
            dx = (int(xs[i]) & 1) * ts
            dy = (int(ys[i]) & 1) * ts  # XYZ y grows downward
            mosaic[dy:dy + ts, dx:dx + ts] = child
            n_src += int(srcs[i])
        down = rs.downsample2x(mosaic, self.alg)
        # de-premultiply-free alpha: average alpha independently
        rgba = rs.to_uint8(down)
        rgb = rgba[:, :, :3]
        cs = checksum_multiband(rgb)
        out["cell"].append(np.uint64(merc.cell_id(pz, px_, py_)))
        out["z"].append(pz); out["x"].append(px_); out["y"].append(py_)
        out["png"].append(codec_encode(rgba, "png"))
        out["n_src"].append(n_src)
        out["cs_r"].append(int(cs[0])); out["cs_g"].append(int(cs[1]))
        out["cs_b"].append(int(cs[2]))

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        out = {k: [] for k in ("cell", "z", "x", "y", "png", "n_src",
                               "cs_r", "cs_g", "cs_b")}
        if "bucket" in group.columns and group["parent"].nunique() > 1:
            for _, sub in group.groupby("parent", sort=False):
                self._combine_one(sub, out)
        elif len(group):
            self._combine_one(group, out)
        if not out["cell"]:
            return _empty_tile_frame()
        return pd.DataFrame({
            "cell": pd.Series(out["cell"], dtype="uint64"),
            "z": pd.Series(out["z"], dtype="int32"),
            "x": pd.Series(out["x"], dtype="int64"),
            "y": pd.Series(out["y"], dtype="int64"),
            "png": pd.Series(out["png"], dtype=object),
            "n_src": pd.Series(out["n_src"], dtype="int32"),
            "cs_r": pd.Series(out["cs_r"], dtype="int32"),
            "cs_g": pd.Series(out["cs_g"], dtype="int32"),
            "cs_b": pd.Series(out["cs_b"], dtype="int32"),
        })


def add_parent_cell(batch: pa.Table) -> pa.Table:
    parent = merc.cell_parent(batch["cell"].to_numpy())
    return batch.append_column("parent", pa.array(parent, pa.uint64()))
