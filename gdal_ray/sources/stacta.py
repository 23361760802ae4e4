"""STACTA (STAC Tiled Assets) reader — a STAC item JSON whose
``tiles:tile_matrix_links`` / ``tiles:tile_matrix_sets`` properties
describe a tile pyramid materialized as files addressed by an
``asset_templates`` href pattern.

Reference frmts/stacta/: resolution = scaleDenominator * 0.28e-3 /
meters-per-unit (111319.4907932736 for CRS84/EPSG:4326 degrees),
extent anchored at the matrix topLeftCorner offset by the level's
min_tile_col/row limits, full-res image mosaicked from the highest
zoom level present in the limits; lower zooms are overviews.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

_DEG_M = 111319.4907932736


def _meters_per_unit(crs_url: str) -> float:
    u = crs_url.lower()
    if "crs84" in u or "4326" in u:
        return _DEG_M
    return 1.0


def decode_stacta(path: str, asset: str | None = None,
                  tms: str | None = None, overview: int | None = None):
    """-> (pixels, geotransform, nodata, meta)."""
    doc = json.loads(open(path, "r", encoding="utf-8").read())
    props = doc.get("properties", {})
    links = props.get("tiles:tile_matrix_links", {})
    sets = props.get("tiles:tile_matrix_sets", {})
    templates = doc.get("asset_templates", {})
    if not sets or not templates:
        raise ValueError("not a STACTA item")
    if asset is None:
        asset = next(iter(templates))
    if tms is None:
        tms = next(iter(links)) if links else next(iter(sets))
    tmset = sets[tms]
    limits = links.get(tms, {}).get("limits", {})
    if not limits:
        # no explicit limits: every level covers its full matrix
        limits = {m["identifier"]: {
            "min_tile_col": 0,
            "max_tile_col": int(m["matrixWidth"]) - 1,
            "min_tile_row": 0,
            "max_tile_row": int(m["matrixHeight"]) - 1,
        } for m in tmset["tileMatrix"]}
    matrices = {m["identifier"]: m for m in tmset["tileMatrix"]}
    zooms = sorted((z for z in limits if z in matrices),
                   key=lambda z: float(matrices[z]["scaleDenominator"]),
                   reverse=True)
    if not zooms:
        raise ValueError("STACTA: no usable zoom level")
    level = zooms[-1 - (overview or 0)] if overview else zooms[-1]
    m = matrices[level]
    lim = limits[level]
    mpu = _meters_per_unit(tmset.get("supportedCRS", ""))
    res = float(m["scaleDenominator"]) * 0.28e-3 / mpu
    tw, th = int(m["tileWidth"]), int(m["tileHeight"])
    c0, c1 = int(lim["min_tile_col"]), int(lim["max_tile_col"])
    r0, r1 = int(lim["min_tile_row"]), int(lim["max_tile_row"])
    tlx, tly = (float(v) for v in m["topLeftCorner"][:2])
    gt = (tlx + c0 * tw * res, res, 0.0, tly - r0 * th * res, 0.0, -res)
    w = (c1 - c0 + 1) * tw
    h = (r1 - r0 + 1) * th

    href = templates[asset]["href"]
    base = os.path.dirname(path)
    from .raster import read_raster
    out = None
    for row in range(r0, r1 + 1):
        for col in range(c0, c1 + 1):
            rel = (href.replace("{TileMatrixSet}", tms)
                   .replace("{TileMatrix}", str(level))
                   .replace("{TileRow}", str(row))
                   .replace("{TileCol}", str(col)))
            rel = re.sub(r"^\./", "", rel)
            tile_path = os.path.join(base, rel)
            if not os.path.exists(tile_path):
                continue
            px, *_ = read_raster(tile_path)
            px = np.asarray(px)
            if px.ndim == 2:
                px = px[:, :, None]
            if out is None:
                out = np.zeros((h, w, px.shape[2]), px.dtype)
            y0 = (row - r0) * th
            x0 = (col - c0) * tw
            out[y0:y0 + px.shape[0], x0:x0 + px.shape[1]] = px
    if out is None:
        raise ValueError("STACTA: no tiles found on disk")
    if out.shape[2] == 1:
        out = out[:, :, 0]
    crs = ("EPSG:4326" if mpu == _DEG_M
           else tmset.get("supportedCRS"))
    meta = {"driver": "STACTA", "crs": crs, "zooms": zooms,
            "asset": asset, "tms": tms}
    return out, gt, 0.0, meta


# ----------------------------------------------------------------- STACIT
def _resolve_href(href: str, json_path: str) -> str | None:
    """STAC asset/link hrefs come in file://, absolute, json-relative
    and cwd-relative flavors; try each against the filesystem."""
    if href.startswith("file://"):
        href = href[7:]
    base = os.path.dirname(os.path.abspath(json_path))
    for cand in (href,
                 os.path.join(base, href),
                 os.path.join(base, os.path.basename(href)),
                 os.path.normpath(os.path.join(base, "..", "..", href)),
                 os.path.normpath(os.path.join(base, "..", href))):
        if os.path.exists(cand):
            return cand
    return None


def decode_stacit(path: str, asset: str | None = None,
                  epsg: int | None = None, max_items: int | None = None):
    """STAC ItemCollection mosaic (reference frmts/stacit/): collect
    `data`-role assets with proj:transform across the collection and
    its `next`-linked pages, keep one asset name and one CRS, and
    mosaic the sources into a minimal common grid."""
    items = []
    seen = set()
    p = path
    while p and p not in seen:
        seen.add(p)
        text = open(p, "r", encoding="utf-8").read()
        try:
            doc = json.loads(text)
        except json.JSONDecodeError:
            # the reference's CPL JSON parser tolerates trailing commas
            doc = json.loads(re.sub(r",\s*([}\]])", r"\1", text))
        items.extend(doc.get("features", []))
        nxt = None
        for ln in doc.get("links") or []:
            if ln.get("rel") == "next":
                nxt = _resolve_href(ln["href"], p)
                break
        p = nxt
        if max_items is not None and len(items) >= max_items:
            items = items[:max_items]
            break

    sources = []           # (href, gt, w, h, epsg)
    for it in items:
        it_epsg = it.get("properties", {}).get("proj:epsg")
        for name, a in (it.get("assets") or {}).items():
            if "data" not in (a.get("roles") or ["data"]):
                continue
            tr = a.get("proj:transform")
            bbox = a.get("proj:bbox")
            shape = a.get("proj:shape")
            if tr is None or (bbox is None and shape is None):
                continue
            if asset is None:
                asset = name
            if name != asset:
                continue
            a_epsg = a.get("proj:epsg", it_epsg)
            gt = (tr[2], tr[0], tr[1], tr[5], tr[3], tr[4])
            if bbox is not None:
                w = int(round((bbox[2] - bbox[0]) / gt[1]))
                h = int(round((bbox[3] - bbox[1]) / -gt[5]))
            else:
                h, w = int(shape[0]), int(shape[1])
            sources.append((a["href"], gt, w, h, a_epsg))
    if not sources:
        raise ValueError("STACIT: no usable assets")
    if epsg is None:
        counts = {}
        for *_, e in sources:
            if e is not None:
                counts[e] = counts.get(e, 0) + 1
        epsg = max(counts, key=counts.get) if counts else None
    # assets without their own proj:epsg inherit the chosen CRS
    sources = [s for s in sources if s[4] in (epsg, None)]

    res_x = sources[0][1][1]
    res_y = sources[0][1][5]
    minx = min(s[1][0] for s in sources)
    maxy = max(s[1][3] for s in sources)
    maxx = max(s[1][0] + s[2] * res_x for s in sources)
    miny = min(s[1][3] + s[3] * res_y for s in sources)
    w = int(round((maxx - minx) / res_x))
    h = int(round((maxy - miny) / -res_y))

    from .raster import read_raster
    out = None
    for href, gt, sw, sh, _ in sources:
        src = _resolve_href(href, path)
        if src is None:
            raise FileNotFoundError(f"STACIT: asset not found: {href}")
        px, *_ = read_raster(src)
        px = np.asarray(px)
        if px.ndim == 2:
            px = px[:, :, None]
        if out is None:
            out = np.zeros((h, w, px.shape[2]), px.dtype)
        x0 = int(round((gt[0] - minx) / res_x))
        y0 = int(round((gt[3] - maxy) / res_y))
        out[y0:y0 + px.shape[0], x0:x0 + px.shape[1]] = px
    if out.shape[2] == 1:
        out = out[:, :, 0]
    meta = {"driver": "STACIT", "crs": f"EPSG:{epsg}", "asset": asset}
    return out, (minx, res_x, 0.0, maxy, 0.0, res_y), None, meta
