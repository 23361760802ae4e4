"""TSX (TerraSAR-X / TanDEM-X level-1 product) reader.

Layout (frmts/tsx/tsxdataset.cpp): a ``TSX1_SAR…``/``TDX1_SAR…``
XML file (or product directory containing it) rooted at
``level1Product``; ``productInfo`` supplies the driver's metadata
items (SCENE_CENTRE_TIME, OPERATIONAL_MODE, ORBIT_CYCLE,
ABSOLUTE_ORBIT, ORBIT_DIRECTION, IMAGING_MODE, PRODUCT_VARIANT,
IMAGE_TYPE, ROW/COL_SPACING, AZIMUTH/RANGE_LOOKS) and the raster
shape; ``productComponents`` lists per-polarization ``imageData``
files (COSAR for SSC, GeoTIFF for detected variants — opened
through the engine's raster dispatcher), a GEOREF component whose
``geolocationGrid/gridPoint`` entries become (col,row,lon,lat[,
height]) GCPs (:293-440), and an optional MAPPING_GRID path.  Four
polarizations set MATRIX_REPRESENTATION=SCATTERING like the
reference."""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["read_tsx", "identify_tsx"]

_MD_PATHS = [
    ("SCENE_CENTRE_TIME", "sceneInfo/sceneCenterCoord/azimuthTimeUTC"),
    ("OPERATIONAL_MODE", "generationInfo/groundOperationsType"),
    ("ORBIT_CYCLE", "missionInfo/orbitCycle"),
    ("ABSOLUTE_ORBIT", "missionInfo/absOrbit"),
    ("ORBIT_DIRECTION", "missionInfo/orbitDirection"),
    ("IMAGING_MODE", "acquisitionInfo/imagingMode"),
    ("PRODUCT_VARIANT", "productVariantInfo/productVariant"),
    ("IMAGE_TYPE", "imageDataInfo/imageDataType"),
    ("ROW_SPACING", "imageDataInfo/imageRaster/rowSpacing"),
    ("COL_SPACING", "imageDataInfo/imageRaster/columnSpacing"),
    ("AZIMUTH_LOOKS", "imageDataInfo/imageRaster/azimuthLooks"),
    ("RANGE_LOOKS", "imageDataInfo/imageRaster/rangeLooks"),
]


def _local(tag):
    return tag.rsplit("}", 1)[-1]


def _find(el, path):
    cur = el
    for part in path.split("/"):
        nxt = None
        for child in cur:
            if _local(child.tag) == part:
                nxt = child
                break
        if nxt is None:
            return None
        cur = nxt
    return cur


def _text(el, path, default=""):
    node = _find(el, path)
    return node.text.strip() if node is not None and node.text else default


def identify_tsx(path: str) -> bool:
    base = os.path.basename(path).upper()
    if os.path.isdir(path):
        return base.startswith(("TSX1_SAR", "TDX1_SAR"))
    if not base.startswith(("TSX1_SAR", "TDX1_SAR")):
        return False
    try:
        with open(path, "rb") as fh:
            return b"<level1Product" in fh.read(4096)
    except OSError:
        return False


def _georef_gcps(path: str):
    root = ET.parse(path).getroot()
    grid = _find(root, "geolocationGrid")
    if grid is None:
        return []
    gcps = []
    for gp in grid:
        if _local(gp.tag) != "gridPoint":
            continue
        col = _text(gp, "col")
        row = _text(gp, "row")
        lon = _text(gp, "lon")
        lat = _text(gp, "lat")
        if not (col and row and lon and lat):
            return []
        height = _text(gp, "height", "0")
        gcps.append((float(col), float(row), float(lon), float(lat),
                     float(height)))
    return gcps


def read_tsx(path: str):
    """Open a TerraSAR-X product XML (or directory) →
    ``(pixels, geotransform, nodata, meta)``; polarizations stack on
    the last axis in component order with ``meta['polarizations']``."""
    if os.path.isdir(path):
        inner = os.path.join(path, os.path.basename(path) + ".xml")
        if not os.path.exists(inner):
            cands = [f for f in os.listdir(path)
                     if f.upper().startswith(("TSX1_SAR", "TDX1_SAR"))
                     and f.lower().endswith(".xml")]
            if not cands:
                raise ValueError("TSX: no product XML in directory")
            inner = os.path.join(path, sorted(cands)[0])
        path = inner
    if not identify_tsx(path):
        raise ValueError("not a TerraSAR-X product")
    root = ET.parse(path).getroot()
    if _local(root.tag) != "level1Product":
        raise ValueError("TSX: root is not level1Product")
    pinfo = _find(root, "productInfo")
    if pinfo is None:
        raise ValueError("TSX: missing productInfo")
    meta: dict = {"driver": "TSX"}
    for key, xpath in _MD_PATHS:
        val = _text(pinfo, xpath, "unknown")
        meta[key] = val
    rows = int(_text(pinfo, "imageDataInfo/imageRaster/numberOfRows",
                     "0"))
    cols = int(_text(pinfo, "imageDataInfo/imageRaster/numberOfColumns",
                     "0"))
    meta["width"], meta["height"] = cols, rows

    comps = _find(root, "productComponents")
    if comps is None:
        raise ValueError("TSX: missing productComponents")
    base_dir = os.path.dirname(path)
    bands = []
    pols = []
    georef_file = None
    gt = None
    from .raster import read_raster
    for comp in comps:
        fpath = _text(comp, "file/location/path")
        fname = _text(comp, "file/location/filename")
        ctype = _text(comp, "type")
        pol = _text(comp, "polLayer")
        rel = os.path.join(fpath, fname) if fpath else fname
        full = os.path.join(base_dir, rel) if rel else ""
        if ".." in rel.split(os.sep):
            raise ValueError(f"TSX: path traversal in {rel!r}")
        if ctype.upper().startswith("MAPPING_GRID"):
            meta["MAPPING_GRID"] = full
        elif ctype.upper().startswith("GEOREF"):
            georef_file = full
        elif _local(comp.tag).startswith("imageData") and pol:
            if not os.path.exists(full):
                continue
            px, bgt, nd, bmeta = read_raster(full)
            if px.ndim == 3 and px.shape[2] == 1:
                px = px[:, :, 0]
            bands.append(px)
            pols.append(pol.upper())
            if bgt is not None:
                gt = bgt
                if "crs" in bmeta:
                    meta["crs"] = bmeta["crs"]
    if not bands:
        raise ValueError("TSX: no imageData components found")
    if len(pols) == 4:
        meta["MATRIX_REPRESENTATION"] = "SCATTERING"
    meta["polarizations"] = pols
    if georef_file and os.path.exists(georef_file):
        gcps = _georef_gcps(georef_file)
        if gcps:
            meta["gcps"] = [(c, r, lon, lat, h)
                            for c, r, lon, lat, h in gcps]
    px = bands[0] if len(bands) == 1 else np.stack(bands, axis=-1)
    return px, gt, None, meta
