"""Sentinel-2 L1C/L2A SAFE product reader — the main
``MTD_MSIL1C.xml`` / ``S2A_OPER_MTD_SAFL1C.xml`` plus per-granule tile
metadata, mosaicking granule JP2 band files onto the union grid of
one resolution + CRS.

Reference frmts/sentinel2/sentinel2dataset.cpp: subdatasets group the
13 MSI bands by native resolution (10m: B2 B3 B4 B8; 20m: B5 B6 B7
B8A B11 B12; 60m: B1 B9 B10); each granule's placement comes from its
Tile_Geocoding ULX/ULY at that resolution; product metadata keys
(DATATAKE_1_*, quality flags, QUANTIFICATION_VALUE,
SPECIAL_VALUE_*, REFERENCE_BAND as a band name, FOOTPRINT from
EXT_POS_LIST lat/lon pairs) follow the reference's naming exactly.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

# band -> (native resolution m, central wavelength um, FWHM um)
BANDS = {
    "B1": (60, 0.443, 0.020), "B2": (10, 0.490, 0.065),
    "B3": (10, 0.560, 0.035), "B4": (10, 0.665, 0.030),
    "B5": (20, 0.705, 0.015), "B6": (20, 0.740, 0.015),
    "B7": (20, 0.783, 0.020), "B8": (10, 0.842, 0.115),
    "B8A": (20, 0.865, 0.020), "B9": (60, 0.945, 0.020),
    "B10": (60, 1.375, 0.030), "B11": (20, 1.610, 0.090),
    "B12": (20, 2.190, 0.180),
}
# bandId index order in the PSD (REFERENCE_BAND is an index)
_BAND_ORDER = ["B1", "B2", "B3", "B4", "B5", "B6", "B7", "B8",
               "B9", "B10", "B11", "B12", "B8A"]
# reference's subdataset listing order (B8A between B7 and B11)
RES_BANDS = {10: ["B2", "B3", "B4", "B8"],
             20: ["B5", "B6", "B7", "B8A", "B11", "B12"],
             60: ["B1", "B9", "B10"]}


def _strip(root):
    for el in root.iter():
        el.tag = el.tag.rsplit("}", 1)[-1]
    return root


def _txt(root, tag, default=None):
    el = root.find(f".//{tag}")
    return el.text.strip() if el is not None and el.text else default


def sentinel2_info(xml_path: str) -> dict:
    """Product metadata + subdataset descriptors, reference key
    naming (sentinel2.py autotest expected_md)."""
    root = _strip(ET.parse(xml_path).getroot())
    md = {}
    for tag in ("PRODUCT_START_TIME", "PRODUCT_STOP_TIME",
                "PROCESSING_LEVEL", "PRODUCT_TYPE",
                "PROCESSING_BASELINE", "GENERATION_TIME",
                "PREVIEW_IMAGE_URL", "PREVIEW_GEO_INFO",
                "DEGRADED_ANC_DATA_PERCENTAGE",
                "DEGRADED_MSI_DATA_PERCENTAGE",
                "FORMAT_CORRECTNESS_FLAG", "GENERAL_QUALITY_FLAG",
                "GEOMETRIC_QUALITY_FLAG", "RADIOMETRIC_QUALITY_FLAG",
                "SENSOR_QUALITY_FLAG"):
        v = _txt(root, tag)
        if v is not None:
            md[tag] = v
    dt = root.find(".//Datatake")
    if dt is not None:
        md["DATATAKE_1_ID"] = dt.get("datatakeIdentifier", "")
        for tag in ("DATATAKE_SENSING_START", "DATATAKE_TYPE",
                    "SENSING_ORBIT_DIRECTION", "SENSING_ORBIT_NUMBER",
                    "SPACECRAFT_NAME"):
            v = _txt(dt, tag)
            if v is not None:
                md[f"DATATAKE_1_{tag}"] = v
    v = _txt(root, "Cloud_Coverage_Assessment")
    if v is not None:
        md["CLOUD_COVERAGE_ASSESSMENT"] = v
    v = _txt(root, "QUANTIFICATION_VALUE")
    if v is not None:
        md["QUANTIFICATION_VALUE"] = v
    u = _txt(root, "U")
    if u is not None:
        md["REFLECTANCE_CONVERSION_U"] = u
    rb = _txt(root, "REFERENCE_BAND")
    if rb is not None and rb.isdigit():
        md["REFERENCE_BAND"] = _BAND_ORDER[int(rb)]
    for sv in root.findall(".//Special_Values"):
        name = _txt(sv, "SPECIAL_VALUE_TEXT")
        idx = _txt(sv, "SPECIAL_VALUE_INDEX")
        if name and idx is not None:
            md[f"SPECIAL_VALUE_{name}"] = idx
    pos = _txt(root, "EXT_POS_LIST")
    if pos:
        vals = [float(v) for v in pos.split()]
        pts = [(vals[i + 1], vals[i]) for i in range(0, len(vals) - 1, 2)]
        if pts and pts[0] != pts[-1]:
            pts.append(pts[0])
        md["FOOTPRINT"] = ("POLYGON((" + ", ".join(
            f"{x:g} {y:g}" for x, y in pts) + "))")

    granules = [g.get("granuleIdentifier")
                for g in root.findall(".//Granules")]
    if not granules:
        granules = [g.get("granuleIdentifier")
                    for g in root.findall(".//Granule")]
    image_ids = {}
    for g in root.findall(".//Granules") + root.findall(".//Granule"):
        gid = g.get("granuleIdentifier")
        ids = [e.text.strip() for e in g.findall("IMAGE_ID")
               if e.text] + [e.text.strip()
                             for e in g.findall("IMAGE_FILE") if e.text]
        image_ids[gid] = ids
    subs = [{"resolution": f"{res}m", "bands": RES_BANDS[res]}
            for res in (10, 20, 60)]
    return {"metadata": md, "granules": granules,
            "image_ids": image_ids, "subdatasets": subs}


def _granule_dir(xml_path: str, gid: str) -> str | None:
    gdir = os.path.join(os.path.dirname(xml_path), "GRANULE")
    if not os.path.isdir(gdir):
        return None
    cand = os.path.join(gdir, gid)
    if os.path.isdir(cand):
        return cand
    for d in sorted(os.listdir(gdir)):
        if gid in d or d in gid:
            return os.path.join(gdir, d)
    return None


def _granule_geocoding(gran_dir: str):
    mtds = [f for f in os.listdir(gran_dir) if f.endswith(".xml")]
    if not mtds:
        return None
    root = _strip(ET.parse(os.path.join(gran_dir, mtds[0])).getroot())
    epsg = (_txt(root, "HORIZONTAL_CS_CODE") or "").replace("EPSG:", "")
    out = {"epsg": int(epsg) if epsg.isdigit() else None, "res": {}}
    sizes = {}
    for el in root.findall(".//Size"):
        r = int(el.get("resolution"))
        sizes[r] = (int(_txt(el, "NROWS")), int(_txt(el, "NCOLS")))
    for el in root.findall(".//Geoposition"):
        r = int(el.get("resolution"))
        nrows, ncols = sizes.get(r, (0, 0))
        out["res"][r] = {
            "ulx": float(_txt(el, "ULX")), "uly": float(_txt(el, "ULY")),
            "xdim": float(_txt(el, "XDIM")),
            "ydim": float(_txt(el, "YDIM")),
            "nrows": nrows, "ncols": ncols}
    return out


def read_sentinel2(xml_path: str, resolution: int = 10,
                   materialize: bool = False):
    """-> descriptor dict: union grid (width/height/geotransform/crs),
    per-band granule placements, product metadata.  With
    ``materialize=True`` also decodes and mosaics the granule JP2s
    into ``pixels`` (h, w, nbands) uint16."""
    info = sentinel2_info(xml_path)
    bands = RES_BANDS[resolution]
    placements = []          # (band, jp2_path, gran geocode)
    grids = []
    for gid in info["granules"]:
        gdir = _granule_dir(xml_path, gid)
        if gdir is None:
            continue
        geo = _granule_geocoding(gdir)
        if geo is None or resolution not in geo["res"]:
            continue
        g = geo["res"][resolution]
        g["epsg"] = geo["epsg"]
        grids.append(g)
        for iid in info["image_ids"].get(gid, []):
            band = iid.rsplit("_", 1)[-1]
            if band not in BANDS and band.startswith("B"):
                band = "B" + band[1:].lstrip("0")        # B01 -> B1
            if band not in bands:
                continue
            jp2 = os.path.join(gdir, "IMG_DATA",
                               os.path.basename(iid) + ".jp2")
            placements.append((band, jp2, g))
    if not grids:
        raise ValueError("Sentinel-2: no granules found")
    g0 = grids[0]
    xdim, ydim = g0["xdim"], g0["ydim"]
    ulx = min(g["ulx"] for g in grids)
    uly = max(g["uly"] for g in grids)
    lrx = max(g["ulx"] + g["ncols"] * xdim for g in grids)
    lry = min(g["uly"] + g["nrows"] * ydim for g in grids)
    w = int(round((lrx - ulx) / xdim))
    h = int(round((lry - uly) / ydim))
    gt = (ulx, xdim, 0.0, uly, 0.0, ydim)
    epsg = next((geo for geo in (g.get("epsg") for g in grids)), None)

    desc = {"driver": "SENTINEL2", "width": w, "height": h,
            "geotransform": gt,
            "crs": f"EPSG:{epsg}" if epsg else None,
            "bands": bands,
            "band_info": {b: {"CENTRAL_WAVELENGTH_UM": BANDS[b][1],
                              "FWHM_UM": BANDS[b][2]} for b in bands},
            "metadata": {k: v for k, v in info["metadata"].items()
                         if k != "FOOTPRINT"},
            "sources": [
                {"band": b, "path": p,
                 "xoff": int(round((g["ulx"] - ulx) / xdim)),
                 "yoff": int(round((g["uly"] - uly) / ydim)),
                 "xsize": g["ncols"], "ysize": g["nrows"]}
                for b, p, g in placements]}
    if materialize:
        from .raster import read_raster
        px = np.zeros((h, w, len(bands)), np.uint16)
        for s in desc["sources"]:
            tile, *_ = read_raster(s["path"])
            bi = bands.index(s["band"])
            t = np.atleast_2d(tile)
            px[s["yoff"]:s["yoff"] + t.shape[0],
               s["xoff"]:s["xoff"] + t.shape[1], bi] = t
        desc["pixels"] = px
    return desc
