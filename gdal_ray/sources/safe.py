"""Sentinel-1 SAFE product reader — ``manifest.safe`` listing
per-polarization measurement TIFFs, with annotation XML geolocation
grids and calibration LUTs alongside.

Reference frmts/safe/safedataset.cpp: bands follow the manifest's
measurement dataObject order (one per swath/polarization), FOOTPRINT
is rebuilt from the manifest's gml:coordinates lat,lon pairs as
lon-lat WKT closed with ", " + first point, and GCPs come from the
annotation geolocationGridPoint list.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["read_safe"]


def _strip(root):
    for el in root.iter():
        el.tag = el.tag.rsplit("}", 1)[-1]
    return root


def read_safe(manifest_path: str, polarization: str | None = None):
    """-> (pixels (h, w[, nbands]) uint16, None, None, meta with
    'poles', 'FOOTPRINT', 'gcps')."""
    text = open(manifest_path, "r", encoding="utf-8",
                errors="replace").read()
    base = os.path.dirname(manifest_path)
    hrefs = re.findall(r'href="([^"]*?measurement/[^"]*?\.tiff?)"',
                       text)
    if not hrefs:
        hrefs = re.findall(r"(\./measurement/[^\s\"<>]*\.tiff?)", text)
    if not hrefs:
        raise ValueError("SAFE: no measurement TIFFs in manifest")

    from .raster import read_raster
    planes = []
    poles = []
    for href in hrefs:
        name = os.path.basename(href)
        m = re.match(r"s1[ab]-(\w+?)-\w+-(\w\w)-", name)
        pole = m.group(2).upper() if m else ""
        if polarization and pole != polarization.upper():
            continue
        px, *_ = read_raster(os.path.join(base, "measurement", name))
        planes.append(np.atleast_2d(px))
        poles.append(pole)
    if not planes:
        raise ValueError("SAFE: no matching measurement bands")

    meta = {"driver": "SAFE", "poles": poles}
    m = re.search(r"<gml:coordinates>([^<]*)</gml:coordinates>", text)
    if m:
        pts = []
        for pair in m.group(1).split():
            lat, lon = pair.split(",")
            pts.append(f"{lon} {lat}")
        if pts:
            meta["FOOTPRINT"] = ("POLYGON((" + ",".join(pts)
                                 + ", " + pts[0] + "))")

    # GCPs from the first annotation file's geolocation grid
    ann_dir = os.path.join(base, "annotation")
    gcps = []
    if os.path.isdir(ann_dir):
        anns = sorted(f for f in os.listdir(ann_dir)
                      if f.endswith(".xml"))
        if anns:
            root = _strip(ET.parse(os.path.join(ann_dir,
                                                anns[0])).getroot())
            for gp in root.iter("geolocationGridPoint"):
                try:
                    gcps.append({
                        "pixel": float(gp.findtext("pixel")),
                        "line": float(gp.findtext("line")),
                        "x": float(gp.findtext("longitude")),
                        "y": float(gp.findtext("latitude")),
                        "z": float(gp.findtext("height") or 0)})
                except (TypeError, ValueError):
                    continue
    meta["gcps"] = gcps
    meta["crs"] = "EPSG:4326"
    px = planes[0] if len(planes) == 1 else np.stack(planes, axis=-1)
    return px, None, None, meta
