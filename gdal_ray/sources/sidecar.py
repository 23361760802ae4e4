"""Georeferencing sidecars: ESRI world files and PAM .aux.xml.

Reference semantics:
* world files (gcore/gdal_misc.cpp GDALReadWorldFile /
  GDALLoadWorldFile): six lines ``dx, rot_y, rot_x, dy, center_ulx,
  center_uly`` — pixel-CENTER anchored, so the geotransform origin
  backs off half a pixel of both axis vectors; decimal COMMAS are
  accepted (CPLAtofM locale tolerance — the reference's own
  png/test.wld fixture uses them). Extension search order: the
  format-specific ``.tfw``-style (first+last letter of the image
  extension + 'w'), then ``.wld`` (GDALReadWorldFile's candidates).
* PAM (gcore/gdalpamdataset.cpp): ``<PAMDataset>`` XML carrying
  ``<SRS>``, ``<GeoTransform>``, per-band ``<NoDataValue>``,
  ``<Metadata><MDI key=...>`` items and ``<Histograms>``.

Both let georeferencing ride next to payload formats that cannot
carry it (PNG/JPEG/BMP/GIF tiles in an image corpus — exactly this
engine's input shape).
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

__all__ = ["parse_worldfile", "find_worldfile", "read_worldfile",
           "read_pam", "find_pam"]


def _atof_m(s: str) -> float:
    """CPLAtofM analog: accept ',' as the decimal separator."""
    return float(s.strip().replace(",", "."))


def parse_worldfile(text: str):
    """World-file text → north-up-or-rotated geotransform (6-tuple)."""
    vals = [_atof_m(v) for v in text.split()]
    if len(vals) < 6:
        raise ValueError("world file needs six values")
    l1, l2, l3, l4, l5, l6 = vals[:6]
    # GDALLoadWorldFile: gt1=l1 gt4=l2 gt2=l3 gt5=l4; origin backs off
    # half a pixel of both axis vectors (center → corner)
    gt1, gt4, gt2, gt5 = l1, l2, l3, l4
    gt0 = l5 - 0.5 * gt1 - 0.5 * gt2
    gt3 = l6 - 0.5 * gt4 - 0.5 * gt5
    return (gt0, gt1, gt2, gt3, gt4, gt5)


_WLD_EXTS = ("wld",)


def find_worldfile(image_path: str) -> str | None:
    """Candidate world-file path for an image (format-specific
    first+last+'w' extension, then .wld), if one exists."""
    base, ext = os.path.splitext(image_path)
    ext = ext.lstrip(".")
    cands = []
    if len(ext) >= 2:
        cands.append(f"{base}.{ext[0]}{ext[-1]}w")       # tif→tfw, png→pgw
        cands.append(f"{base}.{ext}w")                   # tifw variant
    cands += [f"{base}.{e}" for e in _WLD_EXTS]
    for c in cands:
        if os.path.exists(c):
            return c
        lc = os.path.splitext(c)[0] + os.path.splitext(c)[1].upper()
        if os.path.exists(lc):
            return lc
    return None


def read_worldfile(image_path: str):
    """Geotransform for an image from its world-file sidecar, or None."""
    p = find_worldfile(image_path)
    if p is None:
        return None
    with open(p) as f:
        return parse_worldfile(f.read())


def find_pam(image_path: str) -> str | None:
    p = image_path + ".aux.xml"
    return p if os.path.exists(p) else None


def read_pam(path: str) -> dict:
    """PAM .aux.xml → {"geotransform": 6-tuple | None, "srs": str |
    None, "bands": {band_no: {"nodata": float | None, "metadata":
    {...}}}, "metadata": {...}} (gdalpamdataset.cpp surface subset)."""
    try:
        root = ET.parse(path).getroot()
    except ET.ParseError:
        # GDAL's minixml tolerates stray <?xml?> declarations embedded
        # mid-document (e.g. inside an xml-format Metadata node in
        # autotest byte.pnm.aux.xml); ElementTree does not — strip any
        # declaration past document start and retry.
        text = open(path, encoding="utf-8", errors="replace").read()
        stripped = re.sub(r"(?<!\A)<\?xml[^>]*\?>", "", text.lstrip())
        root = ET.fromstring(stripped)
    if root.tag != "PAMDataset":
        raise ValueError("not a PAM .aux.xml (no PAMDataset root)")
    out: dict = {"geotransform": None, "srs": None, "bands": {},
                 "metadata": {}}
    srs = root.find("SRS")
    if srs is not None and srs.text:
        out["srs"] = srs.text.strip()
    gt = root.find("GeoTransform")
    if gt is not None and gt.text:
        vals = [float(v) for v in re.split(r"[,\s]+", gt.text.strip())
                if v != ""]
        if len(vals) == 6:
            out["geotransform"] = tuple(vals)
    md = root.find("Metadata")
    if md is not None:
        for mdi in md.findall("MDI"):
            out["metadata"][mdi.get("key", "")] = (mdi.text or "").strip()
    for band in root.findall("PAMRasterBand"):
        bno = int(band.get("band", "1"))
        binfo: dict = {"nodata": None, "metadata": {}}
        nd = band.find("NoDataValue")
        if nd is not None and nd.text:
            binfo["nodata"] = float(nd.text.strip())
        bmd = band.find("Metadata")
        if bmd is not None:
            for mdi in bmd.findall("MDI"):
                binfo["metadata"][mdi.get("key", "")] = \
                    (mdi.text or "").strip()
        out["bands"][bno] = binfo
    return out


def write_worldfile(geotransform, path: str) -> None:
    """Geotransform → six-line world file (GDALWriteWorldFile: axis
    vectors then the CENTER of the top-left pixel)."""
    g = [float(v) for v in geotransform]
    cx = g[0] + 0.5 * g[1] + 0.5 * g[2]
    cy = g[3] + 0.5 * g[4] + 0.5 * g[5]
    with open(path, "w") as f:
        f.write("\n".join(repr(v) for v in
                          (g[1], g[4], g[2], g[5], cx, cy)) + "\n")
