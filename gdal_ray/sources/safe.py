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


# ---------------------------------------------------------------------------
# SENTINEL1_CALIB subdatasets (safedataset.cpp:1492-1700, WV/wave mode
# per-measurement subdatasets; calibrated bands :420-570)
# ---------------------------------------------------------------------------

_CALIBRATIONS = ("SIGMA0", "BETA0", "GAMMA", "UNCALIB")
_CALIB_NODE = {"SIGMA0": "sigmaNought", "BETA0": "betaNought",
               "GAMMA": "gamma"}


def _measurements(manifest_path: str):
    """[(swath, pole, image_number, tiff_path, annotation_path,
    calibration_path)] from the SAFE directory layout."""
    base = os.path.dirname(manifest_path)
    meas_dir = os.path.join(base, "measurement")
    out = []
    for name in sorted(os.listdir(meas_dir)):
        if not name.endswith((".tif", ".tiff")):
            continue
        m = re.match(r"s1[ab]-(\w+?)-(\w+)-(\w\w)-.*-(\d+)\.tiff?$", name)
        if not m:
            continue
        swath, _ptype, pole, img = m.groups()
        ann = os.path.join(base, "annotation",
                           os.path.splitext(name)[0] + ".xml")
        cal = os.path.join(base, "annotation", "calibration",
                           "calibration-" + os.path.splitext(name)[0]
                           + ".xml")
        out.append((swath.upper(), pole.upper(), img,
                    os.path.join(meas_dir, name),
                    ann if os.path.exists(ann) else None,
                    cal if os.path.exists(cal) else None))
    return out


def list_safe_subdatasets(path: str) -> list[str]:
    """SENTINEL1_CALIB subdataset names for a SAFE product — WV (wave)
    mode gets one set per individual measurement ({SWATH}_{POL}_{IMG}),
    SLC products expose SIGMA0/BETA0/GAMMA with INTENSITY plus UNCALIB
    with COMPLEX and INTENSITY (safedataset.cpp:1630-1700)."""
    manifest = path
    if os.path.isdir(path):
        manifest = os.path.join(path, "manifest.safe")
    subds = []
    for swath, pole, img, tif, _ann, _cal in _measurements(manifest):
        is_slc = "-slc-" in os.path.basename(tif)
        is_wave = swath.startswith("WV")
        key = f"{swath}_{pole}_{img}" if is_wave else f"{swath}_{pole}"
        if is_slc:
            for c in _CALIBRATIONS[:3]:
                subds.append(
                    f"SENTINEL1_CALIB:{c}:{manifest}:{key}:INTENSITY")
            subds.append(
                f"SENTINEL1_CALIB:UNCALIB:{manifest}:{key}:COMPLEX")
            subds.append(
                f"SENTINEL1_CALIB:UNCALIB:{manifest}:{key}:INTENSITY")
        else:
            subds.append(
                f"SENTINEL1_CALIB:UNCALIB:{manifest}:{key}:AMPLITUDE")
            for c in _CALIBRATIONS[:3]:
                subds.append(
                    f"SENTINEL1_CALIB:{c}:{manifest}:{key}:INTENSITY")
    return subds


def _read_annotation_gcps(ann_path: str):
    gcps = []
    root = _strip(ET.parse(ann_path).getroot())
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
    return gcps


def read_safe_calib(spec: str):
    """Open a ``SENTINEL1_CALIB:<CALIB>:<manifest>:<unit>:<datakind>``
    subdataset -> (pixels, None, None, meta). Calibrated outputs apply
    the annotation calibration LUT bilinearly (|DN|^2 / A^2 for
    INTENSITY, safedataset.cpp:500-560); UNCALIB returns the
    measurement DNs (amplitude / complex / intensity per the data
    unit)."""
    if not spec.startswith("SENTINEL1_CALIB:"):
        raise ValueError("not a SENTINEL1_CALIB spec")
    rest = spec[len("SENTINEL1_CALIB:"):]
    # rightmost-colon split: <CALIB>:<path...>:<key>:<unit>
    calib, rest = rest.split(":", 1)
    rest, unit = rest.rsplit(":", 1)
    manifest, key = rest.rsplit(":", 1)
    if calib not in _CALIBRATIONS:
        raise ValueError(f"unknown calibration {calib}")
    if unit not in ("AMPLITUDE", "COMPLEX", "INTENSITY"):
        raise ValueError(f"unknown data unit {unit}")
    if os.path.isdir(manifest):
        manifest = os.path.join(manifest, "manifest.safe")

    match = None
    for swath, pole, img, tif, ann, cal in _measurements(manifest):
        is_wave = swath.startswith("WV")
        k = f"{swath}_{pole}_{img}" if is_wave else f"{swath}_{pole}"
        if k == key:
            match = (swath, pole, img, tif, ann, cal)
            break
    if match is None:
        raise ValueError(f"no measurement matching {key}")
    swath, pole, img, tif, ann, cal = match

    from .raster import read_raster
    px, *_ = read_raster(tif)
    dn = np.atleast_2d(px)
    if np.iscomplexobj(dn):
        inten = dn.real.astype(np.float64) ** 2 + \
            dn.imag.astype(np.float64) ** 2
    else:
        inten = dn.astype(np.float64) ** 2

    meta = {"driver": "SAFE", "swath": swath, "pole": pole,
            "image_number": img, "calibration": calib, "unit": unit,
            "crs": "EPSG:4326",
            "gcps": _read_annotation_gcps(ann) if ann else []}

    if calib == "UNCALIB":
        if unit == "COMPLEX":
            out = dn
        elif unit == "AMPLITUDE":
            out = dn if not np.iscomplexobj(dn) else np.sqrt(inten)
        else:
            out = inten.astype(np.float32)
        return out, None, None, meta

    # calibrated: bilinear LUT over (azimuth line, pixel) vectors
    lut = _read_calibration_lut(cal, calib) if cal else None
    if lut is None:
        # degraded/stub calibration annotation: expose intensity DNs
        meta["calibration_lut"] = "absent"
        return inten.astype(np.float32), None, None, meta
    lines, pixels, table = lut
    h, w = dn.shape[:2]
    yi = np.interp(np.arange(h), lines,
                   np.arange(len(lines)).astype(np.float64))
    xi = np.interp(np.arange(w), pixels,
                   np.arange(len(pixels)).astype(np.float64))
    y0 = np.clip(np.floor(yi).astype(int), 0, len(lines) - 2)
    x0 = np.clip(np.floor(xi).astype(int), 0, len(pixels) - 2)
    fy = (yi - y0)[:, None]
    fx = (xi - x0)[None, :]
    a = (table[y0][:, x0] * (1 - fy) * (1 - fx)
         + table[y0][:, x0 + 1] * (1 - fy) * fx
         + table[y0 + 1][:, x0] * fy * (1 - fx)
         + table[y0 + 1][:, x0 + 1] * fy * fx)
    out = (inten / (a * a)).astype(np.float32)
    return out, None, None, meta


def _read_calibration_lut(cal_path: str, calib: str):
    """(line_positions, pixel_positions, table (nlines, npixels)) from
    a calibration annotation, or None when the vectors are absent."""
    try:
        root = _strip(ET.parse(cal_path).getroot())
    except ET.ParseError:
        return None
    node = _CALIB_NODE[calib]
    lines, pixel_ref, rows = [], None, []
    for vec in root.iter("calibrationVector"):
        ln = vec.findtext("line")
        pix = vec.findtext("pixel")
        vals = vec.findtext(node)
        if ln is None or pix is None or vals is None:
            continue
        lines.append(float(ln))
        if pixel_ref is None:
            pixel_ref = [float(v) for v in pix.split()]
        rows.append([float(v) for v in vals.split()])
    if not rows or pixel_ref is None:
        return None
    return (np.asarray(lines), np.asarray(pixel_ref),
            np.asarray(rows, np.float64))


__all__ += ["list_safe_subdatasets", "read_safe_calib"]
