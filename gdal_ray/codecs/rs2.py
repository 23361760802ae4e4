"""RADARSAT-2 product reader — a ``product.xml`` wrapping per-pole
TIFF images with tie-point GCPs, rational-function (RPC) metadata and
per-column calibration lookup tables.

Reference frmts/rs2/rs2dataset.cpp: bands come from
``imageAttributes/fullResolutionImageData`` (one file per pole);
calibration (Beta/Sigma/Gamma Nought) divides by the lut.xml per-column
``gains`` after squaring detected magnitude values and adding the lut
``offset`` ((DN*DN + offset) / gain, rs2dataset.cpp:478-505); complex
products divide both components by the gain; the ``rationalFunctions``
block maps 1:1 onto GDAL RPC metadata keys (GetMetadata('RPC'));
``geolocationGrid/imageTiePoint`` entries become GCPs.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np

_CALIB_NAMES = {"BETA0": "Beta Nought", "SIGMA0": "Sigma Nought",
                "GAMMA": "Gamma"}

_RPC_MAP = [("ERR_BIAS", "biasError"), ("ERR_RAND", "randomError"),
            ("LINE_OFF", "lineOffset"), ("SAMP_OFF", "pixelOffset"),
            ("LAT_OFF", "latitudeOffset"),
            ("LONG_OFF", "longitudeOffset"),
            ("HEIGHT_OFF", "heightOffset"), ("LINE_SCALE", "lineScale"),
            ("SAMP_SCALE", "pixelScale"),
            ("LAT_SCALE", "latitudeScale"),
            ("LONG_SCALE", "longitudeScale"),
            ("HEIGHT_SCALE", "heightScale"),
            ("LINE_NUM_COEFF", "lineNumeratorCoefficients"),
            ("LINE_DEN_COEFF", "lineDenominatorCoefficients"),
            ("SAMP_NUM_COEFF", "pixelNumeratorCoefficients"),
            ("SAMP_DEN_COEFF", "pixelDenominatorCoefficients")]


def _strip_ns(root):
    for el in root.iter():
        el.tag = el.tag.rsplit("}", 1)[-1]
    return root


def decode_rs2(path: str, calibration: str | None = None):
    """-> (pixels (h, w[, poles]), None, None, meta).

    ``calibration``: None (raw DNs) or 'BETA0' / 'SIGMA0' / 'GAMMA'
    applying the matching lookupTable (float32 output).
    """
    root = _strip_ns(ET.parse(path).getroot())
    base = os.path.dirname(path)
    attrs = root.find("imageAttributes")
    if attrs is None:
        raise ValueError("RS2: no imageAttributes in product.xml")
    ra = attrs.find("rasterAttributes")
    data_type = (ra.findtext("dataType") or "").strip()

    lut_file = None
    if calibration is not None:
        want = _CALIB_NAMES.get(calibration.upper())
        if want is None:
            raise ValueError(f"RS2: unknown calibration {calibration!r}")
        for el in attrs.findall("lookupTable"):
            if el.get("incidenceAngleCorrection") == want:
                lut_file = os.path.join(base, (el.text or "").strip())
                break
        if lut_file is None:
            raise ValueError(f"RS2: no LUT for {calibration}")

    poles = []
    planes = []
    from ..sources.raster import read_raster
    for el in attrs.findall("fullResolutionImageData"):
        poles.append(el.get("pole", ""))
        px, *_ = read_raster(os.path.join(base, (el.text or "").strip()))
        planes.append(np.asarray(px))

    if not planes:
        raise ValueError("RS2: no fullResolutionImageData")

    if lut_file is not None:
        lroot = _strip_ns(ET.parse(lut_file).getroot())
        offset = float((lroot.findtext("offset") or "0").strip() or 0)
        gains = np.array([float(v) for v in
                          (lroot.findtext("gains") or "").split()],
                         np.float32)
        out = []
        for p in planes:
            g = gains[:p.shape[1]] if len(gains) >= p.shape[1] else \
                np.resize(gains, p.shape[1])
            if np.iscomplexobj(p):
                out.append((p / g[None, :]).astype(np.complex64))
            else:
                p = p.astype(np.float32)
                out.append((p * p + offset) / g[None, :])
        planes = out

    px = planes[0] if len(planes) == 1 else np.stack(planes, axis=-1)

    gcps = []
    for tp in root.iter("imageTiePoint"):
        ic = tp.find("imageCoordinate")
        gc = tp.find("geodeticCoordinate")
        if ic is None or gc is None:
            continue
        gcps.append({"pixel": float(ic.findtext("pixel") or 0),
                     "line": float(ic.findtext("line") or 0),
                     "x": float(gc.findtext("longitude") or 0),
                     "y": float(gc.findtext("latitude") or 0),
                     "z": float(gc.findtext("height") or 0)})

    rpc = {}
    rf = root.find(".//rationalFunctions")
    if rf is not None:
        for key, tag in _RPC_MAP:
            v = rf.findtext(tag)
            if v is not None:
                rpc[key] = v.strip()

    src = root.find("sourceAttributes")
    meta = {"driver": "RS2", "crs": "EPSG:4326", "poles": poles,
            "dataType": data_type, "gcps": gcps}
    if rpc:
        meta["RPC"] = rpc
    if src is not None:
        for tag, key in (("satellite", "SATELLITE_IDENTIFIER"),
                         ("sensor", "SENSOR_IDENTIFIER"),
                         ("beamModeMnemonic", "BEAM_MODE_MNEMONIC")):
            v = src.findtext(tag)
            if v:
                meta[key] = v.strip()
    return px, None, None, meta
