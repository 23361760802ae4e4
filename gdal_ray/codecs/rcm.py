"""RADARSAT Constellation Mission (RCM) product reader — GRD/SLC
products with ``metadata/product.xml`` + per-polarization GeoTIFFs
under ``imagery/``.

Reference frmts/rcm/rcmdataset.cpp: bands follow the radarParameters
polarizations order (POLARIMETRIC_INTERP band metadata), the raster
grid comes from sceneAttributes/imageAttributes (numLines /
samplesPerLine; the imagery files may be smaller and are zero-padded),
product metadata keys are a fixed mapping onto the XML, calibration
LUT lists are comma-joined per polarization, rationalFunctions maps
onto RPC metadata, and geolocationGrid tie points become WGS84 GCPs.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

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

# (metadata key, xml tag) — rcmdataset.cpp product-level mapping
_MD_MAP = [
    ("ACQUISITION_START_TIME", "rawDataStartTime"),
    ("ACQUISITION_TYPE", "acquisitionType"),
    ("BEAMS", "beams"),
    ("BEAM_MODE", "beamMode"),
    ("BEAM_MODE_DEFINITION_ID", "beamModeDefinitionId"),
    ("BEAM_MODE_MNEMONIC", "beamModeMnemonic"),
    ("DATA_TYPE", "dataType"),
    ("FACILITY_IDENTIFIER", "inputDatasetFacilityId"),
    ("FAR_RANGE_INCIDENCE_ANGLE", "incAngFarRng"),
    ("FIRST_LINE_TIME", "zeroDopplerTimeFirstLine"),
    ("GEODETIC_TERRAIN_HEIGHT", "geodeticTerrainHeight"),
    ("LAST_LINE_TIME", "zeroDopplerTimeLastLine"),
    ("LINE_SPACING", "sampledLineSpacing"),
    ("LINE_TIME_ORDERING", "lineTimeOrdering"),
    ("LUT_APPLIED", "lutApplied"),
    ("NEAR_RANGE_INCIDENCE_ANGLE", "incAngNearRng"),
    ("ORBIT_DATA_FILE", "orbitDataFileName"),
    ("ORBIT_DATA_SOURCE", "orbitDataSource"),
    ("ORBIT_DIRECTION", "passDirection"),
    ("PER_POLARIZATION_SCALING", "perPolarizationScaling"),
    ("PIXEL_SPACING", "sampledPixelSpacing"),
    ("PIXEL_TIME_ORDERING", "pixelTimeOrdering"),
    ("POLARIZATIONS", "polarizations"),
    ("POLARIZATION_DATA_MODE", "polarizationDataMode"),
    ("PROCESSING_FACILITY", "processingFacility"),
    ("PROCESSING_TIME", "processingTime"),
    ("PRODUCT_ID", "productId"),
    ("PRODUCT_TYPE", "productType"),
    ("SAMPLED_LINE_SPACING_TIME", "sampledLineSpacingTime"),
    ("SAMPLED_PIXEL_SPACING_TIME", "sampledPixelSpacingTime"),
    ("SAMPLE_TYPE", "sampleType"),
    ("SATELLITE_HEIGHT", "satelliteHeight"),
    ("SATELLITE_IDENTIFIER", "satellite"),
    ("SECURITY_CLASSIFICATION", "securityClassification"),
    ("SENSOR_IDENTIFIER", "sensor"),
    ("SLANT_RANGE_FAR_EDGE", "slantRangeFarEdge"),
    ("SLANT_RANGE_NEAR_EDGE", "slantRangeNearEdge"),
]

_LUT_KEYS = [("BETA_NOUGHT_LUT", "Beta Nought"),
             ("SIGMA_NOUGHT_LUT", "Sigma Nought"),
             ("GAMMA_LUT", "Gamma")]


def _strip(root):
    for el in root.iter():
        el.tag = el.tag.rsplit("}", 1)[-1]
    return root


def _find_product_xml(path: str) -> str:
    if os.path.isdir(path):
        for cand in (os.path.join(path, "metadata", "product.xml"),
                     os.path.join(path, "product.xml")):
            if os.path.exists(cand):
                return cand
        raise ValueError("RCM: no product.xml under directory")
    return path


def decode_rcm(path: str, materialize: bool = True):
    """-> (pixels (h, w, npoles) uint16 zero-padded to the declared
    grid, None, None, meta)."""
    xml_path = _find_product_xml(path)
    base = os.path.dirname(xml_path)
    root = _strip(ET.parse(xml_path).getroot())

    poles = (root.findtext(".//radarParameters/polarizations")
             or "").split()
    img_attrs = root.find(".//sceneAttributes/imageAttributes")
    if img_attrs is None:
        raise ValueError("RCM: no sceneAttributes/imageAttributes")
    h = int(img_attrs.findtext("numLines"))
    w = int(img_attrs.findtext("samplesPerLine"))
    ipdf = {el.get("pole"): (el.text or "").strip()
            for el in img_attrs.findall("ipdf")}
    bits = int(root.findtext(".//rasterAttributes/bitsPerSample")
               or "16")
    dtype = np.uint16 if bits == 16 else np.uint8

    md = {}
    for key, tag in _MD_MAP:
        v = root.findtext(f".//{tag}")
        if v is not None:
            md[key] = v.strip()
    md["BITS_PER_SAMPLE"] = str(bits)
    for key, caltype in _LUT_KEYS:
        files = []
        for el in root.findall(".//lookupTableFileName"):
            if el.get("sarCalibrationType") == caltype:
                files.append((el.get("pole", ""),
                              os.path.join(base, "calibration",
                                           (el.text or "").strip())))
        if files:
            md[key] = ",".join(p for _, p in sorted(files))

    rpc = {}
    rf = root.find(".//rationalFunctions")
    if rf is not None:
        for key, tag in _RPC_MAP:
            v = rf.findtext(tag)
            if v is not None:
                rpc[key] = v.strip()

    gcps = []
    for tp in root.iter("imageTiePoint"):
        ic, gc = tp.find("imageCoordinate"), tp.find("geodeticCoordinate")
        if ic is None or gc is None:
            continue
        gcps.append({"pixel": float(ic.findtext("pixel") or 0),
                     "line": float(ic.findtext("line") or 0),
                     "x": float(gc.findtext("longitude") or 0),
                     "y": float(gc.findtext("latitude") or 0),
                     "z": float(gc.findtext("height") or 0)})

    meta = {"driver": "RCM", "crs": "EPSG:4326", "poles": poles,
            "width": w, "height": h, "metadata": md, "gcps": gcps}
    if rpc:
        meta["RPC"] = rpc

    px = None
    if materialize:
        from ..sources.raster import read_raster
        px = np.zeros((h, w, len(poles)), dtype)
        for bi, pole in enumerate(poles):
            rel = ipdf.get(pole)
            if not rel:
                continue
            tif = os.path.normpath(os.path.join(base, rel))
            if not os.path.exists(tif):
                continue
            tile, *_ = read_raster(tif)
            t = np.atleast_2d(np.asarray(tile))
            if t.ndim == 3:
                t = t[:, :, 0]
            px[:t.shape[0], :t.shape[1], bi] = \
                t[:min(h, t.shape[0]), :min(w, t.shape[1])]
    return px, None, None, meta
