"""SPOT/Pleiades DIMAP (v1 METADATA.DIM, v2 DIM_*/VOL_*.XML) reader.

Reference driver: frmts/dimap/dimapdataset.cpp. Behavior replicated:
- v1: Data_Access DATA_FILE_PATH payload (GeoTIFF) read through the
  raster dispatcher; Dataset_Frame vertices become corner GCPs at
  pixel centers; metadata via the reference's path->prefix
  translation table (Production, Scene_Source, Data_Processing,
  Spectral_Band_Info -> SPECTRAL_*) — dimapdataset.cpp:979-993;
- v2: VOL_*.XML resolves Dataset_Components COMPONENT_PATH ->
  DIM_*.XML; Raster_Dimensions NROWS/NCOLS/NBANDS; Data_Files
  tile_R/tile_C mosaic assembly; the Dim + Strip translation tables,
  the LOCATION_TYPE=Center Located_Geometric_Values block and the
  RPC_*.XML Global_RFM/Inverse_Model coefficients as an "rpc" dict
  (dimapdataset.cpp:1533-1620).

Goldens in tests/test_dimap.py from autotest/gdrivers/dimap.py
(v1 window checksum 21586, PROCESSING_LEVEL 1A,
SPECTRAL_PHYSICAL_BIAS 0.000000, corner GCP; dimap2 single_component
4x20x30, checksum 7024, metadata + RPC parity).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["decode_dimap"]

_V1_TRANSLATION = [
    ("Production", ""),
    ("Production.Facility", "FACILITY_"),
    ("Dataset_Sources.Source_Information.Scene_Source", ""),
    ("Data_Processing", ""),
    ("Image_Interpretation.Spectral_Band_Info", "SPECTRAL_"),
]
_V2_DIM_TRANSLATION = [
    ("Product_Information.Delivery_Identification", "DATASET_"),
    ("Product_Information.Producer_Information", "DATASET_"),
    ("Dataset_Sources.Source_Identification.Strip_Source", ""),
    ("Processing_Information.Production_Facility", "FACILITY_"),
    ("Processing_Information.Product_Settings", ""),
    ("Processing_Information.Product_Settings.Geometric_Settings",
     "GEOMETRIC_"),
    ("Processing_Information.Product_Settings.Radiometric_Settings",
     "RADIOMETRIC_"),
    ("Quality_Assessment.Imaging_Quality_Measurement", "CLOUDCOVER_"),
]
_V2_STRIP_TRANSLATION = [
    ("Catalog.Full_Strip.Notations.Cloud_And_Quality_Notation."
     "Data_Strip_Notation", "CLOUDCOVER_"),
    ("Acquisition_Configuration.Platform_Configuration."
     "Ephemeris_Configuration", "EPHEMERIS_"),
]
_LGV_TRANSLATION = [("SATELLITE_ALTITUDE", ""),
                    ("Acquisition_Angles", ""),
                    ("Solar_Incidences", ""),
                    ("Ground_Sample_Distance", "")]


def _find(root, dotted: str):
    node = root
    for part in dotted.split("."):
        if node is None:
            return None
        node = node.find(part)
    return node


def _set_metadata_from_xml(root, translation, meta: dict):
    """dimapdataset.cpp SetMetadataFromXML: a text parent maps to
    prefix+path; element children with text map to prefix+childname."""
    for path, prefix in translation:
        parent = _find(root, path)
        if parent is None:
            continue
        if parent.text and parent.text.strip() and len(parent) == 0:
            meta[prefix + path] = parent.text.strip()
            continue
        for child in parent:
            if child.text and child.text.strip() and len(child) == 0:
                name = prefix + child.tag
                if len(name) < 128:
                    meta[name] = child.text.strip()


def decode_dimap(path: str):
    from ..sources.raster import read_raster
    if os.path.isdir(path):
        cands = sorted(os.listdir(path))
        pick = None
        for f in cands:
            if f.upper().startswith("VOL_") and f.upper().endswith(".XML"):
                pick = f
                break
        if pick is None:
            for f in cands:
                if f.upper() == "METADATA.DIM" or \
                        (f.upper().startswith("DIM_")
                         and f.upper().endswith(".XML")):
                    pick = f
                    break
        if pick is None:
            raise ValueError("no DIMAP metadata file in directory")
        path = os.path.join(path, pick)
    d = os.path.dirname(path) or "."
    root = ET.parse(path).getroot()

    # VOL file: chase the component — but only when the document is
    # not itself a DIM (i.e. carries no raster section)
    comp = None
    if root.find(".//Raster_Dimensions") is None and \
            root.find(".//Data_Access") is None:
        for el in root.iter():
            if el.tag == "Dataset_Components":
                comp = el
                break
    if comp is not None:
        for cp in comp.iter("COMPONENT_PATH"):
            href = cp.get("href")
            if href:
                path = os.path.join(d, href)
                root = ET.parse(path).getroot()
                d = os.path.dirname(path) or "."
                break

    fmt = root.find("Metadata_Id/METADATA_FORMAT")
    version = "1"
    if fmt is None:
        fmt = root.find("Metadata_Identification/METADATA_FORMAT")
        version = "2" if fmt is not None else "1"
    meta: dict = {"driver": "DIMAP"}

    if version == "1":
        _set_metadata_from_xml(root, _V1_TRANSLATION, meta)
        href = None
        for el in root.iter("DATA_FILE_PATH"):
            href = el.get("href")
            break
        if href is None:
            raise ValueError("DIMAP v1 without DATA_FILE_PATH")
        payload = os.path.join(d, href)
        # the reference opens the payload by content, not extension —
        # the autotest "IMAGERY.TIF" is really a VRT
        head = open(payload, "rb").read(16)
        if head.lstrip().startswith(b"<VRT"):
            from ..sources.vrt import read_vrt
            v = read_vrt(payload)
            px, gt, nodata = v.pixels, v.geotransform, v.nodata
        else:
            px, gt, nodata, _m = read_raster(payload)
        # corner GCPs from Dataset_Frame (FRAME_ROW/COL 1-based)
        gcps = []
        frame = root.find("Dataset_Frame")
        if frame is not None:
            for v in frame.findall("Vertex"):
                lon = float(v.findtext("FRAME_LON"))
                lat = float(v.findtext("FRAME_LAT"))
                row = int(v.findtext("FRAME_ROW"))
                col = int(v.findtext("FRAME_COL"))
                gcps.append({"pixel": col - 0.5, "line": row - 0.5,
                             "x": lon, "y": lat, "z": 0.0})
        if gcps:
            meta["gcps"] = gcps
        crs = root.findtext("Coordinate_Reference_System/Horizontal_CS/"
                            "HORIZONTAL_CS_CODE")
        if crs:
            meta["gcp_crs"] = crs
        return np.asarray(px), gt, nodata, meta

    # ---- DIMAP v2
    _set_metadata_from_xml(root, _V2_DIM_TRANSLATION, meta)
    # strip metadata
    for el in root.iter("Component"):
        title = el.findtext("COMPONENT_TITLE") or ""
        cpath = el.find("COMPONENT_PATH")
        if cpath is not None and "STRIP" in (
                cpath.get("href") or "").upper():
            sp = os.path.join(d, cpath.get("href"))
            if os.path.exists(sp):
                _set_metadata_from_xml(ET.parse(sp).getroot(),
                                       _V2_STRIP_TRANSLATION, meta)
        del title
    else:
        # conventional sibling STRIP_*.XML
        for f in os.listdir(d):
            if f.upper().startswith("STRIP_") and \
                    f.upper().endswith(".XML"):
                _set_metadata_from_xml(
                    ET.parse(os.path.join(d, f)).getroot(),
                    _V2_STRIP_TRANSLATION, meta)
                break
    # center located geometric values
    use_area = _find(root, "Geometric_Data.Use_Area")
    if use_area is not None:
        for lgv in use_area:
            if (lgv.findtext("LOCATION_TYPE") or "").lower() != "center":
                continue
            _set_metadata_from_xml(lgv, _LGV_TRANSLATION, meta)
            break
    # RPC component
    rpc_href = None
    for el in root.iter("COMPONENT_PATH"):
        if "RPC" in (el.get("href") or "").upper():
            rpc_href = el.get("href")
            break
    if rpc_href is None:
        for f in os.listdir(d):
            if f.upper().startswith("RPC_") and f.upper().endswith(".XML"):
                rpc_href = f
                break
    if rpc_href and os.path.exists(os.path.join(d, rpc_href)):
        rroot = ET.parse(os.path.join(d, rpc_href)).getroot()
        inv = None
        for el in rroot.iter("Inverse_Model"):
            inv = el
            break
        rpc = {}
        if inv is not None:
            for child in inv:
                if child.text:
                    rpc[child.tag] = child.text.strip()
        for el in rroot.iter("RFM_Validity"):
            for child in el.iter():
                if child.text and child.text.strip() and len(child) == 0:
                    rpc.setdefault(child.tag, child.text.strip())
        if rpc:
            meta["rpc"] = rpc

    if root.findtext(".//Raster_Dimensions/NROWS") is None:
        raise ValueError("DIMAP v2 document has no Raster_Dimensions "
                         "(metadata-only companion)")
    nrows = int(root.findtext(".//Raster_Dimensions/NROWS"))
    ncols = int(root.findtext(".//Raster_Dimensions/NCOLS"))
    nbands = int(root.findtext(".//Raster_Dimensions/NBANDS"))
    tiles = []
    for df in root.iter("Data_File"):
        r = int(df.get("tile_R", "1"))
        c = int(df.get("tile_C", "1"))
        href = df.find("DATA_FILE_PATH").get("href")
        tiles.append((r, c, os.path.join(d, href)))
    tiles.sort(key=lambda t: (t[0], t[1]))   # keep document
    if not tiles:                            # order within a cell
        raise ValueError("DIMAP v2 without Data_Files")
    # group by (tile_R, tile_C): multiple files in one cell are band
    # groups, not spatial neighbours (full-swath MS-FS products split
    # e.g. RGB + NED across two TIFFs; reference test expects the
    # bands concatenated in document order)
    cells: dict[tuple[int, int], list[str]] = {}
    for r, c, fp in tiles:
        cells.setdefault((r, c), []).append(fp)
    # assemble mosaic
    out = None
    row_off = 0
    for r in sorted({rc[0] for rc in cells}):
        col_off = 0
        row_h = 0
        for (rr, cc) in sorted(k for k in cells if k[0] == r):
            parts = []
            for fp in cells[(rr, cc)]:
                px, _gt, _nd, _m = read_raster(fp)
                px = np.asarray(px)
                if px.ndim == 2:
                    px = px[:, :, None]
                parts.append(px)
            px = parts[0] if len(parts) == 1 \
                else np.concatenate(parts, axis=2)
            if out is None:
                out = np.zeros((nrows, ncols, max(nbands, px.shape[2])),
                               px.dtype)
            h2, w2 = px.shape[:2]
            out[row_off:row_off + h2, col_off:col_off + w2,
                :px.shape[2]] = px
            col_off += w2
            row_h = max(row_h, h2)
        row_off += row_h
    if out.shape[2] == 1:
        out = out[:, :, 0]
    meta["ncols"] = ncols
    meta["nrows"] = nrows
    meta["nbands"] = nbands
    return np.ascontiguousarray(out), None, None, meta
