"""BAG (Bathymetry Attributed Grid, ONS-WG) reader over this repo's
own HDF5 decoder — /BAG_root/elevation + uncertainty (+
nominal_elevation) datasets stored bottom-up, with ISO-19139 XML
georeferencing in /BAG_root/metadata.

Reference frmts/bag/bagdataset.cpp: bands are flipped north-up,
elevation/uncertainty NoData is 1e6 (nominal_elevation reports 0),
and the grid is node-registered — the gml:coordinates corner pair
spans (w-1, h-1) cells, so the geotransform backs off half a cell.
"""

from __future__ import annotations

import re

import numpy as np

from .hdf5 import Hdf5File

_BANDS = [("elevation", 1000000.0), ("uncertainty", 1000000.0),
          ("nominal_elevation", 0.0)]


def decode_bag(buf: bytes):
    """-> (pixels (h, w, nbands) float32 north-up, gt, nodata, meta)."""
    f = Hdf5File(buf)
    names = f.datasets()
    if "/BAG_root/elevation" not in names:
        raise ValueError("not a BAG file (no /BAG_root/elevation)")
    planes = []
    nodatas = []
    band_names = []
    for name, nd in _BANDS:
        key = f"/BAG_root/{name}"
        if key in names:
            arr = np.asarray(f.read(key)).astype(np.float32)
            planes.append(arr[::-1])          # stored bottom-up
            nodatas.append(nd)
            band_names.append(name)
    h, w = planes[0].shape

    gt = None
    crs = None
    if "/BAG_root/metadata" in names:
        raw = f.read("/BAG_root/metadata")
        xml = bytes(bytearray(np.asarray(raw))).decode("utf-8",
                                                       "replace")
        m = re.search(r"<gml:coordinates[^>]*>([^<]*)</gml:coordinates>",
                      xml)
        if m and w > 1 and h > 1:
            pairs = m.group(1).replace(",", " ").split()
            if len(pairs) >= 4:
                x0, y0, x1, y1 = (float(v) for v in pairs[:4])
                resx = (x1 - x0) / (w - 1)
                resy = (y1 - y0) / (h - 1)
                gt = (x0 - resx / 2.0, resx, 0.0,
                      y1 + resy / 2.0, 0.0, -resy)
        me = re.search(r"<identificationCode>[^<]*?(\d{4,5})[^<]*?"
                       r"</identificationCode>", xml)
        ep = re.search(r"epsg[:/]*(\d{4,5})", xml, re.I)
        if ep:
            crs = f"EPSG:{ep.group(1)}"
        elif me:
            crs = f"EPSG:{me.group(1)}"

    px = np.stack(planes, axis=-1)
    meta = {"driver": "BAG", "bands": band_names,
            "nodata_per_band": nodatas}
    if crs:
        meta["crs"] = crs
    return px, gt, nodatas[0], meta
