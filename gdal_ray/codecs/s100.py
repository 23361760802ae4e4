"""IHO S-100 family HDF5 product readers over this repo's own HDF5
decoder — S-102 bathymetry (BathymetryCoverage), S-104 water level
(WaterLevel) and S-111 surface currents (SurfaceCurrent).

Reference frmts/hdf5/s102dataset.cpp + s100.cpp: the feature
instance group's gridOriginLongitude/Latitude +
gridSpacingLongitudinal/Latitudinal + numPointsLongitudinal/
Latitudinal describe a node-registered (AREA_OR_POINT=Point) grid —
the geotransform backs off half a cell and rows flip north-up;
values datasets are compounds (depth/uncertainty, height/trend,
speed/direction) exposed as one band per member with NoData 1e6;
root attributes carry issueDate/geographicIdentifier and the S-100
vertical-datum code table.
"""

from __future__ import annotations

import numpy as np

from .hdf5 import Hdf5File

# S-100 part 4a vertical datum codes (subset)
_VDATUM = {
    1: ("meanLowWaterSprings", "MLWS"),
    2: ("meanLowerLowWaterSprings", "MLLWS"),
    3: ("meanSeaLevel", "MSL"),
    4: ("lowestLowWater", "LLW"),
    5: ("meanLowWater", "MLW"),
    6: ("lowestLowWaterSprings", "LLWS"),
    7: ("approximateMeanLowWaterSprings", "AMLWS"),
    8: ("indianSpringLowWater", "ISLW"),
    9: ("lowWaterSprings", "LWS"),
    10: ("approximateLowestAstronomicalTide", "ALAT"),
    11: ("nearlyLowestLowWater", "NLLW"),
    12: ("meanLowerLowWater", "MLLW"),
    13: ("lowWater", "LW"),
    14: ("approximateMeanLowWater", "AMLW"),
    15: ("approximateMeanLowerLowWater", "AMLLW"),
    16: ("meanHighWater", "MHW"),
    17: ("meanHighWaterSprings", "MHWS"),
    18: ("highWater", "HW"),
    19: ("approximateMeanSeaLevel", "AMSL"),
    20: ("highWaterSprings", "HWS"),
    21: ("meanHigherHighWater", "MHHW"),
    22: ("equinoctialSpringLowWater", "ESLW"),
    23: ("lowestAstronomicalTide", "LAT"),
    24: ("localDatum", "LD"),
    25: ("internationalGreatLakesDatum1985", "IGLD85"),
    26: ("meanWaterLevel", "MWL"),
    27: ("lowerLowWaterLargeTide", "LLWLT"),
    28: ("higherHighWaterLargeTide", "HHWLT"),
    29: ("nearlyHighestHighWater", "NHHW"),
    30: ("highestAstronomicalTide", "HAT"),
}
_VDATUM_DEF = {
    12: ("The average height of the lower low waters at a place over "
         "a 19-year period."),
}

_FEATURES = {"S102": "BathymetryCoverage", "S104": "WaterLevel",
             "S111": "SurfaceCurrent"}


def decode_s100(buf: bytes, product: str | None = None):
    """-> (pixels (h, w, nmembers) float32 north-up, gt, nodata,
    meta)."""
    f = Hdf5File(buf)
    objs = f.visit()
    feature = None
    for prod, name in _FEATURES.items():
        if any(p.startswith(f"/{name}/") for p in objs):
            feature = name
            product = prod
            break
    if feature is None:
        raise ValueError("not an S-100 gridded product")

    # first feature instance group with grid attributes
    inst = None
    for p, o in sorted(objs.items()):
        if p.startswith(f"/{feature}/") and \
                "gridOriginLongitude" in getattr(o, "attrs", {}):
            inst = p
            break
    if inst is None:
        raise ValueError(f"{product}: no gridded feature instance")
    at = objs[inst].attrs
    ox = float(at["gridOriginLongitude"])
    oy = float(at["gridOriginLatitude"])
    dx = float(at["gridSpacingLongitudinal"])
    dy = float(at["gridSpacingLatitudinal"])
    nx = int(at["numPointsLongitudinal"])
    ny = int(at["numPointsLatitudinal"])

    values_path = None
    for p in sorted(objs):
        if p.startswith(inst + "/") and p.endswith("/values"):
            values_path = p
            break
    if values_path is None:
        raise ValueError(f"{product}: no values dataset")
    arr = np.asarray(f.read(values_path))
    if arr.dtype.names:
        members = list(arr.dtype.names)
        planes = [arr[m].astype(np.float32) for m in members]
    else:
        members = ["values"]
        planes = [arr.astype(np.float32)]
    px = np.stack([p[::-1] for p in planes], axis=-1)   # north-up

    gt = (ox - dx / 2.0, dx, 0.0,
          oy + (ny - 1) * dy + dy / 2.0, 0.0, -dy)

    root = objs.get("/", None)
    rat = getattr(root, "attrs", {}) if root is not None else {}
    md = {"AREA_OR_POINT": "Point"}
    for key in ("issueDate", "geographicIdentifier", "producer"):
        if key in rat:
            md[key] = str(rat[key])
    vd = rat.get("verticalDatum")
    if isinstance(vd, (int, np.integer)) and int(vd) in _VDATUM:
        name, abbrev = _VDATUM[int(vd)]
        md["VERTICAL_DATUM_NAME"] = name
        md["VERTICAL_DATUM_ABBREV"] = abbrev
        if int(vd) in _VDATUM_DEF:
            md["VERTICAL_DATUM_DEFINITION"] = _VDATUM_DEF[int(vd)]
    epsg = rat.get("horizontalCRS") or rat.get("horizontalDatumValue")
    crs = f"EPSG:{int(epsg)}" if epsg is not None else "EPSG:4326"

    group_at = {}
    parent = values_path.rsplit("/", 1)[0]
    if parent in objs:
        group_at = getattr(objs[parent], "attrs", {})
    meta = {"driver": product, "crs": crs, "bands": members,
            "metadata": md, "group_attrs": dict(group_at),
            "nx": nx, "ny": ny}
    return px, gt, 1e6, meta
