"""PDS4 (NASA planetary archive v4, XML label) reader.

Reference semantics: frmts/pds/pds4dataset.cpp — Product_Observational
label with File_Area_Observational → File/file_name + Array_2D*/
Array_3D* objects (byte offset, Axis_Array elements in
sequence_number order, Last/First Index Fastest, the PDS4 binary
data_type catalog incl. LSB/MSB integer, IEEE754 and Complex types),
Element_Array scaling_factor/value_offset, Special_Constants
missing_constant (decimal or 0x… bit-pattern hex for float/double),
and cart:Cartography georeferencing: Planar/Map_Projection with
per-projection parameter elements, unit-attributed values (deg, m,
km, m/pixel, km/pixel), longitude_direction multiplier,
Geo_Transformation upperleft corner as the GDAL-convention top-left
corner (OSGeo/gdal#735), map_projection_rotation applied as a gt
rotation, and the planetocentric sphere-radius rules.

Golden parity (tests/test_pds4.py): the reference's own
autotest/gdrivers/pds4.py — checksum 4672 + gt + Transverse-Mercator
SRS across the 4 cart schema versions (1700/1B00/1D00/1G00), the
Titan oblique-cylindrical proj string and rotated geotransform, and
both hexadecimal missing-constant fixtures.
"""

from __future__ import annotations

import os
import struct
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["decode_pds4"]

_DTYPES = {
    "SignedByte": "i1", "UnsignedByte": "u1",
    "SignedLSB2": "<i2", "SignedLSB4": "<i4", "SignedLSB8": "<i8",
    "UnsignedLSB2": "<u2", "UnsignedLSB4": "<u4", "UnsignedLSB8": "<u8",
    "SignedMSB2": ">i2", "SignedMSB4": ">i4", "SignedMSB8": ">i8",
    "UnsignedMSB2": ">u2", "UnsignedMSB4": ">u4", "UnsignedMSB8": ">u8",
    "IEEE754LSBSingle": "<f4", "IEEE754LSBDouble": "<f8",
    "IEEE754MSBSingle": ">f4", "IEEE754MSBDouble": ">f8",
    "ComplexLSB8": "<c8", "ComplexLSB16": "<c16",
    "ComplexMSB8": ">c8", "ComplexMSB16": ">c16",
}


def _local(el) -> str:
    return el.tag.rsplit("}", 1)[-1]


def _find(el, name):
    for child in el.iter():
        if _local(child) == name:
            return child
    return None


def _findall(el, name):
    return [c for c in el.iter() if _local(c) == name]


def _text(el, name, default=None):
    c = _find(el, name) if el is not None else None
    return c.text.strip() if c is not None and c.text else default


def _linear(el, name, default=None):
    """Value with a unit attribute: m (default) or km → metres."""
    c = _find(el, name) if el is not None else None
    if c is None or not c.text:
        return default
    v = float(c.text)
    unit = (c.get("unit") or "m").lower()
    if unit.startswith("km"):
        v *= 1000.0
    return v


def _angular(el, name, default=0.0):
    c = _find(el, name) if el is not None else None
    if c is None or not c.text:
        return default
    v = float(c.text)
    if (c.get("unit") or "deg").lower() in ("rad", "radian"):
        v = float(np.degrees(v))
    return v


def _missing_constant(txt: str, code: str) -> float:
    if txt.lower().startswith("0x"):
        raw = bytes.fromhex(txt[2:])
        if code.endswith("f8") or len(raw) == 8:
            return struct.unpack(">d", raw.rjust(8, b"\x00"))[0]
        return float(struct.unpack(">f", raw.rjust(4, b"\x00"))[0])
    return float(txt)


def decode_pds4(path: str):
    """PDS4 .xml label → (pixels (h, w[, bands]), geotransform | None,
    nodata, meta)."""
    root = ET.parse(path).getroot()
    if _local(root) not in ("Product_Observational",):
        raise ValueError("not a PDS4 Product_Observational label")

    fao = _find(root, "File_Area_Observational")
    if fao is None:
        raise ValueError("PDS4 label has no File_Area_Observational")
    fname = _text(fao, "file_name")
    payload = os.path.join(os.path.dirname(path), fname)

    array = None
    for child in list(fao):
        if _local(child).startswith("Array"):
            array = child
            break
    if array is None:
        raise ValueError("PDS4 label has no Array object")

    off = int(float(_text(array, "offset", "0")))
    dtname = _text(array, "data_type")
    if dtname not in _DTYPES:
        raise ValueError(f"PDS4 data_type {dtname} not supported")
    dt = np.dtype(_DTYPES[dtname])

    axes = []
    for ax in _findall(array, "Axis_Array"):
        axes.append((int(_text(ax, "sequence_number", "0")),
                     _text(ax, "axis_name", "").lower(),
                     int(_text(ax, "elements", "0"))))
    axes.sort()
    order = _text(array, "axis_index_order", "Last Index Fastest")
    if order == "First Index Fastest":
        axes = axes[::-1]
    names = [a[1] for a in axes]
    dims = [a[2] for a in axes]

    buf = open(payload, "rb").read()
    count = int(np.prod(dims))
    need = off + count * dt.itemsize
    if need > len(buf):
        buf = buf + b"\x00" * (need - len(buf))
    arr = np.frombuffer(buf, dt, count, off).reshape(dims)

    # normalise to (band, line, sample)
    if "band" in names:
        arr = np.moveaxis(arr, names.index("band"), 0)
        names.insert(0, names.pop(names.index("band")))
    else:
        arr = arr[np.newaxis]
        names = ["band"] + names
    if names[1] == "sample" or (len(names) > 2 and
                                names.index("line") == 2):
        arr = arr.swapaxes(1, 2)
    px = arr[0] if arr.shape[0] == 1 else np.moveaxis(arr, 0, -1)
    px = np.ascontiguousarray(px.astype(dt.newbyteorder("="),
                                        copy=False))

    meta: dict = {"driver": "PDS4"}
    ea = _find(array, "Element_Array")
    sf = _text(ea, "scaling_factor")
    vo = _text(ea, "value_offset")
    if sf:
        meta["scale"] = float(sf)
    if vo:
        meta["offset"] = float(vo)

    nodata = None
    sc = _find(array, "Special_Constants")
    if sc is not None:
        mc = _text(sc, "missing_constant")
        if mc is not None:
            nodata = _missing_constant(mc, _DTYPES[dtname])

    gt, crs = _georef(root)
    if crs:
        meta["crs"] = crs
    target = _text(_find(root, "Target_Identification"), "name")
    if target:
        meta["TARGET_NAME"] = target
    return px, gt, nodata, meta


def _georef(root):
    cart = None
    for el in root.iter():
        if _local(el) == "Cartography":
            cart = el
            break
    if cart is None:
        return None, None

    lon_mult = 1.0
    geod = _find(cart, "Geodetic_Model")
    if geod is not None and (_text(geod, "longitude_direction", "")
                             or "").lower() == "positive west":
        lon_mult = -1.0

    mp = _find(cart, "Map_Projection")
    crs = None
    rotation = 0.0
    if mp is not None:
        name = _text(mp, "map_projection_name", "")
        node = None
        want = name.replace(" ", "_")
        for child in mp.iter():
            if _local(child) in (want, "Orthographic"):
                node = child
                break
        lon0 = _angular(node, "longitude_of_central_meridian") or \
            _angular(node, "straight_vertical_longitude_from_pole")
        lon0 *= lon_mult
        lat0 = _angular(node, "latitude_of_projection_origin")
        sp1 = _angular(node, "standard_parallel_1")
        sp2 = _angular(node, "standard_parallel_2")
        k = float(_text(node, "scale_factor_at_central_meridian",
                        None) or
                  _text(node, "scale_factor_at_projection_origin",
                        None) or 1.0)
        rotation = _angular(node, "map_projection_rotation")

        base = _pds4_proj(name, node, lat0, lon0, sp1, sp2, k,
                          lon_mult)
        if base is not None and geod is not None:
            a = _linear(geod, "semi_major_radius") or \
                _linear(geod, "a_axis_radius")
            c = _linear(geod, "polar_radius") or \
                _linear(geod, "c_axis_radius") or a
            ographic = (_text(geod, "latitude_type", "") or "") \
                .lower() == "planetographic"
            nup = name.upper()
            polar = nup == "POLAR STEREOGRAPHIC" or (
                nup == "STEREOGRAPHIC" and abs(lat0) == 90)
            if polar and not ographic:
                ell = f"+R={c:.10g}"
            elif nup in ("EQUIRECTANGULAR", "ORTHOGRAPHIC",
                         "STEREOGRAPHIC", "SINUSOIDAL",
                         "OBLIQUE CYLINDRICAL") or not ographic:
                ell = f"+R={a:.10g}"
            elif abs(a - c) < 1e-7:
                ell = f"+R={a:.10g}"
            else:
                ell = f"+a={a:.10g} +b={c:.10g}"
            crs = f"{base} {ell} +units=m +no_defs"

    gt = None
    cr = _find(cart, "Coordinate_Representation")
    gtn = _find(cart, "Geo_Transformation")
    if cr is not None and gtn is not None:
        def res(nm):
            c = _find(cr, nm)
            v = float(c.text)
            if (c.get("unit") or "m/pixel").lower().startswith("km"):
                v *= 1000.0
            return v
        xres, yres = res("pixel_resolution_x"), res("pixel_resolution_y")
        ulx = _linear(gtn, "upperleft_corner_x")
        uly = _linear(gtn, "upperleft_corner_y")
        gt = (ulx, xres, 0.0, uly, 0.0, -yres)
        if rotation != 0.0:
            sr = 1.0 if rotation == 90 else float(
                np.sin(np.radians(rotation)))
            cro = 0.0 if rotation == 90 else float(
                np.cos(np.radians(rotation)))
            gt = (cro * gt[0] - sr * gt[3],
                  cro * gt[1] - sr * gt[4],
                  cro * gt[2] - sr * gt[5],
                  sr * gt[0] + cro * gt[3],
                  sr * gt[1] + cro * gt[4],
                  sr * gt[2] + cro * gt[5])
    return gt, crs


def _pds4_proj(name, node, lat0, lon0, sp1, sp2, k, lon_mult):
    n = name.upper()
    if n == "EQUIRECTANGULAR":
        return (f"+proj=eqc +lat_ts={sp1 or lat0:.10g} +lat_0=0 "
                f"+lon_0={lon0:.10g}")
    if n == "MERCATOR":
        return f"+proj=merc +lat_ts={sp1 or lat0:.10g} +lon_0={lon0:.10g}"
    if n in ("ORTHOGRAPHIC", "OROTHOGRAPHIC"):
        return f"+proj=ortho +lat_0={lat0:.10g} +lon_0={lon0:.10g}"
    if n == "SINUSOIDAL":
        return f"+proj=sinu +lon_0={lon0:.10g}"
    if n in ("POLAR STEREOGRAPHIC", "STEREOGRAPHIC"):
        return (f"+proj=stere +lat_0={lat0:.10g} +lon_0={lon0:.10g} "
                f"+k={k:.10g}")
    if n == "TRANSVERSE MERCATOR":
        return (f"+proj=tmerc +lat_0={lat0:.10g} +lon_0={lon0:.10g} "
                f"+k={k:.10g}")
    if n == "LAMBERT CONFORMAL CONIC":
        return (f"+proj=lcc +lat_1={sp1:.10g} +lat_2={sp2:.10g} "
                f"+lat_0={lat0:.10g} +lon_0={lon0:.10g}")
    if n == "LAMBERT AZIMUTHAL EQUAL AREA":
        return f"+proj=laea +lat_0={lat0:.10g} +lon_0={lon0:.10g}"
    if n == "ALBERS CONICAL EQUAL AREA":
        return (f"+proj=aea +lat_1={sp1:.10g} +lat_2={sp2:.10g} "
                f"+lat_0={lat0:.10g} +lon_0={lon0:.10g}")
    if n == "MOLLWEIDE":
        return f"+proj=moll +lon_0={lon0:.10g}"
    if n == "ROBINSON":
        return f"+proj=robin +lon_0={lon0:.10g}"
    if n == "AZIMUTHAL EQUIDISTANT":
        return f"+proj=aeqd +lat_0={lat0:.10g} +lon_0={lon0:.10g}"
    if n == "GNOMONIC":
        return f"+proj=gnom +lat_0={lat0:.10g} +lon_0={lon0:.10g}"
    if n == "OBLIQUE CYLINDRICAL":
        pole_lat = _angular(node, "oblique_proj_pole_latitude")
        pole_lon = _angular(node, "oblique_proj_pole_longitude") * \
            lon_mult
        pole_rot = _angular(node, "oblique_proj_pole_rotation")
        return (f"+proj=ob_tran +o_proj=eqc +o_lon_p={-pole_rot:.10g} "
                f"+o_lat_p={180 - pole_lat:.10g} +lon_0={pole_lon:.10g}")
    return None
