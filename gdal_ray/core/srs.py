"""General CRS construction — WKT1/ESRI-WKT/WKT2 and proj-string import
feeding the engine's projection kernels.

The reference resolves any CRS through ogr/ogrspatialreference.cpp
(importFromWkt / importFromProj4 / importFromEPSG, 13,499 LoC) backed by
PROJ's parameter database. This module is the Ray engine's equivalent
entry point WITHOUT a database: the projection method + parameters parse
straight out of the WKT/proj string into the existing kernels —

  Transverse Mercator / any UTM zone   core/tmerc.py::Kruger
  Lambert Conformal Conic (1SP/2SP)    core/conic.py::LambertConformal
  Albers Equal Area                    core/conic.py::AlbersEqualArea
  Polar Stereographic (variant A/B)    core/conic.py::PolarStereographic
  Mercator (1SP/2SP, ellipsoidal)      here (isometric-latitude form)
  Popular Visualisation Pseudo Merc    here (spherical, EPSG 1024)
  geographic (longlat)                 identity

with any ellipsoid (a, 1/f) and linear unit, plus TOWGS84 3/7-parameter
Helmert datum shifts (position-vector convention, EPSG 9606) so CRS on
non-WGS84 datums (OSGB36, NAD27, ED50) compose through the engine's
EPSG:4326 hub. Datum-grid (NADCON/NTv2) accuracy is out of scope — the
same ~meter tier GDAL reaches without grid files.

Golden parity: Snyder (USGS PP 1395) worked examples for tmerc/LCC/
Albers/polar on Clarke 1866 & International ellipsoids, the Ordnance
Survey's published British National Grid worked example (Airy 1830),
and reference .prj fixtures (autotest/osr/data, autotest/ogr/data/shp)
— tests/test_srs.py.
"""

from __future__ import annotations

import math
import re

import numpy as np

from .conic import AlbersEqualArea, LambertConformal, PolarStereographic
from .tmerc import Kruger

# ---------------------------------------------------------------------------
# ellipsoids (public EPSG/PROJ definitions: a, 1/f)
# ---------------------------------------------------------------------------

ELLIPSOIDS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "airy": (6377563.396, 299.3249646),
    "clrk66": (6378206.4, 294.9786982139),
    "clrk80ign": (6378249.2, 293.4660212936),
    "intl": (6378388.0, 297.0),
    "krass": (6378245.0, 298.3),
    "bessel": (6377397.155, 299.1528128),
    "GRS67": (6378160.0, 298.247167427),
    "sphere": (6370997.0, 0.0),
}

# name variants seen in WKT SPHEROID/ELLIPSOID nodes → canonical key
_ELLPS_ALIASES = {
    "wgs84": "WGS84", "wgs1984": "WGS84", "wgs_1984": "WGS84",
    "grs1980": "GRS80", "grs_1980": "GRS80", "grs80": "GRS80",
    "airy1830": "airy", "airy_1830": "airy",
    "clarke1866": "clrk66", "clarke_1866": "clrk66",
    "clarke1880ign": "clrk80ign",
    "international1924": "intl", "international_1924": "intl",
    "krassowsky1940": "krass", "bessel1841": "bessel",
}


# ---------------------------------------------------------------------------
# WKT tree parser (WKT1, ESRI WKT1, WKT2: NODE[arg, NODE[...], "str"])
# ---------------------------------------------------------------------------

class _Node:
    __slots__ = ("name", "args")

    def __init__(self, name, args):
        self.name = name
        self.args = args

    def find(self, *names):
        """First descendant node with one of the (upper-case) names."""
        want = {n.upper() for n in names}
        stack = [self]
        while stack:
            nd = stack.pop(0)
            for a in nd.args:
                if isinstance(a, _Node):
                    if a.name.upper() in want:
                        return a
                    stack.append(a)
        return None

    def find_all(self, *names):
        want = {n.upper() for n in names}
        out, stack = [], [self]
        while stack:
            nd = stack.pop(0)
            for a in nd.args:
                if isinstance(a, _Node):
                    if a.name.upper() in want:
                        out.append(a)
                    stack.append(a)
        return out


_TOK = re.compile(r'''("(?:[^"]|"")*")|([A-Za-z_][A-Za-z0-9_ ().-]*)|'''
                  r'''([-+]?[0-9][0-9eE+.-]*)|([\[\](),])''')


def parse_wkt_tree(s: str) -> _Node:
    """CRS WKT (any flavor) → node tree. Handles quoted strings with
    doubled-quote escapes, bare identifiers (WKT2 `Cartesian`, `east`),
    numbers, and both [] and () brackets."""
    pos = 0
    n = len(s)

    def skip_ws(p):
        while p < n and s[p] in " \t\r\n":
            p += 1
        return p

    def parse_value(p):
        p = skip_ws(p)
        if p >= n:
            raise ValueError("unexpected end of WKT")
        if s[p] == '"':
            q = p + 1
            buf = []
            while q < n:
                if s[q] == '"':
                    if q + 1 < n and s[q + 1] == '"':
                        buf.append('"')
                        q += 2
                        continue
                    break
                buf.append(s[q])
                q += 1
            return "".join(buf), q + 1
        m = re.match(r"[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)?", s[p:])
        if m and not re.match(r"[A-Za-z_]", s[p]):
            return float(m.group(0)), p + m.end()
        m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", s[p:])
        if not m:
            raise ValueError(f"bad WKT at {p}: {s[p:p+20]!r}")
        name = m.group(0)
        q = skip_ws(p + m.end())
        if q < n and s[q] in "[(":
            args, q = parse_args(q + 1, "]" if s[q] == "[" else ")")
            return _Node(name, args), q
        return name, p + m.end()

    def parse_args(p, closer):
        args = []
        while True:
            v, p = parse_value(p)
            args.append(v)
            p = skip_ws(p)
            if p < n and s[p] == ",":
                p += 1
                continue
            if p < n and s[p] == closer:
                return args, p + 1
            raise ValueError(f"bad WKT near {p}: {s[p:p+20]!r}")

    v, _ = parse_value(0)
    if not isinstance(v, _Node):
        raise ValueError("WKT has no root node")
    return v


# ---------------------------------------------------------------------------
# parameter extraction → canonical proj-style dict
# ---------------------------------------------------------------------------

# projection method name variants → canonical kind
_METHODS = {
    "transverse_mercator": "tmerc", "transverse mercator": "tmerc",
    "gauss_kruger": "tmerc", "gauss-kruger": "tmerc",
    # EPSG method 9808 (South African Lo grids): axes are
    # westing/southing — same kernel, both outputs negated
    "transverse_mercator_south_orientated": "tmerc_south",
    "transverse mercator (south orientated)": "tmerc_south",
    "lambert_conformal_conic": "lcc",
    "lambert_conformal_conic_2sp": "lcc",
    "lambert conic conformal (2sp)": "lcc",
    "lambert_conformal_conic_1sp": "lcc",
    "lambert conic conformal (1sp)": "lcc",
    "albers_conic_equal_area": "aea", "albers": "aea",
    "albers equal area": "aea",
    "polar_stereographic": "stere_polar",
    "polar stereographic (variant a)": "stere_polar",
    "polar stereographic (variant b)": "stere_polar",
    "mercator_1sp": "merc", "mercator (variant a)": "merc",
    "mercator_2sp": "merc", "mercator (variant b)": "merc",
    "mercator": "merc",
    "mercator_auxiliary_sphere": "webmerc",
    "popular visualisation pseudo mercator": "webmerc",
    "popular_visualisation_pseudo_mercator": "webmerc",
    "sinusoidal": "sinu",
    "equirectangular": "eqc", "equidistant_cylindrical": "eqc",
    "equidistant cylindrical": "eqc",
    "equidistant cylindrical (spherical)": "eqc",
    "plate_carree": "eqc",
    # general Hotine OM: 9812 (variant A, natural origin) and 9815
    # (variant B, centre origin). Swiss-specific method names keep the
    # somerc double-projection kernel (identical results for the
    # alpha=90 Swiss case, swisstopo's published formulation).
    "hotine_oblique_mercator": "omerc",
    "hotine oblique mercator (variant a)": "omerc",
    "hotine_oblique_mercator_azimuth_center": "omerc_b",
    "hotine oblique mercator (variant b)": "omerc_b",
    "oblique_mercator": "omerc_b",
    "rectified_skew_orthomorphic_natural_origin": "omerc",
    "rectified_skew_orthomorphic_center": "omerc_b",
    "swiss_oblique_cylindrical": "somerc",
    "swiss oblique mercator": "somerc",
}

# PARAMETER name variants → canonical key
_PARAMS = {
    "central_meridian": "lon_0", "longitude of natural origin": "lon_0",
    "longitude_of_center": "lon_0", "longitude of origin": "lon_0",
    "longitude_of_origin": "lon_0", "longitude of false origin": "lon_0",
    "latitude_of_origin": "lat_0", "latitude of natural origin": "lat_0",
    "latitude_of_center": "lat_0", "latitude of false origin": "lat_0",
    "standard_parallel_1": "lat_1",
    "latitude of 1st standard parallel": "lat_1",
    "standard_parallel_2": "lat_2",
    "latitude of 2nd standard parallel": "lat_2",
    "standard_parallel": "lat_1",
    "latitude of standard parallel": "lat_ts",
    "scale_factor": "k_0", "scale factor at natural origin": "k_0",
    "scale factor": "k_0",
    "false_easting": "x_0", "false easting": "x_0",
    "easting at false origin": "x_0",
    "false_northing": "y_0", "false northing": "y_0",
    "northing at false origin": "y_0",
    "easting at projection centre": "x_0",
    "northing at projection centre": "y_0",
    "latitude of projection centre": "lat_0",
    "longitude of projection centre": "lon_0",
    "azimuth": "alpha", "azimuth of initial line": "alpha",
    "azimuth at projection centre": "alpha",
    "rectified_grid_angle": "gamma",
    "angle from rectified to skew grid": "gamma",
    "scale factor on initial line": "k_0",
    "scale factor at projection centre": "k_0",
}


def _norm(s: str) -> str:
    return s.strip().lower()


def params_from_wkt(wkt: str) -> dict:
    """CRS WKT string → canonical parameter dict:
    {kind, lon_0, lat_0, lat_1, lat_2, lat_ts, k_0, x_0, y_0,
     a, rf, towgs84, to_meter, name, geographic}."""
    root = parse_wkt_tree(wkt)
    rname = root.name.upper()
    out: dict = {"name": root.args[0] if root.args
                 and isinstance(root.args[0], str) else "",
                 "geographic": False}

    ell = root.find("SPHEROID", "ELLIPSOID")
    if ell is None:
        raise ValueError("WKT has no SPHEROID/ELLIPSOID")
    out["a"] = float(ell.args[1])
    out["rf"] = float(ell.args[2])

    tw = root.find("TOWGS84")
    if tw is not None:
        v = [float(x) for x in tw.args]
        if any(v):
            out["towgs84"] = (v + [0.0] * 7)[:7]

    if rname in ("GEOGCS", "GEOGCRS", "GEOGRAPHICCRS"):
        out["geographic"] = True
        out["kind"] = "longlat"
        return out
    if rname not in ("PROJCS", "PROJCRS", "PROJECTEDCRS", "BASEPROJCRS"):
        raise ValueError(f"unsupported WKT root {root.name!r}")

    # method: WKT1 PROJECTION["name"]; WKT2 CONVERSION > METHOD["name"]
    meth = root.find("PROJECTION")
    if meth is not None:
        mname = _norm(str(meth.args[0]))
    else:
        m2 = root.find("METHOD")
        if m2 is None:
            raise ValueError("WKT has no PROJECTION/METHOD")
        mname = _norm(str(m2.args[0]))
    kind = _METHODS.get(mname)
    if kind is None:
        raise ValueError(f"unsupported projection method {mname!r}")
    out["kind"] = kind

    conv = root.find("CONVERSION") or root
    param_units = {}
    for p in conv.find_all("PARAMETER"):
        key = _PARAMS.get(_norm(str(p.args[0])))
        if key is not None:
            out[key] = float(p.args[1])
            lu = p.find("LENGTHUNIT")          # WKT2 per-parameter unit
            if lu is not None:
                param_units[key] = float(lu.args[1])

    # linear unit: WKT1 — the UNIT that is a DIRECT child of PROJCS
    # (the GEOGCS child holds the angular unit); WKT2 — any LENGTHUNIT
    # under CS/AXIS (all axes share it for our 2D cases)
    to_m = 1.0
    for a in root.args:
        if isinstance(a, _Node) and a.name.upper() == "UNIT":
            to_m = float(a.args[1])
    lu = None
    for ax in root.find_all("AXIS"):
        lu = ax.find("LENGTHUNIT") or lu
    if lu is None:
        cs = root.find("CS")
        if cs is not None:
            lu = root.find("LENGTHUNIT")
    if lu is not None:
        to_m = float(lu.args[1])
    out["to_meter"] = to_m
    # false easting/northing are expressed in a linear unit: the
    # parameter's own LENGTHUNIT (WKT2) or the PROJCS unit (WKT1/ESRI)
    # — the kernels want meters
    for key in ("x_0", "y_0"):
        if key in out:
            out[key] *= param_units.get(key, to_m)
    return out


# ---------------------------------------------------------------------------
# proj-string parser
# ---------------------------------------------------------------------------

def params_from_proj(proj: str) -> dict:
    """'+proj=... +lat_0=...' → the same canonical dict as
    :func:`params_from_wkt` (ogrspatialreference.cpp importFromProj4
    subset: tmerc/utm/lcc/aea/stere/merc/webmerc/longlat)."""
    kv: dict = {}
    flags = set()
    for tok in proj.split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            kv[k] = v
        elif tok:
            flags.add(tok)

    out: dict = {"name": proj.strip(), "geographic": False}
    p = kv.get("proj")
    if p is None:
        raise ValueError("proj string has no +proj=")

    if "ellps" in kv:
        key = kv["ellps"]
        if key not in ELLIPSOIDS:
            key = _ELLPS_ALIASES.get(_norm(key).replace(" ", ""), key)
        if key not in ELLIPSOIDS:
            raise ValueError(f"unknown ellipsoid {kv['ellps']!r}")
        out["a"], out["rf"] = ELLIPSOIDS[key]
    if "a" in kv:
        out["a"] = float(kv["a"])
        out["rf"] = float(kv["rf"]) if "rf" in kv else 0.0
    if "R" in kv:
        out["a"] = float(kv["R"])
        out["rf"] = 0.0
    if "datum" in kv:
        d = kv["datum"]
        if d in ("WGS84",):
            out["a"], out["rf"] = ELLIPSOIDS["WGS84"]
        elif d in ("NAD83",):
            out["a"], out["rf"] = ELLIPSOIDS["GRS80"]
        elif d == "NAD27":
            out["a"], out["rf"] = ELLIPSOIDS["clrk66"]
            # CONUS mean 3-param shift (grid-free tier)
            out["towgs84"] = [-8.0, 160.0, 176.0, 0, 0, 0, 0]
        elif d == "OSGB36":
            out["a"], out["rf"] = ELLIPSOIDS["airy"]
            out["towgs84"] = [446.448, -125.157, 542.06,
                              0.15, 0.247, 0.842, -20.489]
        else:
            raise ValueError(f"unknown datum {d!r}")
    out.setdefault("a", ELLIPSOIDS["WGS84"][0])
    out.setdefault("rf", ELLIPSOIDS["WGS84"][1])

    if "towgs84" in kv:
        v = [float(x) for x in kv["towgs84"].split(",")]
        if any(v):
            out["towgs84"] = (v + [0.0] * 7)[:7]

    if kv.get("nadgrids") not in (None, "@null", "null"):
        # NTv2 .gsb path; PROJ comma lists try grids in order — take
        # the first non-null entry (single-grid support)
        g = [s for s in kv["nadgrids"].split(",")
             if s not in ("@null", "null")]
        if g:
            out["nadgrids"] = g[0].lstrip("@")

    for k_src, k_dst in (("lon_0", "lon_0"), ("lat_0", "lat_0"),
                         ("lat_1", "lat_1"), ("lat_2", "lat_2"),
                         ("lat_ts", "lat_ts"), ("k", "k_0"),
                         ("k_0", "k_0"), ("x_0", "x_0"), ("y_0", "y_0"),
                         ("lonc", "lon_0"), ("alpha", "alpha"),
                         ("gamma", "gamma")):
        if k_src in kv:
            out[k_dst] = float(kv[k_src])

    if "to_meter" in kv:
        out["to_meter"] = float(kv["to_meter"])
    elif kv.get("units") == "us-ft":
        out["to_meter"] = 1200.0 / 3937.0
    elif kv.get("units") == "ft":
        out["to_meter"] = 0.3048
    else:
        out["to_meter"] = 1.0

    if p == "longlat":
        out["kind"] = "longlat"
        out["geographic"] = True
    elif p == "utm":
        zone = int(kv["zone"])
        out["kind"] = "tmerc"
        out["lon_0"] = (zone - 1) * 6.0 - 180.0 + 3.0
        out["k_0"] = 0.9996
        out["x_0"] = 500000.0
        out["y_0"] = 10000000.0 if "south" in flags else 0.0
    elif p == "tmerc":
        out["kind"] = "tmerc_south" if kv.get("axis") == "wsu" \
            else "tmerc"
    elif p == "omerc":
        # PROJ: variant B (centre origin) unless +no_uoff/+no_off
        out["kind"] = "omerc" if ("no_uoff" in flags
                                  or "no_off" in flags) else "omerc_b"
    elif p == "somerc":
        out["kind"] = "somerc"
    elif p == "lcc":
        out["kind"] = "lcc"
    elif p == "aea":
        out["kind"] = "aea"
    elif p == "stere":
        lat0 = out.get("lat_0", 0.0)
        if abs(lat0) != 90.0:
            raise ValueError("only polar +proj=stere is supported")
        out["kind"] = "stere_polar"
    elif p == "merc":
        out["kind"] = "merc"
    elif p == "webmerc":
        out["kind"] = "webmerc"
    elif p == "sinu":
        out["kind"] = "sinu"
    elif p == "eqc":
        out["kind"] = "eqc"
    else:
        raise ValueError(f"unsupported +proj={p!r}")
    return out


# ---------------------------------------------------------------------------
# Mercator kernels (ellipsoidal 1SP/2SP + spherical pseudo-Mercator)
# ---------------------------------------------------------------------------

class Mercator:
    """Ellipsoidal Mercator via the isometric latitude
    ψ = atanh(sin φ) − e·atanh(e·sin φ) (Snyder 7-7/7-8). 2SP sets
    k0 = m(lat_ts) (EPSG 9805)."""

    def __init__(self, lon0, k0, fe, fn, a, f, lat_ts=None):
        self.e = float(np.sqrt(f * (2.0 - f)))
        if lat_ts is not None:
            s = np.sin(np.radians(lat_ts))
            k0 = float(np.cos(np.radians(lat_ts))
                       / np.sqrt(1.0 - self.e**2 * s * s))
        self.ak = a * k0
        self.lon0, self.fe, self.fn = lon0, fe, fn

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        phi = np.radians(np.asarray(lat, np.float64))
        s = np.sin(phi)
        psi = np.arctanh(s) - self.e * np.arctanh(self.e * s)
        x = self.fe + self.ak * np.radians(lon - self.lon0)
        y = self.fn + self.ak * psi
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        lon = self.lon0 + np.degrees((x - self.fe) / self.ak)
        psi = (y - self.fn) / self.ak
        s = np.tanh(psi)
        for _ in range(8):
            s = np.tanh(psi + self.e * np.arctanh(self.e * s))
        return lon, np.degrees(np.arcsin(np.clip(s, -1.0, 1.0)))


class WebMercator:
    """Popular Visualisation Pseudo Mercator (EPSG method 1024):
    spherical formulas on the ellipsoid's semi-major axis."""

    def __init__(self, lon0, fe, fn, a):
        self.a, self.lon0, self.fe, self.fn = a, lon0, fe, fn

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        x = self.fe + self.a * np.radians(lon - self.lon0)
        y = self.fn + self.a * np.log(np.tan(np.pi / 4.0
                                             + np.radians(lat) / 2.0))
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        lon = self.lon0 + np.degrees((x - self.fe) / self.a)
        lat = np.degrees(2.0 * np.arctan(np.exp((y - self.fn) / self.a))
                         - np.pi / 2.0)
        return lon, lat


class SwissObliqueMercator:
    """Swiss Oblique Mercator (EPSG 9815 variant used by CH1903 /
    LV03, proj +somerc): swisstopo's published double-projection —
    ellipsoid → conformal sphere → oblique equator rotation →
    Mercator ("Formulas and constants for the calculation of the
    Swiss conformal cylindrical projection", swisstopo 2016)."""

    def __init__(self, lat0, lon0, k0, fe, fn, a, f):
        e2 = f * (2.0 - f)
        self.e = math.sqrt(e2)
        p0 = math.radians(lat0)
        self.lam0 = math.radians(lon0)
        self.R = a * math.sqrt(1.0 - e2) / (1.0 - e2 * math.sin(p0) ** 2)
        self.R *= k0
        self.alpha = math.sqrt(
            1.0 + e2 / (1.0 - e2) * math.cos(p0) ** 4)
        self.b0 = math.asin(math.sin(p0) / self.alpha)
        s0 = math.sin(p0)
        self.K = (math.log(math.tan(math.pi / 4 + self.b0 / 2))
                  - self.alpha * math.log(math.tan(math.pi / 4 + p0 / 2))
                  + self.alpha * self.e / 2 * math.log(
                      (1 + self.e * s0) / (1 - self.e * s0)))
        self.fe, self.fn = fe, fn

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        phi = np.radians(lat)
        s = np.sin(phi)
        S = (self.alpha * np.log(np.tan(np.pi / 4 + phi / 2))
             - self.alpha * self.e / 2 * np.log(
                 (1 + self.e * s) / (1 - self.e * s)) + self.K)
        b = 2.0 * (np.arctan(np.exp(S)) - np.pi / 4)
        ell = self.alpha * (np.radians(lon) - self.lam0)
        bbar = np.arcsin(np.cos(self.b0) * np.sin(b)
                         - np.sin(self.b0) * np.cos(b) * np.cos(ell))
        lbar = np.arctan2(np.sin(ell) * np.cos(b),
                          np.cos(self.b0) * np.cos(b) * np.cos(ell)
                          + np.sin(self.b0) * np.sin(b))
        E = self.fe + self.R * lbar
        N = self.fn + self.R / 2.0 * np.log(
            (1 + np.sin(bbar)) / (1 - np.sin(bbar)))
        return E, N

    def inverse(self, x, y):
        lbar = (np.asarray(x, np.float64) - self.fe) / self.R
        bbar = 2.0 * (np.arctan(np.exp(
            (np.asarray(y, np.float64) - self.fn) / self.R)) - np.pi / 4)
        b = np.arcsin(np.cos(self.b0) * np.sin(bbar)
                      + np.sin(self.b0) * np.cos(bbar) * np.cos(lbar))
        ell = np.arctan2(np.sin(lbar) * np.cos(bbar),
                         np.cos(self.b0) * np.cos(bbar) * np.cos(lbar)
                         - np.sin(self.b0) * np.sin(bbar))
        lon = np.degrees(self.lam0 + ell / self.alpha)
        # invert the conformal-sphere latitude by fixed-point iteration
        S = np.log(np.tan(np.pi / 4 + b / 2))
        phi = b.copy()
        for _ in range(12):
            s = np.sin(phi)
            phi = 2.0 * np.arctan(np.exp(
                (S - self.K) / self.alpha
                + self.e / 2 * np.log((1 + self.e * s)
                                      / (1 - self.e * s)))) - np.pi / 2
        return lon, np.degrees(phi)


class HotineObliqueMercator:
    """Hotine Oblique Mercator, EPSG methods 9812 (variant A, FE/FN
    at the projection's natural origin — WKT1 Hotine_Oblique_Mercator,
    proj +omerc +no_uoff) and 9815 (variant B, FE/FN at the centre —
    Hotine_Oblique_Mercator_Azimuth_Center). EPSG Guidance Note 7-2
    §3.2.6 / Snyder PP1395 ch. 9 ellipsoidal formulas (Malaysia RSO,
    Alaska zone 1, Swiss fallback)."""

    def __init__(self, lat_c, lon_c, azimuth, gamma_c, k0, fe, fn,
                 a, f, variant_b: bool):
        e2 = f * (2.0 - f)
        e = math.sqrt(e2)
        self.e = e
        phi_c = math.radians(lat_c)
        lam_c = math.radians(lon_c)
        alpha_c = math.radians(azimuth)
        self.gam_c = math.radians(gamma_c)
        sp = math.sin(phi_c)
        cp = math.cos(phi_c)
        self.B = math.sqrt(1.0 + e2 * cp ** 4 / (1.0 - e2))
        self.A = (a * self.B * k0 * math.sqrt(1.0 - e2)
                  / (1.0 - e2 * sp * sp))
        t0 = (math.tan(math.pi / 4 - phi_c / 2)
              / ((1.0 - e * sp) / (1.0 + e * sp)) ** (e / 2.0))
        D = (self.B * math.sqrt(1.0 - e2)
             / (cp * math.sqrt(1.0 - e2 * sp * sp))) if cp > 1e-12 \
            else 1.0
        D2 = max(D * D, 1.0)
        F = D + math.sqrt(D2 - 1.0) * (1.0 if phi_c >= 0 else -1.0)
        self.E0 = F * t0 ** self.B
        G = (F - 1.0 / F) / 2.0
        self.gam0 = math.asin(math.sin(alpha_c) / D)
        self.lam0 = lam_c - math.asin(G * math.tan(self.gam0)) / self.B
        self.variant_b = variant_b
        if variant_b:
            # u at the centre (EPSG: sign of lat_c; abs(alpha) = 90°
            # special-cased as A(λc−λ0) in the spec — not needed for
            # the supported CRSs)
            self.uc = ((self.A / self.B)
                       * math.atan2(math.sqrt(D2 - 1.0),
                                    math.cos(alpha_c))
                       * (1.0 if phi_c >= 0 else -1.0))
        else:
            self.uc = 0.0
        self.fe, self.fn = fe, fn

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        phi = np.radians(np.asarray(lat, np.float64))
        e, B, A = self.e, self.B, self.A
        s = np.sin(phi)
        t = (np.tan(np.pi / 4 - phi / 2)
             / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))
        Q = self.E0 / t ** B
        S = (Q - 1.0 / Q) / 2.0
        T = (Q + 1.0 / Q) / 2.0
        dlam = np.radians(lon) - self.lam0
        dlam = (dlam + np.pi) % (2 * np.pi) - np.pi
        V = np.sin(B * dlam)
        U = (-V * math.cos(self.gam0) + S * math.sin(self.gam0)) / T
        v = A * np.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
        u = (A * np.arctan2(S * math.cos(self.gam0)
                            + V * math.sin(self.gam0),
                            np.cos(B * dlam)) / B) - self.uc
        cg, sg = math.cos(self.gam_c), math.sin(self.gam_c)
        return v * cg + u * sg + self.fe, u * cg - v * sg + self.fn

    def inverse(self, x, y):
        x = np.asarray(x, np.float64) - self.fe
        y = np.asarray(y, np.float64) - self.fn
        e, B, A = self.e, self.B, self.A
        cg, sg = math.cos(self.gam_c), math.sin(self.gam_c)
        vp = x * cg - y * sg
        up = y * cg + x * sg + self.uc
        Qp = np.exp(-B * vp / A)
        Sp = (Qp - 1.0 / Qp) / 2.0
        Tp = (Qp + 1.0 / Qp) / 2.0
        Vp = np.sin(B * up / A)
        Up = ((Vp * math.cos(self.gam0) + Sp * math.sin(self.gam0))
              / Tp)
        tp = (self.E0 / np.sqrt((1.0 + Up) / (1.0 - Up))) ** (1.0 / B)
        chi = np.pi / 2 - 2.0 * np.arctan(tp)
        # conformal → geodetic latitude by fixed-point iteration
        phi = chi.copy() if hasattr(chi, "copy") else chi
        for _ in range(12):
            s = np.sin(phi)
            phi = (np.pi / 2 - 2.0 * np.arctan(
                tp * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)))
        lam = self.lam0 - np.arctan2(
            Sp * math.cos(self.gam0) - Vp * math.sin(self.gam0),
            np.cos(B * up / A)) / B
        return np.degrees(lam), np.degrees(phi)


class Sinusoidal:
    """Spherical sinusoidal on the authalic/semi-major radius — the
    MODIS grid projection (+proj=sinu +R=6371007.181; Snyder ch. 30
    spherical form, which is what the MODIS products define)."""

    def __init__(self, lon0, fe, fn, a):
        self.a, self.lon0, self.fe, self.fn = a, lon0, fe, fn

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        phi = np.radians(np.asarray(lat, np.float64))
        x = self.fe + self.a * lam * np.cos(phi)
        y = self.fn + self.a * phi
        return x, y

    def inverse(self, x, y):
        phi = (np.asarray(y, np.float64) - self.fn) / self.a
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = (np.asarray(x, np.float64) - self.fe) \
                / (self.a * np.cos(phi))
        lam = np.where(np.abs(np.cos(phi)) < 1e-12, 0.0, lam)
        return self.lon0 + np.degrees(lam), np.degrees(phi)


class EquidistantCylindrical:
    """Plate Carrée / equidistant cylindrical (EPSG 1028/1029
    spherical form on the semi-major axis — what EPSG:32662/4087
    use)."""

    def __init__(self, lon0, lat_ts, fe, fn, a):
        self.k = a * float(np.cos(np.radians(lat_ts)))
        self.a, self.lon0, self.fe, self.fn = a, lon0, fe, fn

    def forward(self, lon, lat):
        x = self.fe + self.k * np.radians(np.asarray(lon, np.float64)
                                          - self.lon0)
        y = self.fn + self.a * np.radians(np.asarray(lat, np.float64))
        return x, y

    def inverse(self, x, y):
        lon = self.lon0 + np.degrees((np.asarray(x, np.float64)
                                      - self.fe) / self.k)
        lat = np.degrees((np.asarray(y, np.float64) - self.fn) / self.a)
        return lon, lat


class _LongLat:
    def forward(self, lon, lat):
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)

    inverse = forward


class _SouthOrientated:
    """EPSG 9808 wrapper: westing/southing axes. W = FE − ΔE,
    S = FN − ΔN, where (ΔE, ΔN) is the unshifted kernel output
    (ogr/ogrspatialreference.cpp SetTMSO analog)."""

    def __init__(self, base, fe: float, fn: float):
        self.base, self.fe, self.fn = base, fe, fn

    def forward(self, lon, lat):
        e, n = self.base.forward(lon, lat)
        return self.fe - e, self.fn - n

    def inverse(self, w, s):
        return self.base.inverse(self.fe - np.asarray(w, np.float64),
                                 self.fn - np.asarray(s, np.float64))


# ---------------------------------------------------------------------------
# Helmert datum shift (TOWGS84, position-vector convention, EPSG 9606)
# ---------------------------------------------------------------------------

_AS = np.pi / (180.0 * 3600.0)       # arc-seconds → radians


def geodetic_to_geocentric(lon, lat, a, f, h=0.0):
    e2 = f * (2.0 - f)
    phi = np.radians(np.asarray(lat, np.float64))
    lam = np.radians(np.asarray(lon, np.float64))
    s = np.sin(phi)
    N = a / np.sqrt(1.0 - e2 * s * s)
    X = (N + h) * np.cos(phi) * np.cos(lam)
    Y = (N + h) * np.cos(phi) * np.sin(lam)
    Z = (N * (1.0 - e2) + h) * s
    return X, Y, Z


def geocentric_to_geodetic(X, Y, Z, a, f, iters: int = 10):
    e2 = f * (2.0 - f)
    lam = np.arctan2(Y, X)
    p = np.hypot(X, Y)
    phi = np.arctan2(Z, p * (1.0 - e2))
    for _ in range(iters):
        s = np.sin(phi)
        N = a / np.sqrt(1.0 - e2 * s * s)
        phi = np.arctan2(Z + e2 * N * s, p)
    return np.degrees(lam), np.degrees(phi)


def helmert(X, Y, Z, p7, inverse: bool = False):
    """7-param position-vector transform (dx,dy,dz m; rx,ry,rz
    arc-sec; ds ppm). inverse=True applies the reverse shift."""
    dx, dy, dz, rx, ry, rz, ds = p7
    rx, ry, rz = rx * _AS, ry * _AS, rz * _AS
    m = 1.0 + ds * 1e-6
    if not inverse:
        X2 = m * (X - rz * Y + ry * Z) + dx
        Y2 = m * (rz * X + Y - rx * Z) + dy
        Z2 = m * (-ry * X + rx * Y + Z) + dz
        return X2, Y2, Z2
    # exact inverse of the forward affine (not the sign-flip
    # approximation): un-translate, un-rotate/scale via the transpose
    # of the small-angle rotation (orthogonal to first order; a
    # Neumann step corrects the second-order term)
    U, V, W = (X - dx) / m, (Y - dy) / m, (Z - dz) / m
    for _ in range(3):
        U = (X - dx) / m + rz * V - ry * W
        V = (Y - dy) / m - rz * U + rx * W
        W = (Z - dz) / m + ry * U - rx * V
    return U, V, W


_WGS84_A, _WGS84_RF = ELLIPSOIDS["WGS84"]


# ---------------------------------------------------------------------------
# CRS object
# ---------------------------------------------------------------------------

class CRS:
    """A constructed coordinate reference system: projection kernel +
    ellipsoid + optional TOWGS84. ``to_wgs84_legs()`` yields the
    (to_lonlat, from_lonlat) pair the warp hub composes."""

    def __init__(self, params: dict):
        self.params = params
        self.name = params.get("name", "")
        a = params["a"]
        rf = params["rf"]
        f = 1.0 / rf if rf else 0.0
        self.a, self.f = a, f
        self.towgs84 = params.get("towgs84")
        self.nadgrids = params.get("nadgrids")
        self._grid = None                   # lazy NTv2Grid (per actor)
        self.to_meter = params.get("to_meter", 1.0)
        kind = params["kind"]
        lon0 = params.get("lon_0", 0.0)
        lat0 = params.get("lat_0", 0.0)
        k0 = params.get("k_0", 1.0)
        x0 = params.get("x_0", 0.0)
        y0 = params.get("y_0", 0.0)
        if kind == "longlat":
            self.proj = _LongLat()
        elif kind == "tmerc":
            self.proj = Kruger(lon0, k0=k0, fe=x0, fn=y0, lat0=lat0,
                               a=a, f=f)
        elif kind == "tmerc_south":
            # EPSG 9808: W = FE − ΔE, S = FN − ΔN (westing/southing)
            self.proj = _SouthOrientated(
                Kruger(lon0, k0=k0, fe=0.0, fn=0.0, lat0=lat0,
                       a=a, f=f), x0, y0)
        elif kind == "lcc":
            lat1 = params.get("lat_1", lat0)
            lat2 = params.get("lat_2", lat1)
            self.proj = LambertConformal(lat1, lat2, lat0, lon0, x0, y0,
                                         f=f, a=a, k0=k0)
        elif kind == "aea":
            lat1 = params.get("lat_1", lat0)
            lat2 = params.get("lat_2", lat1)
            self.proj = AlbersEqualArea(lat1, lat2, lat0, lon0, x0, y0,
                                        f=f, a=a)
        elif kind == "stere_polar":
            lat_ts = params.get("lat_ts", params.get("lat_1"))
            if lat_ts is None and abs(lat0) != 90.0 and "lat_0" in params:
                # WKT1 Polar_Stereographic puts variant B's standard
                # parallel in latitude_of_origin (GDAL exportToWkt)
                lat_ts = lat0
            south = (lat_ts if lat_ts is not None
                     else params.get("lat_0", 90.0)) < 0.0
            if lat_ts is None or abs(lat_ts) == 90.0:
                # variant A: scale factor at the pole
                self.proj = PolarStereographic(
                    90.0, lon0, x0, y0, south=south, f=f, a=a, k0=k0)
            else:
                self.proj = PolarStereographic(
                    lat_ts, lon0, x0, y0, south=south, f=f, a=a)
        elif kind == "merc":
            self.proj = Mercator(lon0, k0, x0, y0, a, f,
                                 lat_ts=params.get("lat_ts"))
        elif kind == "webmerc":
            self.proj = WebMercator(lon0, x0, y0, a)
        elif kind == "sinu":
            self.proj = Sinusoidal(lon0, x0, y0, a)
        elif kind == "eqc":
            self.proj = EquidistantCylindrical(
                lon0, params.get("lat_ts", params.get("lat_1", 0.0)),
                x0, y0, a)
        elif kind == "somerc":
            self.proj = SwissObliqueMercator(lat0, lon0, k0, x0, y0,
                                             a, f)
        elif kind in ("omerc", "omerc_b"):
            alpha = params.get("alpha", 90.0)
            gamma = params.get("gamma", alpha)
            self.proj = HotineObliqueMercator(
                lat0, lon0, alpha, gamma, k0, x0, y0, a, f,
                variant_b=(kind == "omerc_b"))
        else:
            raise ValueError(f"unsupported CRS kind {kind!r}")

    @property
    def is_geographic(self) -> bool:
        return self.params["kind"] == "longlat"

    # projected x/y (CRS units) ↔ lon/lat degrees on the CRS's own datum
    def xy_to_lonlat(self, x, y):
        if self.is_geographic:
            return self.proj.forward(x, y)
        x = np.asarray(x, np.float64) * self.to_meter
        y = np.asarray(y, np.float64) * self.to_meter
        return self.proj.inverse(x, y)

    def lonlat_to_xy(self, lon, lat):
        if self.is_geographic:
            return self.proj.forward(lon, lat)
        x, y = self.proj.forward(lon, lat)
        return x / self.to_meter, y / self.to_meter

    def _ntv2(self):
        if self._grid is None:
            from ..codecs.ntv2 import NTv2Grid
            with open(self.nadgrids, "rb") as f:
                self._grid = NTv2Grid(f.read())
        return self._grid

    # datum legs: lon/lat on own datum ↔ lon/lat on WGS84.
    # +nadgrids= (an NTv2 .gsb path) takes precedence over +towgs84,
    # matching PROJ's datum-transform priority.
    def lonlat_to_wgs84(self, lon, lat):
        if self.nadgrids:
            return self._ntv2().shift(lon, lat)
        if self.towgs84 is None:
            return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
        X, Y, Z = geodetic_to_geocentric(lon, lat, self.a, self.f)
        X, Y, Z = helmert(X, Y, Z, self.towgs84)
        return geocentric_to_geodetic(X, Y, Z, _WGS84_A,
                                      1.0 / _WGS84_RF)

    def wgs84_to_lonlat(self, lon, lat):
        if self.nadgrids:
            return self._ntv2().shift_inverse(lon, lat)
        if self.towgs84 is None:
            return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
        X, Y, Z = geodetic_to_geocentric(lon, lat, _WGS84_A,
                                         1.0 / _WGS84_RF)
        X, Y, Z = helmert(X, Y, Z, self.towgs84, inverse=True)
        return geocentric_to_geodetic(X, Y, Z, self.a, self.f)

    def to_wgs84_legs(self):
        """(to_lonlat_wgs84(x, y), from_lonlat_wgs84(lon, lat)) — the
        hub legs stages/warp.py composes src→4326→dst."""
        def to_ll(x, y):
            lon, lat = self.xy_to_lonlat(x, y)
            return self.lonlat_to_wgs84(lon, lat)

        def from_ll(lon, lat):
            lon, lat = self.wgs84_to_lonlat(lon, lat)
            return self.lonlat_to_xy(lon, lat)

        return to_ll, from_ll


# extra EPSG codes constructible without a database (public registry
# parameter sets, expressed as proj strings)
EPSG_PROJ = {
    "EPSG:27700": ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
                   "+x_0=400000 +y_0=-100000 +ellps=airy "
                   "+towgs84=446.448,-125.157,542.06,"
                   "0.15,0.247,0.842,-20.489"),
    "EPSG:3395": "+proj=merc +lon_0=0 +k=1 +x_0=0 +y_0=0 +ellps=WGS84",
    "EPSG:25832": "+proj=utm +zone=32 +ellps=GRS80",
    "EPSG:25833": "+proj=utm +zone=33 +ellps=GRS80",
    "EPSG:26911": "+proj=utm +zone=11 +ellps=GRS80",
    "EPSG:26711": "+proj=utm +zone=11 +datum=NAD27",
    "EPSG:4267": "+proj=longlat +datum=NAD27",
    "EPSG:4269": "+proj=longlat +ellps=GRS80",
    "EPSG:4258": "+proj=longlat +ellps=GRS80",
    "EPSG:4277": ("+proj=longlat +ellps=airy +towgs84=446.448,"
                  "-125.157,542.06,0.15,0.247,0.842,-20.489"),
    "EPSG:21781": ("+proj=somerc +lat_0=46.95240555555556 "
                   "+lon_0=7.439583333333333 +k_0=1 +x_0=600000 "
                   "+y_0=200000 +ellps=bessel "
                   "+towgs84=674.374,15.056,405.346,0,0,0,0"),
}

_CRS_CACHE: dict[str, CRS] = {}


def crs_from(spec) -> CRS:
    """Any CRS spec → CRS object: WKT1/ESRI/WKT2 string, '+proj=...'
    string, parameter dict, or an 'EPSG:xxxx' code from EPSG_PROJ /
    any UTM zone. (Codes the warp registry already serves natively —
    4326/3857/registry conics — are handled upstream in _hub_legs.)"""
    if isinstance(spec, dict):
        return CRS(spec)
    s = spec.strip()
    if s in _CRS_CACHE:
        return _CRS_CACHE[s]
    if s.startswith("+"):
        crs = CRS(params_from_proj(s))
    elif re.match(r"^[A-Za-z_]+\s*[\[(]", s):
        crs = CRS(params_from_wkt(s))
    elif s.upper().startswith("EPSG:"):
        proj = EPSG_PROJ.get(s.upper())
        if proj is None:
            num = int(s.split(":")[1])
            if 32601 <= num <= 32660:
                proj = f"+proj=utm +zone={num - 32600} +ellps=WGS84"
            elif 32701 <= num <= 32760:
                proj = f"+proj=utm +zone={num - 32700} +south +ellps=WGS84"
            elif num == 4326:
                proj = "+proj=longlat +ellps=WGS84"
            elif num == 3857:
                proj = "+proj=webmerc +ellps=WGS84"
            else:
                raise ValueError(
                    f"EPSG:{num} is not in the built-in parameter set — "
                    "pass its WKT or proj string instead")
        crs = CRS(params_from_proj(proj))
    else:
        raise ValueError(f"unrecognized CRS spec {s[:60]!r}")
    _CRS_CACHE[s] = crs
    return crs
