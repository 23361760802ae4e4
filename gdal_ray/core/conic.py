"""Conic + polar projections — Lambert Conformal Conic (2SP), Albers
Equal Area (2SP), Polar Stereographic (variant B).

Public Snyder formulas (Snyder, "Map Projections — A Working Manual",
USGS PP 1395: LCC eqs 15-1..15-11, Albers 14-1..14-11, Polar Stereo
21-/EPSG guidance 7-2). These are the projection families behind the
most-used national grids (Lambert-93, US State Plane LCC zones, CONUS
Albers, polar sea-ice grids) that the reference resolves through
PROJ's CRS database (ogr/ogrspatialreference.cpp importFromEPSG);
here a small in-repo parameter registry covers the engine's working
set. Datum shifts between GRS80-family datums (RGF93/NAD83/WGS84) are
treated as null, the same ~1 m tier GDAL uses without datum grids.

All functions are numpy-vectorized (degrees in, meters out)."""

from __future__ import annotations

import numpy as np

_A = 6378137.0
_F_WGS84 = 1.0 / 298.257223563
_F_GRS80 = 1.0 / 298.257222101

_D = np.pi / 180.0


def _e_of(f: float) -> float:
    return float(np.sqrt(f * (2.0 - f)))


def _m(phi, e):
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - e * e * s * s)


def _t(phi, e):
    s = np.sin(phi)
    return (np.tan(np.pi / 4.0 - phi / 2.0)
            / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))


def _phi_from_t(t, e, iters: int = 12):
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(iters):
        s = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))
    return phi


def _q(phi, e):
    s = np.sin(phi)
    return (1.0 - e * e) * (s / (1.0 - e * e * s * s)
                            - (1.0 / (2.0 * e))
                            * np.log((1.0 - e * s) / (1.0 + e * s)))


class LambertConformal:
    """LCC 2SP (Snyder 15-1..15-11)."""

    def __init__(self, lat1, lat2, lat0, lon0, fe, fn, f=_F_GRS80,
                 a=_A, k0=1.0):
        e = _e_of(f)
        p1, p2, p0 = lat1 * _D, lat2 * _D, lat0 * _D
        if lat1 == lat2:
            # 1SP degenerate form (Snyder 15-11 footnote): n = sin(phi1),
            # scale factor k0 multiplies every radius
            self.n = float(np.sin(p1))
            self.F = _m(p1, e) / (self.n * _t(p1, e) ** self.n)
        else:
            m1, m2 = _m(p1, e), _m(p2, e)
            t1, t2 = _t(p1, e), _t(p2, e)
            self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
            self.F = m1 / (self.n * t1 ** self.n)
        self.a = a * k0
        self.rho0 = self.a * self.F * _t(p0, e) ** self.n
        self.lon0 = lon0 * _D
        self.fe, self.fn, self.e = fe, fn, e

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64) * _D
        lat = np.asarray(lat, np.float64) * _D
        rho = self.a * self.F * _t(lat, self.e) ** self.n
        th = self.n * (lon - self.lon0)
        return (self.fe + rho * np.sin(th),
                self.fn + self.rho0 - rho * np.cos(th))

    def inverse(self, x, y):
        dx = np.asarray(x, np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.sign(self.n) * np.hypot(dx, dy)
        th = np.arctan2(np.sign(self.n) * dx, np.sign(self.n) * dy)
        t = (rho / (self.a * self.F)) ** (1.0 / self.n)
        lat = _phi_from_t(t, self.e)
        return (th / self.n + self.lon0) / _D, lat / _D


class AlbersEqualArea:
    """Albers 2SP (Snyder 14-1..14-11)."""

    def __init__(self, lat1, lat2, lat0, lon0, fe, fn, f=_F_GRS80,
                 a=_A):
        e = _e_of(f)
        p1, p2, p0 = lat1 * _D, lat2 * _D, lat0 * _D
        m1, m2 = _m(p1, e), _m(p2, e)
        q1, q2, q0 = _q(p1, e), _q(p2, e), _q(p0, e)
        if lat1 == lat2:
            self.n = float(np.sin(p1))
        else:
            self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        self.a = a
        self.rho0 = a * np.sqrt(self.C - self.n * q0) / self.n
        self.lon0 = lon0 * _D
        self.fe, self.fn, self.e = fe, fn, e

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64) * _D
        lat = np.asarray(lat, np.float64) * _D
        rho = self.a * np.sqrt(self.C - self.n * _q(lat, self.e)) / self.n
        th = self.n * (lon - self.lon0)
        return (self.fe + rho * np.sin(th),
                self.fn + self.rho0 - rho * np.cos(th))

    def inverse(self, x, y):
        e = self.e
        dx = np.asarray(x, np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.hypot(dx, dy)
        qv = (self.C - (rho * self.n / self.a) ** 2) / self.n
        th = np.arctan2(np.sign(self.n) * dx, np.sign(self.n) * dy)
        phi = np.arcsin(np.clip(qv / 2.0, -1.0, 1.0))
        for _ in range(12):
            s = np.sin(phi)
            one = 1.0 - e * e * s * s
            phi = phi + one * one / (2.0 * np.cos(phi)) * (
                qv / (1.0 - e * e) - s / one
                + np.log((1.0 - e * s) / (1.0 + e * s)) / (2.0 * e))
        return (th / self.n + self.lon0) / _D, phi / _D


class PolarStereographic:
    """Variant B (standard parallel lat_ts; EPSG method 9829)."""

    def __init__(self, lat_ts, lon0, fe, fn, *, south, f=_F_WGS84,
                 a=_A, k0=None):
        e = _e_of(f)
        self.south = south
        if k0 is not None:
            # variant A (EPSG 9810): scale factor at the pole
            self.scale = (2.0 * a * k0
                          / np.sqrt((1.0 + e) ** (1.0 + e)
                                    * (1.0 - e) ** (1.0 - e)))
        else:
            pts = abs(lat_ts) * _D
            self.scale = a * _m(pts, e) / _t(pts, e)
        self.lon0 = lon0 * _D
        self.fe, self.fn, self.e = fe, fn, e

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64) * _D - self.lon0
        lat = np.asarray(lat, np.float64) * _D
        # south aspect: t_south(phi) = t(-phi); +y points along lon0
        rho = self.scale * _t(-lat if self.south else lat, self.e)
        x = self.fe + rho * np.sin(lon)
        y = self.fn + (rho * np.cos(lon) if self.south
                       else -rho * np.cos(lon))
        return x, y

    def inverse(self, x, y):
        dx = np.asarray(x, np.float64) - self.fe
        dy = np.asarray(y, np.float64) - self.fn
        rho = np.hypot(dx, dy)
        t = rho / self.scale
        lat = _phi_from_t(t, self.e)
        if self.south:
            return (np.arctan2(dx, dy) + self.lon0) / _D, -lat / _D
        return (np.arctan2(dx, -dy) + self.lon0) / _D, lat / _D


# EPSG parameter registry — the engine's working set of national grids
# (params are the public EPSG registry definitions)
_PROJ_DB = {
    # RGF93 / Lambert-93 (France)
    "EPSG:2154": lambda: LambertConformal(49.0, 44.0, 46.5, 3.0,
                                          700000.0, 6600000.0),
    # NAD83 / Conus Albers
    "EPSG:5070": lambda: AlbersEqualArea(29.5, 45.5, 23.0, -96.0,
                                         0.0, 0.0),
    # WGS84 / Antarctic Polar Stereographic
    "EPSG:3031": lambda: PolarStereographic(-71.0, 0.0, 0.0, 0.0,
                                            south=True),
    # WGS84 / NSIDC Sea Ice Polar Stereographic North
    "EPSG:3413": lambda: PolarStereographic(70.0, -45.0, 0.0, 0.0,
                                            south=False),
    # ETRS89 / LCC Europe
    "EPSG:3034": lambda: LambertConformal(35.0, 65.0, 52.0, 10.0,
                                          4000000.0, 2800000.0),
}

_CACHE: dict[str, object] = {}


def projection_for(code: str):
    """Projection object for an EPSG code in the registry, else None."""
    mk = _PROJ_DB.get(code)
    if mk is None:
        return None
    if code not in _CACHE:
        _CACHE[code] = mk()
    return _CACHE[code]
