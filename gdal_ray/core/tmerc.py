"""Transverse Mercator (UTM) — Krüger series on the WGS84 ellipsoid.

Implements the 6th-order Krüger/Karney series (public formulas: Karney,
"Transverse Mercator with an accuracy of a few nanometers", J. Geod.
2011; the same series PROJ's etmerc uses), giving sub-millimeter
accuracy over a UTM zone. This is the "general CRS" leg the reference's
own benchmark workload needs (autotest/benchmark/test_gdalwarp.py:24-56
warps UTM EPSG:32631 → EPSG:4326).

All functions are numpy-vectorized over coordinate arrays — the natural
batch shape for map_batches actors (reference batches transforms the
same way: OGRCoordinateTransformation::Transform takes arrays,
ogr/ogr_spatialref.h:914).
"""

from __future__ import annotations

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E = np.sqrt(_F * (2.0 - _F))       # first eccentricity
_N = _F / (2.0 - _F)                # third flattening

_K0 = 0.9996                        # UTM scale at central meridian
_FE = 500000.0                      # false easting
_FN_SOUTH = 10000000.0              # false northing (south zones)

# rectifying radius
_A_REC = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)

# Krüger forward (alpha) and reverse (beta) coefficients, order n^6
_n = _N
_ALPHA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180
    - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440
    + 281 * _n**5 / 630 - 1983433 * _n**6 / 1935360,
    61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
    + 167603 * _n**6 / 181440,
    49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
    34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
    212378941 * _n**6 / 319334400,
])
_BETA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360
    - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105
    - 1118711 * _n**6 / 3870720,
    17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480
    + 5569 * _n**6 / 90720,
    4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
    4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
    20648693 * _n**6 / 638668800,
])
_J = np.arange(1, 7, dtype=np.float64)


def _kruger_coeffs(n: float):
    """6th-order Krüger alpha/beta series coefficients for third
    flattening n (Karney 2011, eqs 35-36 — same polynomials as the
    module-level WGS84 constants, evaluated for any ellipsoid)."""
    alpha = np.array([
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
        - 127 * n**5 / 288 + 7891 * n**6 / 37800,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440
        + 281 * n**5 / 630 - 1983433 * n**6 / 1935360,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
        + 167603 * n**6 / 181440,
        49561 * n**4 / 161280 - 179 * n**5 / 168
        + 6601661 * n**6 / 7257600,
        34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
        212378941 * n**6 / 319334400,
    ])
    beta = np.array([
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360
        - 81 * n**5 / 512 + 96199 * n**6 / 604800,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105
        - 1118711 * n**6 / 3870720,
        17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480
        + 5569 * n**6 / 90720,
        4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
        4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
        20648693 * n**6 / 638668800,
    ])
    return alpha, beta


class Kruger:
    """Parameterized transverse-mercator kernel: any ellipsoid (a, f),
    scale k0, false easting/northing, central meridian, latitude of
    origin — the general constructor the WKT/proj importer
    (core/srs.py) instantiates, replacing a fixed EPSG registry
    (ogr/ogrspatialreference.cpp importFromEPSG + PROJ etmerc)."""

    def __init__(self, lon0: float, *, k0: float = 1.0, fe: float = 0.0,
                 fn: float = 0.0, lat0: float = 0.0,
                 a: float = _A, f: float = _F):
        self.a, self.f = a, f
        self.e = float(np.sqrt(f * (2.0 - f)))
        n = f / (2.0 - f)
        self.a_rec = a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0
                                      + n**6 / 256.0)
        self.alpha, self.beta = _kruger_coeffs(n)
        self.lon0, self.k0, self.fe = lon0, k0, fe
        # meridian arc to the latitude of origin: ξ at λ=0, i.e. ON
        # the central meridian (lon = lon0, not lon = 0)
        if lat0:
            xi0, _ = self._xi_eta(np.array([lon0]), np.array([lat0]))
            self.fn = fn - k0 * self.a_rec * float(xi0[0])
        else:
            self.fn = fn

    def _xi_eta(self, lon, lat):
        lam = np.radians(lon - self.lon0)
        phi = np.radians(lat)
        sphi = np.sin(phi)
        t = np.sinh(np.arctanh(sphi) - self.e * np.arctanh(self.e * sphi))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
        jx = 2.0 * _J[:, None] * xi_p.ravel()[None, :]
        je = 2.0 * _J[:, None] * eta_p.ravel()[None, :]
        xi = xi_p.ravel() + (self.alpha[:, None] * np.sin(jx)
                             * np.cosh(je)).sum(0)
        eta = eta_p.ravel() + (self.alpha[:, None] * np.cos(jx)
                               * np.sinh(je)).sum(0)
        return xi, eta

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        xi, eta = self._xi_eta(lon, lat)
        E = self.fe + self.k0 * self.a_rec * eta
        Nn = self.fn + self.k0 * self.a_rec * xi
        return E.reshape(lon.shape), Nn.reshape(lat.shape)

    def inverse(self, E, Nn):
        E = np.asarray(E, np.float64)
        Nn = np.asarray(Nn, np.float64)
        xi = (Nn.ravel() - self.fn) / (self.k0 * self.a_rec)
        eta = (E.ravel() - self.fe) / (self.k0 * self.a_rec)
        jx = 2.0 * _J[:, None] * xi[None, :]
        je = 2.0 * _J[:, None] * eta[None, :]
        xi_p = xi - (self.beta[:, None] * np.sin(jx) * np.cosh(je)).sum(0)
        eta_p = eta - (self.beta[:, None] * np.cos(jx) * np.sinh(je)).sum(0)
        t_p = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        psi = np.arcsinh(t_p)
        s = np.tanh(psi)
        for _ in range(8):                  # contraction ≈ e² → 8 iters
            s = np.tanh(psi + self.e * np.arctanh(self.e * s))
        phi = np.arcsin(np.clip(s, -1.0, 1.0))
        lon = self.lon0 + np.degrees(lam)
        lat = np.degrees(phi)
        return lon.reshape(E.shape), lat.reshape(Nn.shape)


# cached WGS84/UTM instances backing the legacy functions (hot path:
# warp meshes call per batch — don't rebuild series coefficients)
_UTM_CACHE: dict = {}


def _utm_kernel(lon0_deg: float, south: bool) -> Kruger:
    key = (lon0_deg, south)
    if key not in _UTM_CACHE:
        _UTM_CACHE[key] = Kruger(lon0_deg, k0=_K0, fe=_FE,
                                 fn=_FN_SOUTH if south else 0.0)
    return _UTM_CACHE[key]


def lonlat_to_tmerc(lon, lat, lon0_deg: float, *, south: bool = False):
    """(lon, lat) degrees → transverse-mercator (easting, northing)
    meters for central meridian lon0_deg (UTM scale/false offsets)."""
    return _utm_kernel(lon0_deg, south).forward(lon, lat)


def tmerc_to_lonlat(E, Nn, lon0_deg: float, *, south: bool = False):
    """(easting, northing) meters → (lon, lat) degrees."""
    return _utm_kernel(lon0_deg, south).inverse(E, Nn)


def parse_utm_epsg(code: str):
    """'EPSG:326xx'/'EPSG:327xx' → (lon0_deg, south) or None."""
    if not code.upper().startswith("EPSG:"):
        return None
    try:
        num = int(code.split(":")[1])
    except ValueError:
        return None
    if 32601 <= num <= 32660:
        zone, south = num - 32600, False
    elif 32701 <= num <= 32760:
        zone, south = num - 32700, True
    else:
        return None
    return (zone - 1) * 6.0 - 180.0 + 3.0, south
