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


def lonlat_to_tmerc(lon, lat, lon0_deg: float, *, south: bool = False):
    """(lon, lat) degrees → transverse-mercator (easting, northing)
    meters for central meridian lon0_deg (UTM scale/false offsets)."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    lam = np.radians(lon - lon0_deg)
    phi = np.radians(lat)
    sphi = np.sin(phi)
    # conformal latitude: tau' = sinh(atanh(sin φ) − e·atanh(e·sin φ))
    t = np.sinh(np.arctanh(sphi) - _E * np.arctanh(_E * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    jx = 2.0 * _J[:, None] * xi_p.ravel()[None, :]
    je = 2.0 * _J[:, None] * eta_p.ravel()[None, :]
    xi = xi_p.ravel() + (_ALPHA[:, None] * np.sin(jx) * np.cosh(je)).sum(0)
    eta = eta_p.ravel() + (_ALPHA[:, None] * np.cos(jx) * np.sinh(je)).sum(0)
    E = _FE + _K0 * _A_REC * eta
    Nn = (_FN_SOUTH if south else 0.0) + _K0 * _A_REC * xi
    return E.reshape(lon.shape), Nn.reshape(lat.shape)


def tmerc_to_lonlat(E, Nn, lon0_deg: float, *, south: bool = False):
    """(easting, northing) meters → (lon, lat) degrees."""
    E = np.asarray(E, np.float64)
    Nn = np.asarray(Nn, np.float64)
    xi = (Nn.ravel() - (_FN_SOUTH if south else 0.0)) / (_K0 * _A_REC)
    eta = (E.ravel() - _FE) / (_K0 * _A_REC)
    jx = 2.0 * _J[:, None] * xi[None, :]
    je = 2.0 * _J[:, None] * eta[None, :]
    xi_p = xi - (_BETA[:, None] * np.sin(jx) * np.cosh(je)).sum(0)
    eta_p = eta - (_BETA[:, None] * np.cos(jx) * np.sinh(je)).sum(0)
    # tau' and longitude
    t_p = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # invert the conformal latitude: sinφ = tanh(ψ + e·atanh(e·sinφ))
    psi = np.arcsinh(t_p)
    s = np.tanh(psi)
    for _ in range(8):                      # contraction factor ≈ e² → 8
        s = np.tanh(psi + _E * np.arctanh(_E * s))  # iters ≪ 1e-14 rad
    phi = np.arcsin(np.clip(s, -1.0, 1.0))
    lon = lon0_deg + np.degrees(lam)
    lat = np.degrees(phi)
    return lon.reshape(E.shape), lat.reshape(Nn.shape)


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
