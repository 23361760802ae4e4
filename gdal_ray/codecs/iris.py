"""Vaisala Sigmet IRIS weather-radar products (.dat / .ppi / RAW).

Reference driver: frmts/iris/irisdataset.cpp. Layout replicated:
structure headers 27 (product) + 26 (product configuration) at
offsets 0/12; raster size at +112/+116 (i.e. 100+12 / 104+12); data
type code at +142 deciding the value transform
(1-byte dBZ: (v-64)/2 with 95.5 -> -9999; 2-byte: (v-32768)/100 with
327.67 -> -9999; VIL/HEIGHT/FLIQUID variants), rows stored bottom-up;
product/site/task/PRF/wavelength metadata at the configuration- and
ingest-header offsets; Mercator georeferencing via the Vincenty
direct problem from the radar centre (GeodesicCalculation) and the
spherical/ellipsoidal Mercator forward, pixel scale from the
cm-resolution fields at +100/+104.

Goldens in tests/test_iris.py from autotest/gdrivers/iris.py
(fakeiris 65532, iristest 52872 + Mercator geotransform + metadata
items)."""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["decode_iris"]

_PRODUCTS = [
    "", "PPI", "RHI", "CAPPI", "CROSS", "TOPS", "TRACK",
    "RAIN1", "RAINN", "VVP", "VIL", "SHEAR", "WARN", "CATCH",
    "RTI", "RAW", "MAX", "USER", "USERV", "OTHER", "STATUS",
    "SLINE", "WIND", "BEAM", "TEXT", "FCAST", "NDOP", "IMAGE",
    "COMP", "TDWR", "GAGE", "DWELL", "SRI", "BASE", "HMAX"]
_DTYPE_CODES = [
    "XHDR", "DBT", "dBZ", "VEL", "WIDTH", "ZDR", "ORAIN", "dBZC",
    "DBT2", "dBZ2", "VEL2", "WIDTH2", "ZDR2", "RAINRATE2", "KDP",
    "KDP2", "PHIDP", "VELC", "SQI", "RHOHV", "RHOHV2", "dBZC2",
    "VELC2", "SQI2", "PHIDP2", "LDRH", "LDRH2", "LDRV", "LDRV2",
    "FLAGS", "FLAGS2", "FLOAT32", "HEIGHT", "VIL2", "NULL", "SHEAR",
    "DIVERGE2", "FLIQUID2", "USER", "OTHER", "DEFORM2", "VVEL2",
    "HVEL2", "HDIR2", "AXDIL2", "TIME2", "RHOH", "RHOH2", "RHOV",
    "RHOV2", "PHIH", "PHIH2", "PHIV", "PHIV2", "USER2", "HCLASS",
    "HCLASS2", "ZDRC", "ZDRC2", "TEMPERATURE16", "VIR16", "DBTV8",
    "DBTV16", "DBZV8", "DBZV16", "SNR8", "SNR16", "ALBEDO8",
    "ALBEDO16", "VILD16", "TURB16"]
_DTYPE_NAMES = {
    2: "Clutter Corrected H reflectivity (1 byte)",
    1: "Total H power (1 byte)",
    8: "Uncorrected reflectivity (2 byte)",
    9: "Corrected reflectivity (2 byte)",
    32: "Height (1/10 km) (1 byte)",
    33: "Linear liquid (.001mm) (2 byte)",
    37: "Floated liquid (2 byte)"}
_PROJECTIONS = ["Azimutal equidistant", "Mercator",
                "Polar Stereographic", "UTM",
                "Perspective from geosync", "Equidistant cylindrical",
                "Gnomonic", "Gauss conformal",
                "Lambert conformal conic"]


def _vincenty_direct(lat, lon, azi, dist, a, b, f):
    """Vincenty direct problem — the reference's GeodesicCalculation
    term-for-term (irisdataset.cpp)."""
    alpha1 = math.radians(azi)
    sin_a1, cos_a1 = math.sin(alpha1), math.cos(alpha1)
    tan_u1 = (1 - f) * math.tan(math.radians(lat))
    cos_u1 = 1 / math.sqrt(1 + tan_u1 * tan_u1)
    sin_u1 = tan_u1 * cos_u1
    sigma1 = math.atan2(tan_u1, cos_a1)
    sin_alpha = cos_u1 * sin_a1
    cos_sq = 1 - sin_alpha * sin_alpha
    usq = cos_sq * (a * a - b * b) / (b * b)
    A = 1 + usq / 16384 * (4096 + usq * (-768 + usq * (320 - 175 * usq)))
    B = usq / 1024 * (256 + usq * (-128 + usq * (74 - 47 * usq)))
    sigma = dist / (b * A)
    sigma_p = 2 * math.pi
    sin_s = cos_s = cos2m = 0.0
    it = 0
    while abs(sigma - sigma_p) > 1e-12:
        cos2m = math.cos(2 * sigma1 + sigma)
        sin_s = math.sin(sigma)
        cos_s = math.cos(sigma)
        dsig = B * sin_s * (cos2m + B / 4 * (
            cos_s * (-1 + 2 * cos2m * cos2m)
            - B / 6 * cos2m * (-3 + 4 * sin_s * sin_s)
            * (-3 + 4 * cos2m * cos2m)))
        sigma_p = sigma
        sigma = dist / (b * A) + dsig
        it += 1
        if it == 100:
            raise ValueError("Vincenty did not converge")
    tmp = sin_u1 * sin_s - cos_u1 * cos_s * cos_a1
    lat2 = math.atan2(sin_u1 * cos_s + cos_u1 * sin_s * cos_a1,
                      (1 - f) * math.sqrt(sin_alpha * sin_alpha +
                                          tmp * tmp))
    lam = math.atan2(sin_s * sin_a1,
                     cos_u1 * cos_s - sin_u1 * sin_s * cos_a1)
    C = f / 16 * cos_sq * (4 + f * (4 - 3 * cos_sq))
    L = lam - (1 - C) * f * sin_alpha * (
        sigma + C * sin_s * (cos2m + C * cos_s *
                             (-1 + 2 * cos2m * cos2m)))
    lon2 = math.radians(lon) + L
    if lon2 > math.pi:
        lon2 -= 2 * math.pi
    if lon2 < -math.pi:
        lon2 += 2 * math.pi
    return math.degrees(lon2), math.degrees(lat2)


def _fill(buf, off, n):
    return buf[off:off + n].decode("latin-1", "replace")


def decode_iris(buf: bytes):
    if len(buf) < 640:
        raise ValueError("IRIS file too short")
    id1 = struct.unpack_from("<h", buf, 0)[0]
    id2 = struct.unpack_from("<h", buf, 12)[0]
    pcode = struct.unpack_from("<H", buf, 24)[0]
    if not (id1 == 27 and id2 == 26 and 0 < pcode < len(_PRODUCTS)):
        raise ValueError("not an IRIS product file")
    w = struct.unpack_from("<i", buf, 112)[0]
    h = struct.unpack_from("<i", buf, 116)[0]
    dcode = struct.unpack_from("<H", buf, 142)[0]
    proj_code = buf[158]

    nbytes = 2 if dcode in (8, 9, 37, 33) else 1
    data = np.frombuffer(buf, np.uint8, w * h * nbytes, 640)
    if nbytes == 2:
        raw = data.view("<u2").reshape(h, w).astype(np.float32)
    else:
        raw = data.reshape(h, w).astype(np.float32)
    raw = raw[::-1]  # rows stored bottom-up
    if dcode in (1, 2):
        px = (raw - 64.0) / 2.0
        px[px == 95.5] = -9999.0
    elif dcode in (8, 9):
        px = (raw - 32768.0) / 100.0
        px[np.isclose(px, 327.67)] = -9999.0
    elif dcode == 33:
        px = raw.copy()
        px[raw == 65535] = -9999.0
    elif dcode == 32:
        px = (raw - 1) / 10.0
        px[raw == 0] = -9999.0
        px[raw == 255] = -9999.0
    elif dcode == 37:
        exp = raw.astype(np.uint16) >> 12
        mant = raw.astype(np.uint16) & 0xFFF
        px = np.where(exp == 0, mant / 1000.0,
                      ((mant | 0x1000).astype(np.float64) *
                       (1 << exp.astype(np.int64)) / 2 / 1000.0)
                      ).astype(np.float32)
    else:
        px = raw

    meta: dict = {"driver": "IRIS",
                  "PRODUCT_ID": str(pcode),
                  "PRODUCT": _PRODUCTS[pcode],
                  "DATA_TYPE_CODE": _DTYPE_CODES[dcode]
                  if dcode < len(_DTYPE_CODES) else str(dcode)}
    if dcode in _DTYPE_NAMES:
        meta["DATA_TYPE"] = _DTYPE_NAMES[dcode]
    dinput = struct.unpack_from("<H", buf, 156)[0]
    if dinput < len(_DTYPE_CODES):
        meta["DATA_TYPE_INPUT_CODE"] = _DTYPE_CODES[dinput]
        if dinput in _DTYPE_NAMES:
            meta["DATA_TYPE_INPUT"] = _DTYPE_NAMES[dinput]
    meta["PRODUCT_SITE_NAME"] = _fill(buf, 332, 16)
    meta["PRODUCT_SITE_IRIS_VERSION"] = _fill(buf, 348, 8).split(
        "\x00")[0].strip()
    meta["INGEST_SITE_NAME"] = _fill(buf, 422, 16)
    meta["INGEST_SITE_IRIS_VERSION"] = _fill(buf, 356, 8).split(
        "\x00")[0].strip()
    meta["INGEST_HARDWARE_NAME"] = _fill(buf, 406, 16)
    meta["PRODUCT_CONFIGURATION_NAME"] = _fill(buf, 74, 12)
    meta["TASK_NAME"] = _fill(buf, 86, 12)
    radar_h = struct.unpack_from("<h", buf, 616)[0]
    meta["RADAR_HEIGHT"] = f"{radar_h} m"
    ground_minus = struct.unpack_from("<h", buf, 450)[0]
    meta["GROUND_HEIGHT"] = f"{radar_h - ground_minus} m"
    prf = struct.unpack_from("<i", buf, 452)[0]
    meta["PRF"] = f"{prf} Hz"
    wave = struct.unpack_from("<i", buf, 480)[0]
    meta["WAVELENGTH"] = "%4.2f cm" % (wave / 100.0)
    mult = struct.unpack_from("<H", buf, 484)[0]
    fny = prf * (wave / 10000.0) / 4.0
    if mult == 2:
        fny *= 2
    elif mult == 3:
        fny *= 3
    elif mult == 4:
        fny *= 4
    meta["NYQUIST_VELOCITY"] = "%.2f m/s" % fny
    if pcode == 3:  # CAPPI
        bot = struct.unpack_from("<i", buf, 180)[0] / 100.0
        meta["CAPPI_BOTTOM_HEIGHT"] = "%.1f m" % bot
        azsm = struct.unpack_from("<H", buf, 186)[0] * 360.0 / 65536.0
        meta["AZIMUTH_SMOOTHING_FOR_SHEAR"] = "%.1f" % azsm
        maxage = struct.unpack_from("<I", buf, 200)[0]
        meta["MAX_AGE_FOR_SHEAR_VVP_CORRECTION"] = f"{maxage} s"
        if _DTYPE_CODES[dcode].startswith("dBZ"):
            meta["DATA_TYPE_UNITS"] = "dBZ"
    flags = struct.unpack_from("<H", buf, 98)[0]
    if flags & 0x1000 or True:
        cmask = struct.unpack_from("<I", buf, 564)[0]
        if cmask:
            meta["COMPOSITED_PRODUCT"] = "YES"
            meta["COMPOSITED_PRODUCT_MASK"] = "0x%08x" % cmask
    # times
    def tstamp(sec_off, date_off):
        secs = struct.unpack_from("<i", buf, sec_off)[0]
        y, mo, d = struct.unpack_from("<3h", buf, date_off)
        return "%d-%02d-%02d %02d:%02d:%02d" % (
            y, mo, d, secs // 3600, (secs // 60) % 60, secs % 60)
    meta["TIME_PRODUCT_GENERATED"] = tstamp(32, 38)
    meta["TIME_INPUT_INGEST_SWEEP"] = tstamp(44, 38)

    # --- Mercator georeferencing
    gt = None
    eq_r = struct.unpack_from("<I", buf, 552)[0] / 100.0
    inv_f = struct.unpack_from("<I", buf, 556)[0] / 1e6
    if eq_r == 0.0:
        eq_r = 6371000.0
        pol_r = eq_r
        flat = 0.0
        inv_f = 0.0
    elif inv_f == 0.0:
        flat = 0.0
        pol_r = eq_r
    else:
        flat = 1.0 / inv_f
        pol_r = eq_r * (1.0 - flat)
    U32 = 0xFFFFFFFF
    clon = struct.unpack_from("<I", buf, 444)[0] * 360.0 / U32
    clat = struct.unpack_from("<I", buf, 440)[0] * 360.0 / U32
    reflon = struct.unpack_from("<I", buf, 576)[0] * 360.0 / U32
    reflat = struct.unpack_from("<I", buf, 572)[0] * 360.0 / U32
    if clon > 180:
        clon -= 360
    if clat > 180:
        clat -= 360
    if reflon > 180:
        reflon -= 360
    if reflat > 180:
        reflat -= 360
    radx = struct.unpack_from("<i", buf, 124)[0] / 1000.0
    rady = struct.unpack_from("<i", buf, 128)[0] / 1000.0
    sx = struct.unpack_from("<i", buf, 100)[0] / 100.0
    sy = struct.unpack_from("<i", buf, 104)[0] / 100.0
    proj = _PROJECTIONS[proj_code] if proj_code < len(_PROJECTIONS) \
        else ""
    meta["projection"] = proj
    if proj == "Mercator" and 0 < sx < pol_r and 0 < sy < pol_r:
        lon2, _ = _vincenty_direct(clat, clon, 90.0, sx, eq_r, pol_r,
                                   flat)
        _, lat2 = _vincenty_direct(clat, clon, 0.0, sy, eq_r, pol_r,
                                   flat)

        # spherical Mercator forward on the product ellipsoid
        # (k=1, lon0=reflon); the test ellipsoid is a sphere
        def merc(lon, lat):
            x = eq_r * math.radians(lon - reflon)
            if inv_f == 0.0:
                y = eq_r * math.log(math.tan(math.pi / 4 +
                                             math.radians(lat) / 2))
            else:
                e = math.sqrt(flat * (2 - flat))
                phi = math.radians(lat)
                y = eq_r * math.log(
                    math.tan(math.pi / 4 + phi / 2) *
                    ((1 - e * math.sin(phi)) /
                     (1 + e * math.sin(phi))) ** (e / 2))
            return x, y
        x0, y0 = merc(clon, clat)
        x2, _ = merc(lon2, clat)
        _, y2 = merc(clon, lat2)
        gt = (x0 - radx * (x2 - x0), x2 - x0, 0.0,
              y0 + rady * (y2 - y0), 0.0, -(y2 - y0))
        meta["crs"] = (f"+proj=merc +lon_0={reflon} +k=1 +a={eq_r} "
                       f"+b={pol_r}")
    return np.ascontiguousarray(px), gt, -9999.0, meta
