"""COASP (DRDC Configurable Airborne SAR Processor) reader.

Layout (frmts/coasp/coasp_dataset.cpp): a ``.hdr`` text file of
``key value`` lines beginning with ``time_first_datarec``;
``number_lines`` / ``number_samples`` give the shape.  The header's
base name minus its trailing character, with the polarization
substring (hh/hv/vh/vv) substituted, names the per-channel ``.rc``
payloads — big-endian complex float32 (4-byte I, 4-byte Q) scanline
rasters (:300-321).  Channels load in HH, HV, VH, VV order;
``georef_grid`` lines become (pixel, line, lon, lat) GCPs."""

from __future__ import annotations

import os

import numpy as np

__all__ = ["read_coasp", "identify_coasp"]


def identify_coasp(path: str) -> bool:
    try:
        with open(path, "rb") as fh:
            return fh.read(18).lower() == b"time_first_datarec"
    except OSError:
        return False


def read_coasp(path: str):
    if not identify_coasp(path):
        raise ValueError("not a COASP header file")
    md = {}
    gcps = []
    with open(path, errors="replace") as fh:
        for line in fh:
            parts = line.split(None, 1)
            if not parts:
                continue
            key = parts[0]
            val = parts[1].strip() if len(parts) > 1 else ""
            if key == "georef_grid":
                toks = val.split()
                if len(toks) >= 4:
                    try:
                        gcps.append((float(toks[0]), float(toks[1]),
                                     float(toks[2]), float(toks[3])))
                    except ValueError:
                        pass
            else:
                md[key] = val
    h = int(md.get("number_lines", 0))
    w = int(md.get("number_samples", 0))
    if h <= 0 or w <= 0:
        raise ValueError("COASP: missing number_lines/number_samples")

    base = os.path.basename(path)
    stem = os.path.splitext(base)[0][:-1]  # drop the trailing char
    d = os.path.dirname(path) or "."
    chan_pos = -1
    for pol in ("hh", "hv", "vh", "vv"):
        idx = stem.find(pol)
        if idx >= 0:
            chan_pos = idx
            break
    if chan_pos < 0:
        raise ValueError("COASP: no polarization substring in name")

    bands = []
    pols = []
    for pol in ("hh", "hv", "vh", "vv"):
        name = stem[:chan_pos] + pol + stem[chan_pos + 2:]
        rc = os.path.join(d, name + ".rc")
        if not os.path.exists(rc):
            continue
        raw = np.fromfile(rc, dtype=">f4", count=h * w * 2)
        if raw.size < h * w * 2:
            continue
        iq = raw.astype(np.float32).reshape(h, w, 2)
        bands.append((iq[:, :, 0] + 1j * iq[:, :, 1]).astype(
            np.complex64))
        pols.append(pol.upper())
    if not bands:
        raise ValueError("COASP: no .rc channel files found")

    meta = {"driver": "COASP", "polarizations": pols}
    meta.update({k: v for k, v in md.items() if v})
    if gcps:
        # georef_grid lines carry (pixel, line, lat, lon)
        meta["gcps"] = [(px_, ln, lon, lat, 0.0)
                        for px_, ln, lat, lon in gcps]
    px = bands[0] if len(bands) == 1 else np.stack(bands, axis=-1)
    return px, None, None, meta
