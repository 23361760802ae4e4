"""ENVISAT (ASAR / MERIS / AATSR) product reader.

Layout (frmts/envisat/EnvisatFile.c + envisatdataset.cpp): a
1247-byte ASCII MPH of ``KEY=value`` lines (strings quoted, numbers
signed with ``<units>`` suffixes), an SPH of ``SPH_SIZE`` bytes
whose tail holds ``NUM_DSD`` dataset descriptors of ``DSD_SIZE``
bytes each (DS_NAME/DS_TYPE/FILENAME/DS_OFFSET/DS_SIZE/NUM_DSR/
DSR_SIZE); measurement datasets (DS_TYPE ``M``) are arrays of
NUM_DSR records of DSR_SIZE bytes.

Image shape follows the reference (envisatdataset.cpp:920-975):
width = SPH ``LINE_LENGTH``, height = NUM_DSR of the first
measurement dataset; dtype from ``DATA_TYPE``+``SAMPLE_TYPE``
(FLT32[/COMPLEX], UWORD, SWORD[/COMPLEX]); per-record prefix =
DSR_SIZE − itemsize·width; sample words big-endian; ATS_TOA_1
products use int16 with width (DSR_SIZE−20)/2.  Every M dataset
with the same record count/size becomes one band.  MPH/SPH keys
land in ``meta`` with MPH_/SPH_ prefixes like the reference's
metadata domains.  Level-0 source packets and the MERIS
multi-channel/flags band split are out of scope (documented)."""

from __future__ import annotations

import re

import numpy as np

__all__ = ["read_envisat"]

_MPH_SIZE = 1247

_DTYPES = {
    ("FLT32", True): np.dtype(">c8"),
    ("FLT32", False): np.dtype(">f4"),
    ("UWORD", False): np.dtype(">u2"),
    ("SWORD", True): None,  # complex int16, handled specially
    ("SWORD", False): np.dtype(">i2"),
}


def _parse_kv(text: str) -> dict:
    out = {}
    for line in text.split("\n"):
        if "=" not in line:
            continue
        key, _, val = line.partition("=")
        key = key.strip()
        if not key:
            continue
        val = val.strip()
        if val.startswith('"'):
            val = val[1:val.rfind('"')] if '"' in val[1:] else val[1:]
        else:
            val = re.sub(r"<[^>]*>\s*$", "", val).strip()
        out[key] = val
    return out


def _as_int(d: dict, key: str, default: int = 0) -> int:
    try:
        return int(d.get(key, default))
    except ValueError:
        return default


def read_envisat(path: str):
    """Open an ENVISAT .N1 product → ``(pixels, None, None, meta)``
    (multiple measurement bands stack on the last axis)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if not buf.startswith(b"PRODUCT="):
        raise ValueError("not an ENVISAT product")
    mph = _parse_kv(buf[:_MPH_SIZE].decode("ascii", "replace"))
    sph_size = _as_int(mph, "SPH_SIZE")
    num_dsd = _as_int(mph, "NUM_DSD")
    dsd_size = _as_int(mph, "DSD_SIZE")
    if sph_size <= 0:
        raise ValueError("ENVISAT: SPH_SIZE not set (level-0 products "
                         "are out of scope)")
    sph_text = buf[_MPH_SIZE:_MPH_SIZE + sph_size].decode(
        "ascii", "replace")
    dsd_text_len = num_dsd * dsd_size
    sph = _parse_kv(sph_text[:len(sph_text) - dsd_text_len]
                    if dsd_text_len < len(sph_text) else sph_text)

    datasets = []
    dsd_start = sph_size - dsd_text_len
    for i in range(num_dsd):
        chunk = sph_text[dsd_start + i * dsd_size:
                         dsd_start + (i + 1) * dsd_size]
        d = _parse_kv(chunk)
        if not d.get("DS_NAME"):
            continue
        datasets.append({
            "name": d.get("DS_NAME", "").strip(),
            "type": d.get("DS_TYPE", "").strip(),
            "offset": _as_int(d, "DS_OFFSET"),
            "size": _as_int(d, "DS_SIZE"),
            "num_dsr": _as_int(d, "NUM_DSR"),
            "dsr_size": _as_int(d, "DSR_SIZE"),
        })

    measurements = [d for d in datasets
                    if d["type"] == "M" and d["num_dsr"] > 0]
    if not measurements:
        raise ValueError("ENVISAT: no measurement dataset")
    ref = measurements[0]
    w = _as_int(sph, "LINE_LENGTH")
    h = ref["num_dsr"]
    product = mph.get("PRODUCT", "")
    data_type = sph.get("DATA_TYPE", "").strip()
    sample_type = sph.get("SAMPLE_TYPE", "").strip()
    is_complex = sample_type.upper().startswith("COMPLEX")

    dt = None
    if (data_type, is_complex) in _DTYPES:
        dt = _DTYPES[(data_type, is_complex)]
    elif product.startswith("ATS_TOA_1"):
        dt = np.dtype(">i2")
        w = (ref["dsr_size"] - 20) // 2
    elif w == 0:
        dt = np.dtype(np.uint8)
        w = ref["dsr_size"]
    elif ref["dsr_size"] >= 2 * w:
        dt = np.dtype(">u2")
    else:
        dt = np.dtype(np.uint8)

    if data_type == "SWORD" and is_complex:
        itemsize = 4
    else:
        itemsize = dt.itemsize
    prefix = ref["dsr_size"] - itemsize * w
    if w <= 0 or h <= 0 or prefix < 0:
        raise ValueError("ENVISAT: cannot determine image layout")

    bands = []
    names = []
    for d in measurements:
        if d["num_dsr"] != ref["num_dsr"] or \
                d["dsr_size"] != ref["dsr_size"]:
            continue
        recs = np.frombuffer(buf, dtype=np.uint8,
                             count=d["dsr_size"] * h,
                             offset=d["offset"]).reshape(h,
                                                         d["dsr_size"])
        payload = recs[:, prefix:prefix + itemsize * w]
        if data_type == "SWORD" and is_complex:
            iq = np.ascontiguousarray(payload).view(">i2").astype(
                np.float32).reshape(h, w, 2)
            band = (iq[:, :, 0] + 1j * iq[:, :, 1]).astype(np.complex64)
        else:
            band = np.ascontiguousarray(payload).view(dt).reshape(h, w)
            if band.dtype.byteorder == ">":
                band = band.astype(band.dtype.newbyteorder("="))
        bands.append(band)
        names.append(d["name"])

    meta = {"driver": "ENVISAT", "band_names": names,
            "datasets": [d["name"] for d in datasets]}
    for k, v in mph.items():
        meta[f"MPH_{k}"] = v
    for k, v in sph.items():
        meta[f"SPH_{k}"] = v
    px = bands[0] if len(bands) == 1 else np.stack(bands, axis=-1)
    return px, None, None, meta
