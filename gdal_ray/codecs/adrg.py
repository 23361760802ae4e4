"""ADRG (ARC Digitized Raster Graphics, MIL-A-89007) reader — ISO
8211 .GEN general-information file describing an .IMG pixel file of
128x128 band-sequential RGB tiles.

Reference frmts/adrg/adrgdataset.cpp: the GIN record's GEN field
carries ZNA/ARV/BRV/LSO/PSO (georeferencing), its SPR field the tile
grid (NFL x NFC of 128x128 tiles, PNC=PNL=128, BAD = .IMG name,
TIF = tile-index-map flag) and its TIM field the 1-based tile index
(0 = blank tile).  Pixels in the .IMG start after the ISO 8211 header
(raw scan for the IMG field and its space padding,
adrgdataset.cpp:697-739) as tile-sequential R,G,B planes of 128x128
bytes.  Geotransform per ZNA: 9/18 are the north/south polar ARC
zones on an authalic sphere (azimuthal equidistant, meters), anything
else is geographic degrees (adrgdataset.cpp:762-816).  A .THF
transmission header's TFN records list the .GEN files (VFF subfields).
"""

from __future__ import annotations

import math
import os

import numpy as np

from ..sources.iso8211 import read_8211_typed

_TILE = 128


def _angle(s: str, lon: bool) -> float:
    """ADRG +DDDMMSS.SS / +DDMMSS.SS packed angle."""
    sign = -1.0 if s[0] == "-" else 1.0
    s = s[1:]
    nd = 3 if lon else 2
    return sign * (float(s[:nd]) + float(s[nd:nd + 2]) / 60.0
                   + float(s[nd + 2:nd + 7]) / 3600.0)


def _img_data_offset(img: bytes) -> int:
    """Raw scan for the IMG field's pixel-data start, replicating
    adrgdataset.cpp:697-739 byte-for-byte."""
    p = img.find(b"\x1eIMG")
    if p < 0:
        raise ValueError("ADRG .IMG: no IMG field found")
    j = p + 7
    while j < len(img) and img[j:j + 1] == b" ":
        j += 1
    return j + 1


def _gin_record(gen_buf: bytes, want_bad: str | None = None):
    """First GIN record (optionally matching SPR.BAD == want_bad)."""
    for rec in read_8211_typed(gen_buf):
        d = {t: v for t, v in rec}
        rty = d.get("001", [{}])[0].get("RTY", "")
        if rty != "GIN":
            continue
        spr = d.get("SPR", [{}])[0]
        bad = spr.get("BAD", "").split(" ")[0]
        if want_bad and bad.upper() != want_bad.upper():
            continue
        return d
    return None


def _zna_polar(zna: int, arv: int, lso: float, pso: float):
    scale = 40075016.68558 / arv
    if zna == 9:                        # north polar
        x0 = 111319.4907933 * (90.0 - pso) * math.sin(math.radians(lso))
        y0 = -111319.4907933 * (90.0 - pso) * math.cos(math.radians(lso))
    else:                               # 18 = south polar
        x0 = 111319.4907933 * (90.0 + pso) * math.sin(math.radians(lso))
        y0 = 111319.4907933 * (90.0 + pso) * math.cos(math.radians(lso))
    return (x0, scale, 0.0, y0, 0.0, -scale)


def decode_adrg(path: str, img_path: str | None = None):
    """-> (pixels (h, w, 3) uint8, geotransform, None, meta).

    ``path`` may be the .GEN file or a .THF transmission header (first
    GEN listed is used); ``img_path`` overrides the SPR.BAD pairing.
    """
    if path.upper().endswith(".THF"):
        gen = _gen_from_thf(path)
        if gen is None:
            raise ValueError("ADRG .THF lists no .GEN file")
        path = gen
    gen_buf = open(path, "rb").read()
    want = os.path.basename(img_path) if img_path else None
    d = _gin_record(gen_buf, want)
    if d is None:
        raise ValueError("ADRG: no matching GIN record in .GEN")
    gen = d.get("GEN", [{}])[0]
    spr = d.get("SPR", [{}])[0]
    if gen.get("STR") != 3:
        raise ValueError("ADRG: GEN.STR != 3")
    zna = gen.get("ZNA", 0)
    arv, brv = gen.get("ARV", 0), gen.get("BRV", 0)
    if arv <= 0 or (zna not in (9, 18) and brv <= 0):
        raise ValueError("ADRG: bad ARV/BRV")
    lso = _angle(gen["LSO"], lon=True)
    pso = _angle(gen["PSO"], lon=False)
    nfl, nfc = spr.get("NFL", 0), spr.get("NFC", 0)
    if spr.get("PNC") != _TILE or spr.get("PNL") != _TILE:
        raise ValueError("ADRG: only 128x128 tiles are defined")
    if not (0 < nfl < 32768 and 0 < nfc < 32768):
        raise ValueError("ADRG: bad NFL/NFC")
    tile_index = None
    if spr.get("TIF", "N").startswith("Y"):
        tim = d.get("TIM", [])
        tile_index = [g.get("TSI", 0) for g in tim]
        if len(tile_index) != nfl * nfc:
            raise ValueError("ADRG: TIM size mismatch")
    if img_path is None:
        bad = spr.get("BAD", "").split(" ")[0]
        img_path = os.path.join(os.path.dirname(path), bad)
        if not os.path.exists(img_path):
            low = os.path.join(os.path.dirname(path), bad.lower())
            if os.path.exists(low):
                img_path = low
    img = open(img_path, "rb").read()
    off = _img_data_offset(img)

    px = np.zeros((nfl * _TILE, nfc * _TILE, 3), np.uint8)
    tsz = _TILE * _TILE
    for blk in range(nfl * nfc):
        if tile_index is not None:
            ti = tile_index[blk]
            if ti <= 0:
                continue
            base = off + (ti - 1) * tsz * 3
        else:
            base = off + blk * tsz * 3
        by, bx = divmod(blk, nfc)
        for b in range(3):
            tile = np.frombuffer(img, np.uint8, tsz,
                                 base + b * tsz).reshape(_TILE, _TILE)
            px[by * _TILE:(by + 1) * _TILE,
               bx * _TILE:(bx + 1) * _TILE, b] = tile

    if zna in (9, 18):
        gt = _zna_polar(zna, arv, lso, pso)
        crs = f"ARC_System_Zone_{zna:02d}"
    else:
        gt = (lso, 360.0 / arv, 0.0, pso, 0.0, -360.0 / brv)
        crs = "EPSG:4326"
    dsi = d.get("DSI", [{}])[0]
    meta = {"driver": "ADRG", "crs": crs,
            "ADRG_SCA": gen.get("SCA"), "ADRG_ZNA": zna,
            "ADRG_NAM": dsi.get("NAM", "")}
    return px, gt, None, meta


def _gen_from_thf(path: str) -> str | None:
    """First .GEN filename from a .THF's TFN records (VFF subfields),
    adrgdataset.cpp GetGENListFromTHF."""
    buf = open(path, "rb").read()
    for rec in read_8211_typed(buf):
        d = {t: v for t, v in rec}
        if d.get("001", [{}])[0].get("RTY", "") != "TFN":
            continue
        for tag, groups in rec:
            if tag != "VFF":
                continue
            for g in groups:
                name = next(iter(g.values()), "")
                if isinstance(name, str):
                    name = name.split(" ")[0].split("\x1f")[0]
                    if name.upper().endswith(".GEN"):
                        cand = os.path.join(os.path.dirname(path),
                                            os.path.basename(name))
                        if os.path.exists(cand):
                            return cand
    return None


# ------------------------------------------------------------------- SRP
def _srp_rle(data: bytes, pcb: int) -> np.ndarray:
    """SRP PCB=4/8 run-length decode of one 128x128 tile
    (srpdataset.cpp:239-317): PCB=8 is (count, value) byte pairs;
    PCB=4 packs 4-bit counts with the odd half-byte discarded at each
    128-pixel row boundary."""
    out = np.zeros(_TILE * _TILE, np.uint8)
    i = 0
    ip = 0
    half = False
    n = len(data)
    total = _TILE * _TILE
    while ip < total:
        if i + 2 > n:
            raise ValueError("SRP: out of data decoding tile")
        if pcb == 8:
            cnt = data[i]
            val = data[i + 1]
            i += 2
        else:
            if (ip % _TILE) == 0 and half:
                i += 1
                half = False
                continue
            if half:
                cnt = data[i] & 0xF
                val = data[i + 1]
                i += 2
                half = False
            else:
                cnt = data[i] >> 4
                val = ((data[i] & 0xF) << 4) + (data[i + 1] >> 4)
                half = True
                i += 1
        if ip + cnt > total:
            raise ValueError("SRP: too much data decoding tile")
        out[ip:ip + cnt] = val
        ip += cnt
    return out.reshape(_TILE, _TILE)


def _srp_img_offset(img: bytes) -> int:
    """srpdataset.cpp:609-655: data starts after the first field
    terminator following the IMG directory entry."""
    p = img.find(b"\x1eIMG")
    if p < 0:
        raise ValueError("SRP .IMG: no IMG field found")
    q = img.index(b"\x1e", p + 7)
    return q + 1


def decode_srp(path: str, img_path: str | None = None):
    """ASRP/USRP (Standard Raster Product) reader -> (pixels (h, w)
    uint8 palette indexes, geotransform, None, meta with color_table).

    USRP georeferencing is projected meters straight from GEN LSO/PSO/
    LOD/LAD with a UTM/UPS zone from ZNA; ASRP is arc-seconds over
    WGS84 or the two polar ARC zones (srpdataset.cpp:383-439,787-836).
    """
    if path.upper().endswith(".THF"):
        gen = _gen_from_thf(path) or _srp_gen_from_thf(path)
        if gen is None:
            raise ValueError("SRP .THF lists no .GEN file")
        path = gen
    gen_buf = open(path, "rb").read()
    want = os.path.basename(img_path).upper() if img_path else None
    rec = None
    for r in read_8211_typed(gen_buf):
        d = {t: v for t, v in r}
        if d.get("001", [{}])[0].get("RTY", "") != "GIN":
            continue
        prt = str(d.get("DSI", [{}])[0].get("PRT", ""))[:4].upper()
        if prt not in ("ASRP", "USRP"):
            continue
        bad = d.get("SPR", [{}])[0].get("BAD", "").split(" ")[0]
        if want and bad.upper() != want:
            continue
        rec = d
        break
    if rec is None:
        raise ValueError("SRP: no ASRP/USRP GIN record in .GEN")
    dsi = rec["DSI"][0]
    prt = str(dsi.get("PRT", ""))[:4].upper()
    gen = rec.get("GEN", [{}])[0]
    spr = rec.get("SPR", [{}])[0]
    if gen.get("STR") != 4:
        raise ValueError("SRP: GEN.STR != 4")
    zna = int(gen.get("ZNA", 0) or 0)
    lso = float(gen.get("LSO", 0.0) or 0.0)
    pso = float(gen.get("PSO", 0.0) or 0.0)
    lod = float(gen.get("LOD", 0.0) or 0.0)
    lad = float(gen.get("LAD", 0.0) or 0.0)
    arv = int(gen.get("ARV", 0) or 0)
    brv = int(gen.get("BRV", 0) or 0)
    nfl, nfc = spr.get("NFL", 0), spr.get("NFC", 0)
    if spr.get("PNC") != _TILE or spr.get("PNL") != _TILE:
        raise ValueError("SRP: only 128x128 tiles are defined")
    pcb = int(spr.get("PCB", 0) or 0)
    pvb = int(spr.get("PVB", 8) or 8)
    if pcb not in (0, 4, 8) or pvb != 8:
        raise ValueError(f"SRP: unsupported PCB={pcb}/PVB={pvb}")
    tile_index = None
    if str(spr.get("TIF", "N")).startswith("Y"):
        tile_index = [g.get("TSI", 0) for g in rec.get("TIM", [])]
        if len(tile_index) != nfl * nfc:
            raise ValueError("SRP: TIM size mismatch")
    if img_path is None:
        bad = spr.get("BAD", "").split(" ")[0]
        img_path = os.path.join(os.path.dirname(path), bad)
        if not os.path.exists(img_path):
            low = os.path.join(os.path.dirname(path), bad.lower())
            if os.path.exists(low):
                img_path = low
    img = open(img_path, "rb").read()
    off = _srp_img_offset(img)

    px = np.zeros((nfl * _TILE, nfc * _TILE), np.uint8)
    tsz = _TILE * _TILE
    for blk in range(nfl * nfc):
        if tile_index is not None:
            ti = tile_index[blk]
            if ti <= 0:
                continue
            base = off + (ti - 1) * (tsz if pcb == 0 else 1)
        else:
            base = off + blk * tsz
        by, bx = divmod(blk, nfc)
        if pcb == 0:
            tile = np.frombuffer(img, np.uint8, tsz,
                                 base).reshape(_TILE, _TILE)
        else:
            tile = _srp_rle(img[base:base + tsz * 2], pcb)
        px[by * _TILE:(by + 1) * _TILE, bx * _TILE:(bx + 1) * _TILE] = tile

    if prt == "ASRP":
        if zna == 9:
            gt = (111319.4907933 * (90.0 - pso / 3600.0)
                  * math.sin(lso * math.pi / 648000.0),
                  40075016.68558 / arv, 0.0,
                  -111319.4907933 * (90.0 - pso / 3600.0)
                  * math.cos(lso * math.pi / 648000.0),
                  0.0, -40075016.68558 / arv)
            crs = "ARC_System_Zone_09"
        elif zna == 18:
            gt = (111319.4907933 * (90.0 + pso / 3600.0)
                  * math.sin(lso * math.pi / 648000.0),
                  40075016.68558 / arv, 0.0,
                  111319.4907933 * (90.0 + pso / 3600.0)
                  * math.cos(lso * math.pi / 648000.0),
                  0.0, -40075016.68558 / arv)
            crs = "ARC_System_Zone_18"
        else:
            gt = (lso / 3600.0, 360.0 / arv, 0.0,
                  pso / 3600.0, 0.0, -360.0 / brv)
            crs = "EPSG:4326"
    else:
        gt = (lso, lod, 0.0, pso, 0.0, -lad)
        if zna == 61:
            crs = "EPSG:32661"
        elif zna == -61:
            crs = "EPSG:32761"
        elif 0 < zna <= 60:
            crs = f"EPSG:{32600 + zna}"
        elif -60 <= zna < 0:
            crs = f"EPSG:{32700 - zna}"
        else:
            crs = None

    meta = {"driver": "SRP", "crs": crs,
            "SRP_NAM": str(dsi.get("NAM", "")).strip(),
            "SRP_PRODUCT": prt,
            "SRP_SCA": int(gen.get("SCA", 0) or 0),
            "SRP_ZNA": zna,
            "SRP_PSP": "%3.1f" % float(gen.get("PSP", 0.0) or 0.0)}
    _srp_qal(path, meta)
    return px, gt, None, meta


def _srp_qal(gen_path: str, meta: dict):
    """Color table + quality metadata from the sibling .QAL file
    (srpdataset.cpp:682-778)."""
    base = os.path.splitext(gen_path)[0]
    qal = None
    for ext in (".QAL", ".qal"):
        if os.path.exists(base + ext):
            qal = base + ext
            break
    if qal is None:
        return
    ct = {}
    for r in read_8211_typed(open(qal, "rb").read()):
        for tag, groups in r:
            if tag == "COL":
                for g in groups[:256]:
                    ccd = g.get("CCD")
                    if isinstance(ccd, int) and 0 <= ccd <= 255:
                        ct[ccd] = (g.get("NSR", 0), g.get("NSG", 0),
                                   g.get("NSB", 0))
            elif tag == "QUV":
                edn = g_int(groups[0].get("EDN"))
                meta["SRP_EDN"] = edn
                for key, f1, f2 in (("SRP_CREATIONDATE", "CDV07", "DAT1"),
                                    ("SRP_REVISIONDATE", "CDV24", "DAT2")):
                    v = groups[0].get(f1)
                    if v is not None:
                        meta[key] = str(v)
                    else:
                        dat = str(groups[0].get(f2, ""))
                        if len(dat) >= 12:
                            meta[key] = dat[4:12]
            elif tag == "QSR":
                qss = groups[0].get("QSS")
                if qss is not None:
                    meta["SRP_CLASSIFICATION"] = str(qss)
    if ct:
        n = max(ct) + 1
        meta["color_table"] = [ct.get(i, (0, 0, 0)) for i in range(n)]


def g_int(v) -> int:
    try:
        return int(str(v).strip() or 0)
    except (TypeError, ValueError):
        return 0


def _srp_gen_from_thf(path: str) -> str | None:
    """SRP-style THF: the FDR record names the dataset (NAM); the
    matching {NAM}*.GEN in the same directory is the dataset
    (srpdataset.cpp OpenDataset THF branch)."""
    dirname = os.path.dirname(path) or "."
    nams = []
    for rec in read_8211_typed(open(path, "rb").read()):
        for tag, groups in rec:
            if tag == "FDR":
                nam = str(groups[0].get("NAM", "")).strip()
                if nam:
                    nams.append(nam.upper())
    gens = sorted(f for f in os.listdir(dirname)
                  if f.upper().endswith(".GEN"))
    for f in gens:
        for nam in nams:
            if f.upper().startswith(nam):
                return os.path.join(dirname, f)
    if len(gens) == 1:
        return os.path.join(dirname, gens[0])
    return None
