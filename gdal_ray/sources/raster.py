"""Raster driver dispatch — GDALOpen's path-based routing for rasters.

One ``read_raster(path)`` entry point returning ``(pixels, geotransform,
nodata, meta)`` for every raster format this engine reads: extension /
magic routing to the codec registry plus the path-based formats (VRT
composition, EHdr/ENVI sidecar headers, AAIGrid text, SRTM HGT
filename georeferencing, DTED). World-file and PAM sidecars fill in
georeferencing the payload cannot carry (gcore/gdaldataset.cpp open
logic + gdalpamdataset.cpp override order: PAM wins over internal,
world file fills absent geotransforms)."""

from __future__ import annotations

import os

import numpy as np

__all__ = ["read_raster", "overview_count"]


def _is_hfa(path: str) -> bool:
    with open(path, "rb") as fh:
        return fh.read(15) == b"EHFA_HEADER_TAG"


def overview_count(path: str) -> int:
    """Number of reduced-resolution levels available (internal IFD
    chain + external .ovr — gdaldefaultoverviews.cpp order)."""
    from ..codecs.overviews import read_overviews
    return len(read_overviews(path))


def _is_cpg(path: str) -> bool:
    """FindType1/2 gate (cpgdataset.cpp:274-319): a Convair PolGASP
    name pattern AND the companion .hdr/.img must exist."""
    name = os.path.basename(path)
    sirc = name.upper().endswith(("SIRC.HDR", "SIRC.IMG"))
    t1 = (("sso" in name.lower() or "polgasp" in name.lower())
          and any(p in name.lower() for p in ("hh", "hv", "vv", "vh")))
    if not (sirc or t1):
        return False
    from ..codecs.rawexotic import _cpg_adjust
    pol = "" if sirc else "hh"
    return bool(_cpg_adjust(path, pol, "hdr")
                and _cpg_adjust(path, pol, "img"))


def read_raster(path: str, overview: int | None = None):
    """Open any supported raster → (pixels (h, w[, b]), geotransform |
    None, nodata | None, meta dict).

    ``overview=k`` selects the k-th reduced-resolution level (internal
    GTiff/COG IFD chain first, then external ``<path>.ovr`` — GDAL's
    GetOverview(k) order); the returned geotransform is rescaled to
    the overview grid."""
    from .sidecar import find_pam, read_pam, read_worldfile

    if overview is not None:
        from ..codecs.overviews import read_overviews
        full_px, gt, nodata, meta = read_raster(path)
        ovs = read_overviews(path)
        if not 0 <= overview < len(ovs):
            raise ValueError(
                f"overview {overview} out of range ({len(ovs)} levels)")
        g = ovs[overview]
        px = np.asarray(g.pixels)
        if gt is not None:
            fh = full_px.shape[0] / px.shape[0]
            fw = full_px.shape[1] / px.shape[1]
            gt = (gt[0], gt[1] * fw, gt[2] * fh,
                  gt[3], gt[4] * fw, gt[5] * fh)
        nd = getattr(g, "nodata", None)
        return px, gt, nd if nd is not None else nodata, meta

    if path.startswith("DERIVED_SUBDATASET:"):
        # frmts/derived/deriveddataset.cpp: DERIVED_SUBDATASET:<ALG>:
        # <file> applies a pixel function to every band (Float64 out,
        # CFloat64 for CONJ; derivedlist.c table)
        parts = path.split(":", 2)
        if len(parts) != 3 or not parts[2]:
            raise ValueError(f"malformed derived-subdataset path {path!r}")
        alg = parts[1].upper()
        funcs = {
            "AMPLITUDE": lambda a: np.abs(a).astype(np.float64),
            "PHASE": lambda a: np.angle(
                a.astype(np.complex128)).astype(np.float64),
            "REAL": lambda a: a.real.astype(np.float64),
            "IMAG": lambda a: (a.imag if np.iscomplexobj(a)
                               else np.zeros_like(a)).astype(np.float64),
            "CONJ": lambda a: np.conj(a).astype(np.complex128),
            "INTENSITY": lambda a: (np.abs(a).astype(np.float64) ** 2),
            "LOGAMPLITUDE": lambda a: np.log10(
                np.maximum(np.abs(a).astype(np.float64), 1e-300)),
        }
        if alg not in funcs:
            raise ValueError(f"unknown derived subdataset {alg!r}")
        px, gt, nodata, meta = read_raster(parts[2])
        return funcs[alg](np.asarray(px)), gt, nodata, meta

    if path.startswith("HEIF:"):
        # HEIF:<n>:<path> subdataset syntax (heifdataset.cpp OpenHEIF)
        from ..codecs.heif import read_heif
        parts = path.split(":", 2)
        if len(parts) != 3 or not parts[1].isdigit() or not parts[2]:
            raise ValueError(f"malformed HEIF subdataset path {path!r}")
        return read_heif(parts[2], subdataset=int(parts[1]))

    if path.startswith("E57:"):
        # E57:"file":subdataset pseudo-path (e57driver.cpp Open)
        import re as _re
        from ..codecs.e57 import read_e57
        m = _re.match(r'^E57:"([^"]+)":(.+)$', path) or \
            _re.match(r"^E57:(.+):([^:]+)$", path)
        if not m:
            raise ValueError(f"malformed E57 subdataset path {path!r}")
        return read_e57(m.group(1), subdataset=m.group(2))

    ext = os.path.splitext(path)[1].lower().lstrip(".")
    gt = nodata = None
    meta: dict = {}

    _head_cache: dict = {}

    def _head(n=64):
        if os.path.isdir(path):
            return b""
        have = _head_cache.get("n", 0)
        if n > have:
            with open(path, "rb") as fh:
                _head_cache["buf"] = fh.read(max(n, 1536))
                _head_cache["n"] = max(n, 1536)
        return _head_cache["buf"][:n]

    if os.path.basename(path).upper() == "METADATA.DIM" or (
            ext == "xml" and os.path.basename(path).upper().startswith(
                ("DIM_", "VOL_"))):
        from ..codecs.dimap import decode_dimap
        px, gt, nodata, meta = decode_dimap(path)
    elif ext == "vrt":
        from .vrt import read_vrt
        v = read_vrt(path)
        px, gt, nodata = v.pixels, v.geotransform, v.nodata
        meta = dict(v.metadata)
        if v.crs:
            meta["crs"] = v.crs
    elif ext == "grd" and \
            open(path, "rb").read(4) in (b"DSAA", b"DSBB", b"DSRB"):
        from ..codecs.rawgrids import decode_surfer
        px, gt, nodata, meta = decode_surfer(open(path, "rb").read())
    elif ext in ("grd", "grc") and _head(4) == b"HGPC":
        from ..codecs.northwood import decode_nwt_grc, decode_nwt_grd
        nwbuf = open(path, "rb").read()
        dec = decode_nwt_grd if nwbuf[4:5] == b"1" else decode_nwt_grc
        px, gt, nodata, meta = dec(nwbuf)
    elif ext == "grd" and _head(3) == b"CDF":
        # GMT classic grids are plain netCDF under a .grd name
        from ..codecs.netcdf import decode_netcdf
        px, gt, nodata, meta = decode_netcdf(open(path, "rb").read())
    elif ext == "grd" and _head(1) == b"[":
        # R raster package INI header ([general]/[georeference]
        # sections in any order) + .gri payload
        from ..codecs.rawgrids import decode_rraster
        px, gt, nodata, meta = decode_rraster(path)
    elif ext in ("asc", "grd", "agr"):
        from ..codecs.aaigrid import decode_aaigrid
        px, gt, nodata = decode_aaigrid(open(path).read())
    elif ext == "ter":
        from ..codecs.rawgrids import decode_leveller, decode_terragen
        head = open(path, "rb").read(16)
        dec = decode_terragen if head.startswith(b"TERRAGEN") \
            else decode_leveller
        px, gt, nodata, meta = dec(open(path, "rb").read())
    elif ext == "bt":
        from ..codecs.rawgrids import decode_bt
        px, gt, nodata, meta = decode_bt(open(path, "rb").read())
    elif ext == "map" and open(path, "rb").read(3) == b"RUU":
        from ..codecs.rawgrids import decode_pcraster
        px, gt, nodata, meta = decode_pcraster(open(path, "rb").read())
    elif ext == "map" and b"OziExplorer Map Data File" in _head(256):
        from .ozimap import read_ozi_map
        px, gt, nodata, meta = read_ozi_map(path)
    elif ext == "ktx2" or _head(12) == b"\xabKTX 20\xbb\r\n\x1a\n":
        from ..codecs.ktx2 import read_ktx2
        px, gt, nodata, meta = read_ktx2(open(path, "rb").read())
    elif ext == "rik" or _head(6)[2:6] == b"RIK3":
        from ..codecs.rik import decode_rik
        px, gt, nodata, meta = decode_rik(open(path, "rb").read())
    elif _head(36) == b"FormatName                  : NATIVE":
        from ..codecs.msgn import read_msgn
        px, gt, nodata, meta = read_msgn(path)
    elif _head(8) == b"PRODUCT=":
        from ..codecs.envisat import read_envisat
        px, gt, nodata, meta = read_envisat(path)
    elif _head(22).upper().startswith(b"RECORD LENGTH IN BYTES"):
        from ..codecs.airsar import decode_airsar
        px, gt, nodata, meta = decode_airsar(open(path, "rb").read())
    elif ext == "hdr" and _head(18).lower() == b"time_first_datarec":
        from ..codecs.coasp import read_coasp
        px, gt, nodata, meta = read_coasp(path)
    elif os.path.basename(path).upper().startswith(("TSX1_SAR",
                                                    "TDX1_SAR")):
        from .tsx import read_tsx
        px, gt, nodata, meta = read_tsx(path)
    elif os.path.basename(path).upper().startswith("VOL-ALPSR"):
        from ..codecs.palsar import read_palsar
        px, gt, nodata, meta = read_palsar(path)
    elif ext == "cos" or _head(32)[28:32] == b"CSAR":
        from ..codecs.cosar import decode_cosar
        px, gt, nodata, meta = decode_cosar(open(path, "rb").read())
    elif ext == "gff" or _head(7).upper().startswith(b"GSATIMG"):
        from ..codecs.gff import decode_gff
        px, gt, nodata, meta = decode_gff(open(path, "rb").read())
    elif ext in ("slc", "int", "unw", "cor", "msk", "flg", "amp") \
            and os.path.exists(path + ".rsc") or \
            ext in ("dem", "hgt", "raw") and \
            os.path.exists(path + ".rsc"):
        from ..codecs.rawgrids import decode_roipac
        px, gt, nodata, meta = decode_roipac(path)
    elif ext == "hdr" and \
            b"NOHRSC" in open(path, "rb").read(64):
        from ..codecs.rawgrids import decode_snodas
        px, gt, nodata, meta = decode_snodas(path)
    elif ext in ("kap", "no1"):
        from ..codecs.bsb import decode_bsb
        px, gt, nodata, meta = decode_bsb(open(path, "rb").read())
    elif ext == "pdf":
        from ..codecs.pdf import read_pdf
        px, gt, nodata, meta = read_pdf(path)
    elif ext == "exr":
        from ..codecs.exr import read_exr
        px, gt, nodata, meta = read_exr(path)
    elif ext in ("heic", "heif", "avif"):
        from ..codecs.heif import read_heif
        px, gt, nodata, meta = read_heif(path)
    elif ext == "e57":
        from ..codecs.e57 import read_e57
        px, gt, nodata, meta = read_e57(path)
    elif ext == "cphd":
        from ..codecs.cphd import read_cphd
        cf = read_cphd(path)
        ch = next(iter(cf.channels.values()))
        px = ch.signal
        meta = dict(cf.attributes)
        meta["pvp"] = ch.pvp
    elif ext == "hgt" and not os.path.exists(path + ".rsc"):
        from ..codecs.srtmhgt import decode_hgt
        px, gt, nodata = decode_hgt(open(path, "rb").read(), path)
    elif b"ACQUISITION DATE" in _head(1536) and \
            b"SATELLITE" in _head(1536):
        from ..codecs.fast import decode_fast
        px, gt, nodata, meta = decode_fast(path)
    elif _head(24).startswith(b"BEGIN_USGS_DOQ_HEADER"):
        from ..codecs.rawexotic import decode_doq2
        px, gt, nodata, meta = decode_doq2(path)
    elif ext == "doq":
        from ..codecs.rawexotic import decode_doq1
        px, gt, nodata, meta = decode_doq1(path)
    elif ext == "mpr":
        from ..codecs.ilwis import decode_ilwis
        px, gt, nodata, meta = decode_ilwis(path)
    elif ext in ("hdr", "img") and _is_cpg(path):
        from ..codecs.rawexotic import decode_cpg
        px, gt, nodata, meta = decode_cpg(path)
    elif ext == "hdr" and b"IMAGINE_RAW_FILE" in _head(64):
        from ..codecs.rawexotic import decode_eir
        px, gt, nodata, meta = decode_eir(path)
    elif ext == "hdr" and b"IMAGE_FILE_FORMAT" in _head(256):
        from ..codecs.rawexotic import decode_mff
        px, gt, nodata, meta = decode_mff(path)
    elif ext == "b":
        from ..codecs.rawexotic import decode_noaab
        px, gt, nodata, meta = decode_noaab(open(path, "rb").read())
    elif ext == "lcp":
        from ..codecs.rawexotic import decode_lcp
        px, gt, nodata, meta = decode_lcp(open(path, "rb").read())
    elif ext == "sigdem":
        from ..codecs.rawexotic import decode_sigdem
        px, gt, nodata, meta = decode_sigdem(open(path, "rb").read())
    elif ext == "zmap" or (ext == "dat" and _head(1) in (b"!", b"@")
                           and b"GRID" in _head(512)):
        from ..codecs.rawexotic import decode_zmap
        px, gt, nodata, meta = decode_zmap(open(path,
                                                errors="replace").read())
    elif ext == "pix" and _head(6) == b"PCIDSK":
        from ..codecs.rawexotic import decode_pcidsk
        px, gt, nodata, meta = decode_pcidsk(path)
    elif ext in ("hf2", "hfz") or _head(4) == b"HF2\x00":
        from ..codecs.rawexotic import decode_hf2
        px, gt, nodata, meta = decode_hf2(open(path, "rb").read())
    elif ext == "pmtiles":
        from .pmtiles import read_pmtiles_raster
        px, gt, nodata, meta = read_pmtiles_raster(path)
    elif ext == "tpkx":
        from ..codecs.esric import decode_tpkx
        px, gt, nodata, meta = decode_tpkx(path)
    elif ext == "til":
        from ..codecs.rawexotic import decode_til
        px, gt, nodata, meta = decode_til(path)
    elif ext in ("cal", "ct1") or (b"rtype: 1" in _head(1536)
                                   and b"rpelcnt:" in _head(1536)):
        from ..codecs.cals import decode_cals
        px, gt, nodata, meta = decode_cals(open(path, "rb").read())
    elif ext == "toc" or os.path.basename(path).upper() == "A.TOC":
        from ..codecs.rpf import decode_rpftoc
        px, gt, nodata, meta = decode_rpftoc(path)
    elif len(ext) == 3 and ext[0] == "o" and ext[1] == "n" and \
            _head(4) == b"NITF":
        from ..codecs.rpf import read_rpf_frame
        px, gt, nodata, meta = read_rpf_frame(path)
    elif ext == "bag":
        from ..codecs.bag import decode_bag
        px, gt, nodata, meta = decode_bag(open(path, "rb").read())
    elif _head(8)[4:8] == b"\x3f\xc0\x12\x12" and \
            _head(28)[16:28] == b"CEOS-SAR-CCT":
        from ..codecs.sarceos import read_sar_ceos
        sar = read_sar_ceos(path)
        px = sar.pixels[0] if sar.pixels.shape[0] == 1 else \
            np.moveaxis(sar.pixels, 0, -1)
        meta = dict(sar.metadata)
        if sar.gcps:
            meta["gcps"] = sar.gcps
    elif _head(8)[4:8] == b"\x3f\xc0\x12\x12":
        from ..codecs.ceos import decode_ceos
        px, gt, nodata, meta = decode_ceos(path)
    elif ext == "l1b":
        from ..codecs.l1b import decode_l1b
        px, gt, nodata, meta = decode_l1b(path)
    elif ext == "xml" and b"esriMapCacheStorageModeCompactV2" in \
            open(path, "rb").read():
        from ..codecs.esric import decode_esric
        px, gt, nodata, meta = decode_esric(path)
    elif ext == "xml" and b"fullResolutionImageData" in _head(8192):
        from ..codecs.rs2 import decode_rs2
        px, gt, nodata, meta = decode_rs2(path)
    elif ext == "json" and b"tile_matrix_sets" in open(path, "rb").read():
        from .stacta import decode_stacta
        px, gt, nodata, meta = decode_stacta(path)
    elif ext == "json" and b"proj:transform" in open(path, "rb").read():
        from .stacta import decode_stacit
        px, gt, nodata, meta = decode_stacit(path)
    elif ext == "mrf" or _head(10) == b"<MRF_META>":
        from ..codecs.mrf import decode_mrf
        px, gt, nodata, meta = decode_mrf(path, overview=overview)
    elif ext == "lrc" or _head(10) == b"CntZImage " or _head(6) == b"Lerc2 ":
        from ..codecs.lerc import decode_lerc
        px = decode_lerc(open(path, "rb").read())
        gt, nodata, meta = None, None, {"driver": "LERC"}
    elif ext in ("gen", "thf") or (
            ext == "img" and os.path.exists(
                os.path.splitext(path)[0] + ".GEN")):
        from ..codecs.adrg import decode_adrg, decode_srp
        if ext == "img":                 # ADRG opened via the .IMG
            path = os.path.splitext(path)[0] + ".GEN"
        try:
            px, gt, nodata, meta = decode_adrg(path)
        except (ValueError, KeyError):
            px, gt, nodata, meta = decode_srp(path)
    elif ext in ("prf",) or path.lower().endswith(".x-dem"):
        from ..codecs.prf import decode_prf
        px, gt, nodata, meta = decode_prf(path)
    elif ext == "kro":
        from ..codecs.rawexotic import decode_kro
        px, gt, nodata, meta = decode_kro(open(path, "rb").read())
    elif ext == "ace2":
        from ..codecs.rawexotic import decode_ace2
        px, gt, nodata, meta = decode_ace2(path)
    elif ext == "bin" and os.path.basename(path).lower().startswith("nt_"):
        from ..codecs.rawexotic import decode_nsidcbin
        px, gt, nodata, meta = decode_nsidcbin(path)
    elif len(ext) == 2 and ext[0] == "h" and ext[1].isdigit() and \
            _head(16).startswith(b"NDF_REVISION"):
        from ..codecs.rawexotic import decode_ndf
        px, gt, nodata, meta = decode_ndf(path)
    elif os.path.exists(path + ".xml") and \
            b"<imageFile" in open(path + ".xml", "rb").read(256):
        from ..codecs.rawexotic import decode_isce
        px, gt, nodata, meta = decode_isce(path)
    elif "grid_cell" in os.path.basename(path).lower():
        from ..codecs.rawexotic import decode_ctg
        px, gt, nodata, meta = decode_ctg(path)
    elif _head(2) == b"\x1b\x00" and _head(14)[12:14] == b"\x1a\x00":
        from ..codecs.iris import decode_iris
        px, gt, nodata, meta = decode_iris(open(path, "rb").read())
    elif ext == "rsw" or ext == "mtw" or _head(4) in (
            b"RSW\x00", b"MTW\x00", b"\x00WSR", b"\x00WTM"):
        from ..codecs.rmf import decode_rmf
        px, gt, nodata, meta = decode_rmf(open(path, "rb").read())
    elif os.path.isdir(path) and \
            os.path.exists(os.path.join(path, "attrib")) and \
            os.path.exists(os.path.join(path, "image_data")):
        from ..codecs.rawexotic import decode_mff2
        px, gt, nodata, meta = decode_mff2(path)
    elif (os.path.isdir(path)
          and os.path.exists(os.path.join(path, "hdr.adf"))
          or os.path.isdir(path)
          and os.path.exists(os.path.join(path, "HDR.ADF"))
          or ext == "adf"):
        from ..codecs.aig import decode_aig
        px, gt, nodata, meta = decode_aig(path)
    elif ext == "tga":
        from ..codecs.tga import decode_tga
        px, gt, nodata, meta = decode_tga(open(path, "rb").read())
    elif ext == "dds":
        from ..codecs.dds import decode_dds
        px, gt, nodata, meta = decode_dds(open(path, "rb").read())
    elif ext in ("dt0", "dt1", "dt2"):
        from ..codecs.dted import decode_dted
        px, gt, nodata = decode_dted(open(path, "rb").read())
    elif ext in ("img", "rrd", "aux") and _is_hfa(path):
        from ..codecs.hfa import decode_hfa
        px, gt, nodata, meta = decode_hfa(path)
    elif ext in ("lbl", "img", "dat") and \
            b"PDS_VERSION_ID" in open(path, "rb").read(32768):
        from ..codecs.pds import decode_pds
        px, gt, nodata, meta = decode_pds(path)
    elif ext in ("cub", "lbl") and \
            b"IsisCube" in open(path, "rb").read(32768):
        from ..codecs.isis3 import decode_isis3
        px, gt, nodata, meta = decode_isis3(path)
    elif ext in ("cub", "lbl") and \
            b"^QUBE" in open(path, "rb").read(32768):
        from ..codecs.isis2 import decode_isis2
        px, gt, nodata, meta = decode_isis2(path)
    elif ext == "xml" and \
            b"Product_Observational" in open(path, "rb").read(32768):
        from ..codecs.pds4 import decode_pds4
        px, gt, nodata, meta = decode_pds4(path)
    elif ext in ("vic", "vicar", "img", "bin") and \
            open(path, "rb").read(8).startswith(b"LBLSIZE"):
        from ..codecs.vicar import decode_vicar
        px, gt, nodata, meta = decode_vicar(open(path, "rb").read())
    elif ext in ("ntf", "nitf", "nsf", "r0"):
        from ..codecs.nitf import decode_nitf
        px, gt, nodata, meta = decode_nitf(open(path, "rb").read())
    elif ext in ("bil", "bsq", "bip", "img", "dat", "raw"):
        from ..codecs.ehdr import decode_ehdr, decode_envi
        stem = os.path.splitext(path)[0]
        if os.path.exists(stem + ".aux") and \
                b"AuxilaryTarget" in open(stem + ".aux", "rb").read(128):
            from ..codecs.rawexotic import decode_paux
            px, gt, nodata, meta = decode_paux(path)
        else:
            hdr = None
            for cand in (stem + ".hdr", path + ".hdr"):
                if os.path.exists(cand):
                    hdr = open(cand).read()
                    break
            if hdr is None:
                raise ValueError(f"no .hdr sidecar for {path}")
            if "INTERLEAVING" in hdr and "BANDS" in hdr:
                from ..codecs.rawexotic import decode_genbin
                px, gt, nodata, meta = decode_genbin(path)
            elif "samples" in hdr.lower() and "interleave" in hdr.lower():
                px, gt = decode_envi(hdr, open(path, "rb").read())
            else:
                px, gt, nodata = decode_ehdr(hdr,
                                             open(path, "rb").read())
    elif ext in ("tif", "tiff"):
        from ..codecs.gtiff import decode_gtiff
        g = decode_gtiff(open(path, "rb").read())
        px, gt, nodata = g.pixels, g.geotransform, g.nodata
        if g.crs:
            meta["crs"] = g.crs
    elif ext in ("nc", "cdf", "nc4"):
        from ..codecs.netcdf import decode_netcdf
        px, gt, nodata, meta = decode_netcdf(open(path, "rb").read())
    elif ext in ("h5", "hdf5", "he5", "hdf"):
        # .hdf is ambiguous: HDF4 magic 0e 03 13 01 vs HDF5 \x89HDF
        if ext == "hdf" and open(path, "rb").read(4) == b"\x0e\x03\x13\x01":
            from ..codecs.hdf4 import decode_hdf4
            px, gt, nodata, meta = decode_hdf4(path)
        else:
            from ..codecs.hdf5 import decode_hdf5, load_hdf5_bytes
            h5buf = load_hdf5_bytes(path)
            try:
                from ..codecs.s100 import decode_s100
                px, gt, nodata, meta = decode_s100(h5buf)
            except ValueError:
                px, gt, nodata, meta = decode_hdf5(h5buf)
    elif ext in ("jp2", "j2k", "jpc", "jpx"):
        from ..codecs.jp2 import decode_jp2
        px, gt, nodata, meta = decode_jp2(open(path, "rb").read())
    elif ext in ("grb2", "grib2", "grb", "grib"):
        from ..codecs.grib2 import decode_grib2
        px, gt, nodata, meta = decode_grib2(open(path, "rb").read())
    elif ext in ("gsb", "gvb"):
        from ..codecs.ntv2 import decode_ntv2
        px, gt, nodata, meta = decode_ntv2(open(path, "rb").read())
    elif ext == "gtx":
        from ..codecs.rawgrids import decode_gtx
        px, gt, nodata, meta = decode_gtx(open(path, "rb").read())
    elif ext in ("lan", "gis"):
        from ..codecs.rawgrids import decode_lan
        px, gt, nodata, meta = decode_lan(open(path, "rb").read())
    elif ext == "ers":
        from ..codecs.rawgrids import decode_ers
        px, gt, nodata, meta = decode_ers(path)
    elif ext in ("sdat", "sgrd"):
        from ..codecs.rawgrids import decode_saga
        px, gt, nodata, meta = decode_saga(path)
    elif ext == "rst":
        from ..codecs.rawgrids import decode_rst
        px, gt, nodata, meta = decode_rst(path)
    elif ext == "gxf":
        from ..codecs.rawgrids import decode_gxf
        px, gt, nodata, meta = decode_gxf(open(path, "rb").read())
    elif ext in ("los", "las", "geo"):
        from ..codecs.rawgrids import decode_loslas
        px, gt, nodata, meta = decode_loslas(open(path, "rb").read(),
                                             ext)
    elif ext == "byn":
        from ..codecs.rawgrids import decode_byn
        px, gt, nodata, meta = decode_byn(open(path, "rb").read())
    elif ext == "isg":
        from ..codecs.rawgrids import decode_isg
        px, gt, nodata, meta = decode_isg(open(path, "rb").read())
    elif ext == "mem":
        from ..codecs.rawgrids import decode_jdem
        px, gt, nodata, meta = decode_jdem(open(path, "rb").read())
    elif ext == "dem":
        from ..codecs.usgsdem import decode_usgsdem
        px, gt, nodata, meta = decode_usgsdem(open(path, "rb").read())
    elif ext == "gsc":
        from ..codecs.rawgrids import decode_gsc
        px, gt, nodata, meta = decode_gsc(open(path, "rb").read())
    elif ext in ("grd", "gri"):
        from ..codecs.rawgrids import decode_rraster
        px, gt, nodata, meta = decode_rraster(path)
    elif ext == "fits":
        from ..codecs.rawgrids import decode_fits
        px, gt, nodata, meta = decode_fits(open(path, "rb").read())
    elif ext == "rl2":
        from .rasterlite2 import read_rl2
        px, gt, nodata, meta = read_rl2(path)
    elif ext == "gpkg":
        if path.lower().endswith(".gti.gpkg"):
            from .gti import decode_gti
            px, gt, nodata, meta = decode_gti(path)
        else:
            from .gpkg import read_gpkg_raster
            px, gt, nodata, meta = read_gpkg_raster(path)
    elif ext == "zarr" or os.path.isdir(path) and (
            os.path.exists(os.path.join(path, ".zarray"))
            or os.path.exists(os.path.join(path, ".zgroup"))):
        from .zarr import read_zarr
        px, gt, nodata, meta = read_zarr(path)
    else:
        # codec registry (magic sniff covers png/jpg/gif/bmp/pnm/webp/…)
        from .. import codecs as C
        px = C.decode(open(path, "rb").read(),
                      None if ext in ("", "bin") else
                      {"jpg": "jpeg"}.get(ext, ext)
                      if ext in ("png", "jpg", "jpeg", "gif", "bmp",
                                 "pnm", "pgm", "ppm", "webp") else None)

    # sidecar override order (gdalpamdataset.cpp): PAM geotransform/
    # nodata win; a world file fills a still-absent geotransform
    pam = find_pam(path)
    if pam:
        try:
            p = read_pam(pam)
        except ValueError:
            # non-PAM .aux.xml (e.g. ArcGIS GeodataXform): ignored
            # like the reference, which skips unusable sidecars
            p = None
    else:
        p = None
    if p:
        if p["geotransform"] is not None:
            gt = p["geotransform"]
        if p["srs"]:
            meta["crs"] = p["srs"]
        for b in sorted(p["bands"]):
            if p["bands"][b]["nodata"] is not None:
                nodata = p["bands"][b]["nodata"]
                break
        meta.update(p["metadata"])
    if gt is None:
        wf = read_worldfile(path)
        if wf is not None:
            gt = wf
    return np.asarray(px), gt, nodata, meta
