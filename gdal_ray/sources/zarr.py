"""Zarr v2 reader — cloud-native chunked arrays (frmts/zarr analog).

Reference: frmts/zarr/ (GDAL's driver). Zarr v2 is pure structure: a
directory with ``.zarray`` JSON metadata (shape/chunks/dtype/
compressor/filters/order/fill_value) and one file per chunk
("i.j" keys, or "i/j" with dimension_separator="/"). Supported here:
zlib/gzip/lzma compression (and raw), blosc containers and numcodecs
lz4 through the own codec in ``codecs/lz4.py``, zstd through the own
RFC 8878 decoder in ``codecs/zstd.py`` (blosc-side snappy too), C/F
order, delta / fixedscaleoffset / shuffle / quantize filters,
missing chunks → fill_value, groups with the CF model
(_ARRAY_DIMENSIONS + x/y coordinate vars + grid_mapping
GeoTransform — the same conventions the netCDF path resolves).
Blosc bit-shuffle and blosclz payloads fail fast by name.

Goldens (tests/test_zarr.py): the reference's own autotest fixtures —
byte_cf1.zarr decodes to byte.tif's raster (checksum 4672) with its
UTM geotransform; zlib/gzip/delta/endian fixtures round-trip their
generate_test_files.py definitions.
"""

from __future__ import annotations

import json
import os
import zlib as _zlib

import numpy as np


def _load_json(path: str):
    raw = open(path).read()
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        # GDAL's parser tolerates single-quoted strings (the
        # array_attrs fixture); normalize and retry
        return json.loads(raw.replace("'", '"'))


def _dtype_of(dtm):
    if isinstance(dtm, list):          # compound (possibly nested)
        return np.dtype([(m[0], _dtype_of(m[1])) for m in dtm])
    if isinstance(dtm, str) and dtm.startswith("!"):
        # '!' byte-order marker (fixture variant): native semantics
        dtm = "|" + dtm[1:]
    return np.dtype(dtm)


def _decompress(raw: bytes, comp: dict | None) -> bytes:
    if comp is None:
        return raw
    cid = comp.get("id")
    if cid == "zlib":
        return _zlib.decompress(raw)
    if cid == "gzip":
        import gzip
        return gzip.decompress(raw)
    if cid == "lzma":
        import lzma
        return lzma.decompress(raw)
    if cid == "blosc":
        from ..codecs.lz4 import blosc_decompress
        return blosc_decompress(raw)
    if cid == "lz4":
        from ..codecs.lz4 import numcodecs_lz4_decode
        return numcodecs_lz4_decode(raw)
    if cid == "zstd":
        from ..codecs.zstd import zstd_decompress
        return zstd_decompress(raw)
    raise ValueError(f"zarr compressor {cid!r} unsupported "
                     "(no codec library in this environment)")


def _apply_filters(arr: np.ndarray, filters) -> np.ndarray:
    """Decode-side filter chain (applied in reverse declaration
    order, numcodecs semantics)."""
    for f in reversed(filters or []):
        fid = f.get("id")
        if fid == "delta":
            out_dt = np.dtype(f.get("dtype", arr.dtype))
            arr = np.cumsum(arr.astype(np.int64), dtype=np.int64) \
                .astype(out_dt)
        elif fid == "fixedscaleoffset":
            scale = float(f["scale"])
            offset = float(f["offset"])
            out_dt = np.dtype(f.get("dtype", "<f8"))
            arr = (arr.astype(np.float64) / scale + offset).astype(out_dt)
        elif fid == "shuffle":
            es = int(f.get("elementsize", 1))
            b = arr.view(np.uint8)
            if es > 1 and b.size % es == 0:
                arr = np.ascontiguousarray(
                    b.reshape(es, -1).T).view(arr.dtype)
        elif fid in ("quantize", "bitround"):
            pass                      # lossy pre-rounding: decode = id
        else:
            raise ValueError(f"zarr filter {fid!r} unsupported")
    return arr


def _nodata_of(attrs: dict):
    """Band nodata: the '_FillValue' attr, else the parsed .zarray/
    zarr.json fill_value (the reference zarr driver exposes
    fill_value as NoData when no _FillValue attr is present)."""
    nd = attrs.get("_FillValue")
    return nd if nd is not None else attrs.get("_zarr_fill_value")


def read_zarr_array(path: str) -> tuple[np.ndarray, dict]:
    """One Zarr v2 array directory → (ndarray, attrs)."""
    meta = _load_json(os.path.join(path, ".zarray"))
    if meta.get("zarr_format") != 2:
        raise ValueError(f"zarr format {meta.get('zarr_format')} "
                         "unsupported (v2 only)")
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dt = _dtype_of(meta["dtype"])
    order = meta.get("order", "C")
    comp = meta.get("compressor")
    filters = meta.get("filters")
    fill = meta.get("fill_value", 0)
    sep = meta.get("dimension_separator", ".")
    attrs = {}
    za = os.path.join(path, ".zattrs")
    if os.path.exists(za):
        attrs = _load_json(za)

    # storage dtype differs from logical dtype when filters re-type
    store_dt = dt
    if filters:
        # first filter in declaration order encodes FROM the logical
        # dtype; the stored dtype is the LAST filter's astype
        last = filters[-1]
        store_dt = np.dtype(last.get("astype", last.get("dtype", dt)))
        dt = np.dtype(filters[0].get("dtype", dt))
    if not shape:                      # 0-d scalar array
        shape = (1,)
        chunks = (1,)

    had_fill = meta.get("fill_value") is not None
    if fill is None:
        fill = 0
    if dt.kind in "fc" and isinstance(fill, str):
        fill = {"NaN": np.nan, "Infinity": np.inf,
                "-Infinity": -np.inf}.get(fill, np.nan)
    if had_fill and dt.kind != "V":
        # the .zarray fill_value fills missing chunks: surface it so
        # callers can fall back to it as nodata when no _FillValue
        # attr exists (the reference zarr driver reports it as the
        # band NoData)
        attrs.setdefault("_zarr_fill_value", fill)
    if dt.kind == "V":                 # compound: base64 fill → zeros
        out = np.zeros(shape, dt)
    else:
        out = np.full(shape, fill, dt)

    grid = [-(-s // c) for s, c in zip(shape, chunks)]
    n_elem = int(np.prod(chunks))
    for idx in np.ndindex(*grid) if grid else [()]:
        key = sep.join(str(i) for i in idx) if idx else "0"
        f = os.path.join(path, key)
        if not os.path.exists(f):
            continue
        raw = _decompress(open(f, "rb").read(), comp)
        chunk = np.frombuffer(raw, store_dt, count=n_elem)
        chunk = _apply_filters(chunk, filters)
        chunk = chunk.reshape(chunks, order=order)
        sl_out, sl_in = [], []
        for d, i in enumerate(idx):
            o0 = i * chunks[d]
            take = min(chunks[d], shape[d] - o0)
            sl_out.append(slice(o0, o0 + take))
            sl_in.append(slice(0, take))
        out[tuple(sl_out)] = chunk[tuple(sl_in)]
    return out, attrs


def list_zarr_arrays(path: str) -> list[str]:
    out = []
    for name in sorted(os.listdir(path)):
        sub = os.path.join(path, name)
        if os.path.isdir(sub):
            if os.path.exists(os.path.join(sub, ".zarray")):
                out.append(name)
            elif os.path.exists(os.path.join(sub, ".zgroup")):
                out.extend(f"{name}/{s}" for s in list_zarr_arrays(sub))
    return out


def read_zarr(path: str, array: str | None = None):
    """Zarr store → (pixels, geotransform | None, nodata | None,
    meta) — single arrays directly; groups via the CF model (largest
    ≥2-D array, x/y coordinate vars, grid_mapping GeoTransform), like
    the netCDF-4 path."""
    if os.path.exists(os.path.join(path, "zarr.json")):
        return read_zarr_v3(path, array)
    if os.path.exists(os.path.join(path, ".zarray")):
        px, attrs = read_zarr_array(path)
        meta = dict(attrs)
        nd = _nodata_of(attrs)
        return px, None, nd, meta
    if not os.path.exists(os.path.join(path, ".zgroup")):
        raise ValueError(f"{path} is not a zarr array or group")
    names = list_zarr_arrays(path)
    if not names:
        raise ValueError("zarr group has no arrays")
    if array is not None:
        if array not in names:
            raise ValueError(f"array {array!r} not in {names}")
        key = array
    else:
        best, best_n = None, -1
        datas = {}
        for n in names:
            m = _load_json(os.path.join(path, n, ".zarray"))
            sz = int(np.prod(m["shape"]))
            datas[n] = (len(m["shape"]), sz)
            if len(m["shape"]) >= 2 and sz > best_n:
                best, best_n = n, sz
        key = best if best is not None else names[0]
    px, attrs = read_zarr_array(os.path.join(path, key))
    meta = dict(attrs)
    meta["zarr_array"] = key
    if px.ndim < 2:
        return px, None, _nodata_of(attrs), meta
    if px.ndim > 2:
        px = px.reshape(-1, *px.shape[-2:]).transpose(1, 2, 0)
        if px.shape[2] == 1:
            px = px[:, :, 0]
    nodata = _nodata_of(attrs)
    gt = None
    gm = attrs.get("grid_mapping")
    if isinstance(gm, str) and os.path.isdir(os.path.join(path, gm)):
        _, gm_attrs = read_zarr_array(os.path.join(path, gm))
        if gm_attrs.get("GeoTransform"):
            parts = str(gm_attrs["GeoTransform"]).split()
            if len(parts) >= 6:
                gt = tuple(float(v) for v in parts[:6])
        if gm_attrs.get("spatial_ref"):
            meta["spatial_ref"] = str(gm_attrs["spatial_ref"])
    if gt is None:
        # coordinate vars named by _ARRAY_DIMENSIONS / x & y
        def coord(names_want, length):
            for n in names:
                if n.rsplit("/", 1)[-1].lower() in names_want:
                    v, _ = read_zarr_array(os.path.join(path, n))
                    if v.ndim == 1 and len(v) == length:
                        return v.astype(np.float64)
            return None
        xs = coord(("x", "lon", "longitude"), px.shape[1])
        ys = coord(("y", "lat", "latitude"), px.shape[0])
        if xs is not None and ys is not None and len(xs) > 1 \
                and len(ys) > 1:
            dx = float(xs[1] - xs[0])
            dy = abs(float(ys[1] - ys[0]))
            gt = (float(xs[0]) - dx / 2, dx, 0.0,
                  float(ys.max()) + dy / 2, 0.0, -dy)
            if ys[1] > ys[0]:
                px = px[::-1].copy()
                meta["bottom_up"] = True
    return px, gt, nodata, meta


# ---------------------------------------------------------------------------
# Zarr v3 (zarr.json metadata, c/-prefixed chunk keys, codec chains)
# ---------------------------------------------------------------------------

_V3_DTYPES = {
    "bool": "|b1", "int8": "|i1", "uint8": "|u1",
    "int16": "<i2", "uint16": "<u2", "int32": "<i4", "uint32": "<u4",
    "int64": "<i8", "uint64": "<u8",
    "float16": "<f2", "float32": "<f4", "float64": "<f8",
    "complex64": "<c8", "complex128": "<c16",
}


def _read_v3_array(path: str):
    meta = _load_json(os.path.join(path, "zarr.json"))
    if meta.get("node_type") != "array":
        raise ValueError("not a zarr v3 array")
    shape = tuple(meta["shape"])
    cg = meta["chunk_grid"]
    if cg.get("name") != "regular":
        raise ValueError(f"zarr v3 chunk grid {cg.get('name')!r} "
                         "unsupported")
    chunks = tuple(cg["configuration"]["chunk_shape"])
    dt_name = meta["data_type"]
    if not isinstance(dt_name, str) or dt_name not in _V3_DTYPES:
        raise ValueError(f"zarr v3 data type {dt_name!r} unsupported")
    dt = np.dtype(_V3_DTYPES[dt_name])
    sep = meta.get("chunk_key_encoding", {}).get(
        "configuration", {}).get("separator", "/")
    codecs = meta.get("codecs", [{"name": "bytes"}])
    order = "C"
    endian = "<"
    comp = None
    for c in codecs:
        name = c.get("name")
        if name == "bytes":
            endian = {"little": "<", "big": ">"}.get(
                c.get("configuration", {}).get("endian", "little"), "<")
        elif name == "transpose":
            ord_cfg = c.get("configuration", {}).get("order")
            if ord_cfg == "F" or (isinstance(ord_cfg, list)
                                  and ord_cfg == list(
                                      range(len(shape) - 1, -1, -1))):
                order = "F"
        elif name == "gzip":
            comp = {"id": "gzip"}
        elif name == "zlib":
            comp = {"id": "zlib"}
        elif name == "blosc":
            comp = {"id": "blosc"}
        elif name == "lz4":
            comp = {"id": "lz4"}
        elif name == "zstd":
            comp = {"id": "zstd"}
        else:
            raise ValueError(f"zarr v3 codec {name!r} unsupported")
    if dt.itemsize > 1:
        dt = dt.newbyteorder(endian)
    fill = meta.get("fill_value", 0)
    if dt.kind in "fc" and isinstance(fill, str):
        fill = {"NaN": np.nan, "Infinity": np.inf,
                "-Infinity": -np.inf}.get(fill, np.nan)
    if meta.get("fill_value") is not None:
        attrs = meta.get("attributes") or {}
        attrs.setdefault("_zarr_fill_value", fill)
        meta["attributes"] = attrs
    out = np.full(shape if shape else (1,), fill, dt)
    chunks = chunks if shape else (1,)
    grid = [-(-s // c) for s, c in zip(shape, chunks)]
    n_elem = int(np.prod(chunks))
    for idx in np.ndindex(*grid) if grid else [()]:
        key = os.path.join(path, "c" + sep
                           + sep.join(str(i) for i in idx)) \
            if idx else os.path.join(path, "c")
        if not os.path.exists(key):
            continue
        raw = _decompress(open(key, "rb").read(), comp)
        chunk = np.frombuffer(raw, dt, count=n_elem).reshape(
            chunks, order=order)
        sl_out, sl_in = [], []
        for d, i in enumerate(idx):
            o0 = i * chunks[d]
            take = min(chunks[d], shape[d] - o0)
            sl_out.append(slice(o0, o0 + take))
            sl_in.append(slice(0, take))
        out[tuple(sl_out)] = chunk[tuple(sl_in)]
    return out, meta.get("attributes", {})


def _list_v3_arrays(path: str, prefix: str = "") -> list[str]:
    out = []
    for name in sorted(os.listdir(path)):
        sub = os.path.join(path, name)
        zj = os.path.join(sub, "zarr.json")
        if os.path.isdir(sub) and os.path.exists(zj):
            m = _load_json(zj)
            if m.get("node_type") == "array":
                out.append(prefix + name)
            elif m.get("node_type") == "group":
                out.extend(_list_v3_arrays(sub, prefix + name + "/"))
    return out


def read_zarr_v3(path: str, array: str | None = None):
    meta = _load_json(os.path.join(path, "zarr.json"))
    if meta.get("node_type") == "array":
        px, attrs = _read_v3_array(path)
        return px, None, _nodata_of(attrs), dict(attrs)
    names = _list_v3_arrays(path)
    if not names:
        raise ValueError("zarr v3 group has no arrays")
    if array is not None:
        key = array
    else:
        key = max(names, key=lambda n: int(np.prod(
            _load_json(os.path.join(path, n, "zarr.json"))["shape"]))
            if len(_load_json(os.path.join(path, n,
                                           "zarr.json"))["shape"]) >= 2
            else -1)
    px, attrs = _read_v3_array(os.path.join(path, key))
    out_meta = dict(attrs)
    out_meta["zarr_array"] = key
    if px.ndim < 2:
        return px, None, _nodata_of(attrs), out_meta
    if px.ndim > 2:
        px = px.reshape(-1, *px.shape[-2:]).transpose(1, 2, 0)
        if px.shape[2] == 1:
            px = px[:, :, 0]
    gt = None
    gm = attrs.get("grid_mapping")
    if isinstance(gm, str) and os.path.isdir(os.path.join(path, gm)):
        _, gm_attrs = _read_v3_array(os.path.join(path, gm))
        if gm_attrs.get("GeoTransform"):
            parts = str(gm_attrs["GeoTransform"]).split()
            if len(parts) >= 6:
                gt = tuple(float(v) for v in parts[:6])
        if gm_attrs.get("spatial_ref"):
            out_meta["spatial_ref"] = str(gm_attrs["spatial_ref"])
    if gt is None:
        # v3 CF grid_mapping carries no GeoTransform: derive it from
        # the x/y coordinate arrays (+ bottom-up flip by y order)
        def coord(names_want, length):
            for n in names:
                if n.rsplit("/", 1)[-1].lower() in names_want:
                    v, _ = _read_v3_array(os.path.join(path, n))
                    if v.ndim == 1 and len(v) == length:
                        return v.astype(np.float64)
            return None
        xs = coord(("x", "lon", "longitude"), px.shape[1])
        ys = coord(("y", "lat", "latitude"), px.shape[0])
        if xs is not None and ys is not None and len(xs) > 1 \
                and len(ys) > 1:
            dx = float(xs[1] - xs[0])
            dy = abs(float(ys[1] - ys[0]))
            gt = (float(xs[0]) - dx / 2, dx, 0.0,
                  float(ys.max()) + dy / 2, 0.0, -dy)
            if ys[1] > ys[0]:
                px = px[::-1].copy()
                out_meta["bottom_up"] = True
    return px, gt, _nodata_of(attrs), out_meta
