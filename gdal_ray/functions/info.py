"""gdalinfo / ogrinfo analogs — one-call dataset summaries.

Reference semantics:
  gdalinfo  apps/gdalinfo_lib.cpp — driver, size, CRS, geotransform,
      per-band type/nodata/stats/checksum
  ogrinfo   apps/ogrinfo_lib.cpp (-so summary) — layer feature count,
      extent, geometry type, field schema

Both are driver-side conveniences over small inputs; at corpus scale
the same numbers come from the distributed stats queries
(raster_stats, raster_index)."""

from __future__ import annotations

import numpy as np

__all__ = ["raster_info", "vector_info"]


def raster_info(buf: bytes, fmt: str | None = None, *,
                compute_stats: bool = True) -> dict:
    """Decode + summarize one raster blob (gdalinfo -stats analog)."""
    from ..codecs import decode as codec_decode
    from ..core.checksum import checksum

    geotransform = crs = nodata = None
    _CANON = {"png": "PNG", "jpeg": "JPEG", "jpg": "JPEG", "bmp": "BMP",
              "pnm": "PNM", "pgm": "PNM", "ppm": "PNM", "gtiff": "GTiff",
              "tif": "GTiff", "tiff": "GTiff"}
    driver = _CANON.get(fmt, fmt) if fmt else None
    if (fmt in ("gtiff", "tif", "tiff")
            or (fmt is None and buf[:2] in (b"II", b"MM"))):
        from ..codecs.gtiff import decode_gtiff
        g = decode_gtiff(buf)
        px = g.pixels
        geotransform, crs, nodata = g.geotransform, g.crs, g.nodata
        driver = "GTiff"
    else:
        px = codec_decode(buf, fmt)
        if driver is None:
            driver = {b"\x89": "PNG", b"BM": "BMP", b"P": "PNM",
                      b"\xff": "JPEG", b"G": "GRJ1"}.get(buf[:1], "?")
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nb = px.shape
    info = {
        "driver": driver,
        "size": (w, h),
        "bands": nb,
        "dtype": str(px.dtype),
        "geotransform": geotransform,
        "crs": crs,
        "nodata": nodata,
        "band_info": [],
    }
    for b in range(nb):
        band = px[:, :, b]
        bi = {"band": b + 1, "checksum": int(checksum(band))}
        if compute_stats:
            f = band.astype(np.float64)
            if nodata is not None:
                f = np.where(band == nodata, np.nan, f)
            bi.update(
                minimum=float(np.nanmin(f)), maximum=float(np.nanmax(f)),
                mean=float(np.nanmean(f)), stddev=float(np.nanstd(f)))
        info["band_info"].append(bi)
    return info


def vector_info(table, *, wkb_col: str = "wkb") -> dict:
    """Summarize a feature table (ogrinfo -so analog): count, extent,
    geometry-type histogram, field schema. Accepts a pyarrow Table or
    a Ray Dataset (small results only — the distributed path is the
    raster_index/envelope queries)."""
    import pyarrow as pa

    from ..core import wkb as W

    if not isinstance(table, pa.Table):
        table = table.to_arrow() if hasattr(table, "to_arrow") \
            else pa.Table.from_pandas(table)
    n = table.num_rows
    fields = [(f.name, str(f.type)) for f in table.schema
              if f.name != wkb_col]
    ext = [np.inf, np.inf, -np.inf, -np.inf]
    gtypes: dict[str, int] = {}
    if wkb_col in table.column_names:
        for b in table.column(wkb_col).to_pylist():
            g = W.loads(b)
            gtypes[g.type_name] = gtypes.get(g.type_name, 0) + 1
            e = g.envelope()
            if np.isfinite(e[0]):
                ext[0] = min(ext[0], e[0])
                ext[1] = min(ext[1], e[1])
                ext[2] = max(ext[2], e[2])
                ext[3] = max(ext[3], e[3])
    return {
        "feature_count": n,
        "extent": tuple(ext) if np.isfinite(ext[0]) else None,
        "geometry_types": gtypes,
        "fields": fields,
    }
