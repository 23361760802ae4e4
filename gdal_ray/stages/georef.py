"""Georeferencing stage: attach deterministic geotransform + envelope
columns to image rows.

Stateless ``map_batches`` (metadata-only — never decodes pixels): the
per-image affine transform is synthesized from the row index
(sources/geo.py), exactly how a production corpus would carry its
georeferencing in sidecar columns. Output adds:
  gt0..gt5 float64   — the 6 geotransform coefficients
  minx/miny/maxx/maxy — world envelope (axis-aligned: gt has no skew)
  native_z int32     — max zoom whose resolution is finer than the
                       image's (gdal2tiles ZoomForPixelSize semantics)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import mercator as merc
from ..sources import geo


def image_index(image_ids) -> np.ndarray:
    """'img00000042' → 42, vectorized."""
    if isinstance(image_ids, pa.ChunkedArray):
        image_ids = image_ids.combine_chunks()
    s = image_ids.to_pylist() if isinstance(image_ids, pa.Array) else list(image_ids)
    return np.array([int(v[3:]) for v in s], dtype=np.int64)


def with_georef(batch: pa.Table) -> pa.Table:
    idx = image_index(batch["image_id"])
    w = batch["w"].to_numpy().astype(np.int64)
    h = batch["h"].to_numpy().astype(np.int64)
    gt = geo.image_geotransform(idx, w, h)
    minx = gt[:, 0]
    maxy = gt[:, 3]
    maxx = minx + w * gt[:, 1]
    miny = maxy + h * gt[:, 5]
    native_z = np.asarray(merc.zoom_for_pixel_size(gt[:, 1]), dtype=np.int32)
    cols = {
        "gt0": gt[:, 0], "gt1": gt[:, 1], "gt2": gt[:, 2],
        "gt3": gt[:, 3], "gt4": gt[:, 4], "gt5": gt[:, 5],
        "minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy,
    }
    out = batch
    for name, arr in cols.items():
        out = out.append_column(name, pa.array(arr, pa.float64()))
    return out.append_column("native_z", pa.array(native_z, pa.int32()))
