"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in gdal_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline: synthetic image corpus (BASELINE.json shape) →
    georef → base-tile render at z8 → spatial join of image footprints
    against the polygon layer. Returns the join result joined with tile
    counts — a small, stable-schema Dataset."""
    from gdal_ray.pipelines.queries import q_image_tiles, q_image_spatial_join

    sf_dir = "/root/testdata/sf0.001"
    tiles = q_image_tiles(sf_dir)          # exercises decode→warp→encode
    n_tiles = tiles.count()
    joined = q_image_spatial_join(sf_dir)  # exercises the cell shuffle join
    import pyarrow as pa

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("n_tiles_rendered",
                               pa.array([n_tiles] * t.num_rows, pa.int64()))

    return joined.map_batches(tag, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    from gdal_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from gdal_ray.pipelines.queries import oracle_sql as _o

    return _o()
