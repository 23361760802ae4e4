"""Distributed polygonize vs single-grid oracle: component count and
per-component areas must match exactly after cross-tile stitching."""

import numpy as np
import pandas as pd
import pytest

from gdal_ray.core.rastervec import label_components
from gdal_ray.stages.poly_merge import distributed_polygonize


def tiles_of(grid: np.ndarray, th: int, tw: int):
    """Split a global grid into tile rows for the distributed op."""
    H, W = grid.shape
    rows = []
    for ty in range(0, H // th):
        for tx in range(0, W // tw):
            sub = grid[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            rows.append({"tile_x": tx, "tile_y": ty, "h": th, "w": tw,
                         "grid": np.ascontiguousarray(sub,
                                                      np.int64).tobytes()})
    return rows


def oracle(grid: np.ndarray):
    """(value, area) multiset of global components."""
    lab = label_components(grid, 4)
    out = []
    for c in range(lab.max() + 1):
        m = lab == c
        ys, xs = np.nonzero(m)
        out.append((int(grid[ys[0], xs[0]]), int(m.sum())))
    return sorted(out)


@pytest.mark.parametrize("seed,shape,tile", [
    (0, (64, 96), (32, 32)),
    (7, (96, 64), (32, 32)),
    (13, (64, 64), (16, 16)),
])
def test_matches_single_grid(ray_session, seed, shape, tile):
    import ray.data as rd
    rng = np.random.default_rng(seed)
    # blobby field: threshold smooth noise into 3 classes so components
    # span many tiles
    base = rng.normal(size=shape)
    k = np.ones((9, 9)) / 81.0
    from gdal_ray.stages.raster_ops import convolve
    smooth = convolve(base, np.ones((5, 5)) / 25.0)
    grid = np.digitize(smooth, [-0.1, 0.1]).astype(np.int64)
    ds = rd.from_items(tiles_of(grid, *tile))
    got = distributed_polygonize(ds)
    got_ms = sorted(zip(got["value"].astype(int), got["total_px"].astype(int)))
    want_ms = oracle(grid)
    assert got_ms == want_ms
    # stitching really happened: some component spans multiple tiles
    assert (got["n_tiles"] > 1).any()


def test_stress_10x_tiles_no_driver_materialization(ray_session):
    """10× the tile count of the parametrized cases (8×16 = 128 tiles):
    the Ray-side final aggregation (no .to_pandas() on the piece table)
    still stitches exactly, and the Dataset path streams the result."""
    import ray.data as rd
    rng = np.random.default_rng(42)
    from gdal_ray.stages.raster_ops import convolve
    base = rng.normal(size=(128, 256))
    smooth = convolve(base, np.ones((7, 7)) / 49.0)
    grid = np.digitize(smooth, [-0.05, 0.05]).astype(np.int64)
    ds = rd.from_items(tiles_of(grid, 16, 16))     # 128 tiles
    got_ds = distributed_polygonize(ds, as_dataset=True)
    got = got_ds.to_pandas()                       # per-component only
    got_ms = sorted(zip(got["value"].astype(int),
                        got["total_px"].astype(int)))
    assert got_ms == oracle(grid)
    assert (got["n_tiles"] > 4).any()              # deep stitching


def test_single_tile_degenerates_to_local(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(3)
    grid = rng.integers(0, 3, (32, 32)).astype(np.int64)
    ds = rd.from_items(tiles_of(grid, 32, 32))
    got = distributed_polygonize(ds)
    assert sorted(zip(got["value"].astype(int),
                      got["total_px"].astype(int))) == oracle(grid)
    assert (got["n_tiles"] == 1).all()
