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


def oracle(grid: np.ndarray, conn: int = 4):
    """(value, area) multiset of global components."""
    lab = label_components(grid, conn)
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


@pytest.mark.parametrize("seed,shape,tile", [
    (0, (64, 96), (32, 32)),
    (5, (64, 64), (16, 16)),
])
def test_8connect_matches_single_grid(ray_session, seed, shape, tile):
    """8-connectivity (GDAL polygonize -8): the stitch must see
    diagonal adjacency along shared edges AND at the corner points
    shared by four tiles."""
    import ray.data as rd
    rng = np.random.default_rng(seed)
    from gdal_ray.stages.raster_ops import convolve
    base = rng.normal(size=shape)
    smooth = convolve(base, np.ones((3, 3)) / 9.0)  # rougher: many
    grid = np.digitize(smooth, [-0.2, 0.2]).astype(np.int64)  # diagonals
    ds = rd.from_items(tiles_of(grid, *tile))
    got = distributed_polygonize(ds, connectedness=8)
    got_ms = sorted(zip(got["value"].astype(int),
                        got["total_px"].astype(int)))
    assert got_ms == oracle(grid, 8)
    assert (got["n_tiles"] > 1).any()


def test_8connect_pure_corner_touch(ray_session):
    """A component that continues ONLY through the 4-tile corner
    point — the case the edge-run rule alone cannot see."""
    import ray.data as rd
    grid = np.zeros((8, 8), np.int64)
    grid[3, 3] = 1          # SE corner pixel of tile (0,0)
    grid[4, 4] = 1          # NW corner pixel of tile (1,1)
    grid[4, 3] = 2          # the anti-diagonal pair (tiles (0,1)/(1,0))
    grid[3, 4] = 2
    ds = rd.from_items(tiles_of(grid, 4, 4))
    got = distributed_polygonize(ds, connectedness=8)
    got_ms = sorted(zip(got["value"].astype(int),
                        got["total_px"].astype(int)))
    assert got_ms == oracle(grid, 8)
    ones = got[got["value"] == 1]
    assert len(ones) == 1 and int(ones["total_px"].iloc[0]) == 2
    twos = got[got["value"] == 2]
    assert len(twos) == 1 and int(twos["total_px"].iloc[0]) == 2
    # 4-connect on the same grid must NOT merge them
    got4 = distributed_polygonize(ds, connectedness=4)
    assert len(got4[got4["value"] == 1]) == 2


def test_single_tile_degenerates_to_local(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(3)
    grid = rng.integers(0, 3, (32, 32)).astype(np.int64)
    ds = rd.from_items(tiles_of(grid, 32, 32))
    got = distributed_polygonize(ds)
    assert sorted(zip(got["value"].astype(int),
                      got["total_px"].astype(int))) == oracle(grid)
    assert (got["n_tiles"] == 1).all()
