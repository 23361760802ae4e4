"""Distributed contour vs single-grid oracle: per-level polyline-length
multisets must match after cross-tile endpoint stitching."""

import numpy as np
import pytest

from gdal_ray.core.contour import contour_lines
from gdal_ray.stages.contour_merge import (distributed_contour,
                                           split_with_overlap)


def field(shape, seed=0):
    y, x = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float64)
    return (np.sin(x / 11.0 + seed) * np.cos(y / 9.0)
            + 0.3 * np.sin((x + y) / 17.0))


def oracle(grid, levels):
    """Per-level sorted polyline lengths from the global contour."""
    out = {}
    for lv, line in contour_lines(grid, levels):
        seg = float(np.hypot(np.diff(line[:, 0]), np.diff(line[:, 1])).sum())
        out.setdefault(lv, []).append(round(seg, 5))
    return {k: sorted(v) for k, v in out.items()}


@pytest.mark.parametrize("shape,tile,levels", [
    ((65, 97), (33, 33), [0.0]),
    ((97, 65), (33, 33), [-0.4, 0.0, 0.4]),
])
def test_matches_single_grid(ray_session, shape, tile, levels):
    import ray.data as rd
    grid = field(shape)
    ds = rd.from_items(split_with_overlap(grid, *tile))
    got = distributed_contour(ds, levels)
    got_ms = {}
    for _, r in got.iterrows():
        got_ms.setdefault(float(r["level"]), []).append(
            round(float(r["total_length"]), 5))
    got_ms = {k: sorted(v) for k, v in got_ms.items()}
    want = oracle(grid, levels)
    assert set(got_ms) == set(want)
    for lv in want:
        assert got_ms[lv] == want[lv], lv
    # cross-tile stitching actually fired
    assert (got["n_pieces"] > 1).any()


def test_stress_10x_tiles(ray_session):
    """~10× the tile count of the parametrized cases: Ray-side final
    aggregation still matches the single-grid oracle exactly."""
    import ray.data as rd
    grid = field((161, 289), seed=9)
    ds = rd.from_items(split_with_overlap(grid, 17, 17))   # 180 tiles
    got_ds = distributed_contour(ds, [0.0], as_dataset=True)
    got = got_ds.to_pandas()
    want = oracle(grid, [0.0])
    got_l = sorted(round(float(v), 5) for v in got["total_length"])
    assert got_l == want[0.0]
    assert (got["n_pieces"] > 4).any()


def test_single_tile(ray_session):
    import ray.data as rd
    grid = field((33, 33), seed=2)
    ds = rd.from_items(split_with_overlap(grid, 33, 33))
    got = distributed_contour(ds, [0.0])
    want = oracle(grid, [0.0])
    got_l = sorted(round(float(v), 5) for v in got["total_length"])
    assert got_l == want[0.0]
    assert (got["n_pieces"] == 1).all()


def test_unaligned_grid_fully_covered(ray_session):
    """Grid sizes that are NOT multiples of (tile-1) must still cover
    every sample (the truncation bug dropped trailing rows/cols)."""
    import ray.data as rd
    grid = field((60, 100), seed=5)
    ds = rd.from_items(split_with_overlap(grid, 33, 33))
    got = distributed_contour(ds, [0.0])
    want = oracle(grid, [0.0])
    got_l = sorted(round(float(v), 5) for v in got["total_length"])
    assert got_l == want[0.0]
