"""Distributed cumulative viewshed — the Ray-Data expression of the
reference's cumulative mode (alg/viewshed/cumulative.cpp: one viewshed
per grid observer, summed into a count raster; its thread pool becomes
our task fan-out).

Shape for scale: the DEM ships to the object store ONCE (``ray.put``)
and every task reads it zero-copy per batch; observers fan out as
dataset rows; each batch emits one PARTIAL count grid; partials merge
in a worker-side tree (sum is associative) so the driver never holds
more than the single final grid — the same discipline as the mosaic
reduce (pipelines/queries.py::q_mosaic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..core.viewshed import viewshed

__all__ = ["observer_grid", "cumulative_viewshed"]


def observer_grid(w: int, h: int, nx: int, ny: int, *, margin: float = 0.1):
    """Deterministic observer lattice over the DEM interior —
    cumulative.cpp walks every OBSERVER_SPACING-th cell; a fixed
    nx×ny lattice is the bounded-count equivalent."""
    xs = np.linspace(w * margin, w * (1 - margin), nx).round().astype(int)
    ys = np.linspace(h * margin, h * (1 - margin), ny).round().astype(int)
    gx, gy = np.meshgrid(xs, ys)
    return pa.table({
        "obs_id": pa.array(np.arange(nx * ny), pa.int64()),
        "ox": pa.array(gx.ravel(), pa.int64()),
        "oy": pa.array(gy.ravel(), pa.int64()),
    })


def cumulative_viewshed(dem: np.ndarray, observers: pa.Table, *,
                        observer_height: float = 0.0,
                        target_height: float = 0.0,
                        cell_mode: str = "edge",
                        batch_size: int = 8, fanin: int = 8):
    """Per-observer visibility counts + the summed visibility-count
    grid. Returns ``(obs_ids, visible_px, acc)`` where ``acc[y, x]`` =
    number of observers that see pixel (x, y)."""
    dem = np.ascontiguousarray(np.asarray(dem, np.float64))
    h, w = dem.shape
    dem_ref = ray.put(dem)

    def partial(t: pa.Table) -> pa.Table:
        d = ray.get(dem_ref)            # zero-copy plasma view
        acc = np.zeros((h, w), np.int64)
        ids, vis = [], []
        for i in range(t.num_rows):
            out, _ = viewshed(d, int(t["ox"][i].as_py()),
                              int(t["oy"][i].as_py()),
                              observer_height=observer_height,
                              target_height=target_height,
                              cell_mode=cell_mode,
                              visible_val=1.0, invisible_val=0.0)
            acc += out.astype(np.int64)
            ids.append(int(t["obs_id"][i].as_py()))
            vis.append(int(out.sum()))
        return pa.table({
            "acc": pa.array([acc.tobytes()], pa.binary()),
            "obs_ids": pa.array([ids], pa.list_(pa.int64())),
            "visible_px": pa.array([vis], pa.list_(pa.int64())),
        })

    def merge_round(t: pa.Table) -> pa.Table:
        acc = np.zeros((h, w), np.int64)
        ids, vis = [], []
        for i in range(t.num_rows):
            acc += np.frombuffer(t["acc"][i].as_py(),
                                 np.int64).reshape(h, w)
            ids.extend(t["obs_ids"][i].as_py())
            vis.extend(t["visible_px"][i].as_py())
        return pa.table({
            "acc": pa.array([acc.tobytes()], pa.binary()),
            "obs_ids": pa.array([ids], pa.list_(pa.int64())),
            "visible_px": pa.array([vis], pa.list_(pa.int64())),
        })

    n_obs = observers.num_rows
    parts = ray.data.from_arrow(observers) \
        .repartition(max(1, n_obs // batch_size)) \
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
    n = -(-n_obs // batch_size)
    while n > 1:
        parts = parts.repartition(n).map_batches(
            merge_round, batch_format="pyarrow", batch_size=fanin)
        n = -(-n // fanin)
    final = parts.take_all()[0]
    acc = np.frombuffer(final["acc"], np.int64).reshape(h, w).copy()
    order = np.argsort(final["obs_ids"])
    ids = np.asarray(final["obs_ids"])[order]
    vis = np.asarray(final["visible_px"])[order]
    return ids, vis, acc
