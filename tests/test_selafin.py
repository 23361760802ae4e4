"""Selafin r/w tests mirroring the reference's ogr_selafin.py create
semantics: a 5x5 node grid with value = i*5+j, 4x4 quad elements —
element attribute = average of its node values (feature 5 → 9,
feature 10 → 15, exactly the driver-test expectations)."""

import numpy as np
import pytest

from gdal_ray.core import wkb
from gdal_ray.sources.selafin import read_selafin, write_selafin


@pytest.fixture()
def grid_slf(tmp_path):
    # nodes in the same creation order as the reference test:
    # (i, j) for i in 0..4 for j in 0..4, value = i*5+j
    xs, ys, vals = [], [], []
    for i in range(5):
        for j in range(5):
            xs.append(float(i))
            ys.append(float(j))
            vals.append(float(i * 5 + j))
    # 4x4 quad elements, 1-based node ids (node (i, j) = i*5+j+1)
    ikle = []
    for i in range(4):
        for j in range(4):
            n = i * 5 + j + 1
            ikle.append([n, n + 1, n + 6, n + 5])
    p = str(tmp_path / "grid.slf")
    write_selafin(p, xs, ys, np.array(ikle), {"value": np.array(vals)})
    return p


def test_selafin_points(grid_slf):
    layers = read_selafin(grid_slf)
    pts = layers["points"]
    assert pts.num_rows == 25
    assert pts["value"][7].as_py() == 7.0
    g = wkb.loads(pts["wkb"][6].as_py())
    assert tuple(g.coords[0]) == (1.0, 1.0)


def test_selafin_element_attribute_average(grid_slf):
    layers = read_selafin(grid_slf)
    el = layers["elements"]
    assert el.num_rows == 16
    # reference assertions: element 5 → 9, element 10 → 15
    assert el["value"][5].as_py() == pytest.approx(9.0, abs=0.01)
    assert el["value"][10].as_py() == pytest.approx(15.0, abs=0.01)
    g = wkb.loads(el["wkb"][0].as_py())
    assert g.geom_type == wkb.POLYGON
    assert len(g.rings[0]) == 5


def test_selafin_multi_timestep(tmp_path):
    p = str(tmp_path / "t.slf")
    write_selafin(p, [0, 1, 2], [0, 0, 0], np.array([[1, 2, 3]]),
                  {"H": np.array([[1.0, 2.0, 3.0],
                                  [4.0, 5.0, 6.0]])},
                  times=[0.0, 10.0])
    t0 = read_selafin(p, timestep=0)["points"]
    t1 = read_selafin(p, timestep=1)["points"]
    assert [v.as_py() for v in t0["H"]] == [1.0, 2.0, 3.0]
    assert [v.as_py() for v in t1["H"]] == [4.0, 5.0, 6.0]
    assert t1.schema.metadata[b"time"] == b"10.0"
