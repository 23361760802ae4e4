"""WAsP .map r/w tests mirroring ogr_wasp.py's elevation layout
checks (record line = '%11.3f %11d', altitude per feature, 3 points
per line)."""

import numpy as np

from gdal_ray.core import wkb
from gdal_ray.sources.wasp import read_wasp, write_wasp


def test_wasp_elevation_layout(tmp_path):
    p = str(tmp_path / "t.map")
    feats = [(float(j), [(j, 0.0), (j, 0.5), (j, 1.0)])
             for j in range(10)]
    write_wasp(p, feats)
    # the reference test's literal file check: after 4 header lines,
    # every other line is "h n" with n == 3 and h == feature index
    lines = open(p).read().splitlines()[4:]
    j = 0
    for i, ln in enumerate(lines):
        if not i % 2:
            h, n = ln.split()
            assert int(n) == 3
            assert float(h) == j
            j += 1
    assert j == 10


def test_wasp_roundtrip(tmp_path):
    p = str(tmp_path / "t.map")
    feats = [(5.0, [(0.0, 0.0), (100.0, 50.0), (200.0, 0.0)]),
             (10.0, [(0.0, 10.0), (50.0, 60.0)])]
    write_wasp(p, feats)
    t = read_wasp(p)
    assert t.num_rows == 2
    assert [v.as_py() for v in t["elev"]] == [5.0, 10.0]
    g = wkb.loads(t["wkb"][0].as_py())
    np.testing.assert_allclose(g.coords,
                               [(0, 0), (100, 50), (200, 0)])


def test_wasp_roughness(tmp_path):
    p = str(tmp_path / "r.map")
    write_wasp(p, [(0.1, 0.4, [(0.0, 0.0), (10.0, 10.0)])],
               roughness=True)
    t = read_wasp(p)
    assert t["z_left"][0].as_py() == 0.1
    assert t["z_right"][0].as_py() == 0.4
