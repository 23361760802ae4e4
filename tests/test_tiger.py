"""TIGER/Line CompleteChain reader — synthetic module built to the
published RT1/RT2 column layout (tigercompletechain.cpp tables)."""

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.tiger import read_tiger


def _rt1_record(tlid, name, cfcc, fr, to, zipl=35004):
    rec = [" "] * 228
    rec[0] = "1"
    def put(beg, end, text, right=False):
        text = str(text)
        width = end - beg + 1
        s = text.rjust(width) if right else text.ljust(width)
        rec[beg - 1:end] = list(s[:width])
    put(6, 15, tlid, right=True)
    put(16, 16, 1, right=True)
    put(17, 17, "A")
    put(20, 49, name)
    put(56, 58, cfcc)
    put(107, 111, zipl, right=True)
    put(131, 132, 1, right=True)
    put(135, 137, 1, right=True)
    put(191, 200, int(round(fr[0] * 1e6)), right=True)
    put(201, 209, int(round(fr[1] * 1e6)), right=True)
    put(210, 219, int(round(to[0] * 1e6)), right=True)
    put(220, 228, int(round(to[1] * 1e6)), right=True)
    return "".join(rec)


def _rt2_record(tlid, rtsq, pts):
    rec = [" "] * 208
    rec[0] = "2"
    def put(beg, end, text):
        s = str(text).rjust(end - beg + 1)
        rec[beg - 1:end] = list(s[:end - beg + 1])
    put(6, 15, tlid)
    put(16, 18, rtsq)
    for i, (lon, lat) in enumerate(pts):
        start = 19 + 19 * i
        put(start, start + 9, int(round(lon * 1e6)))
        put(start + 10, start + 18, int(round(lat * 1e6)))
    return "".join(rec)


@pytest.fixture()
def module(tmp_path):
    rt1 = "\r\n".join([
        _rt1_record(100101, "MAIN", "A41", (-86.5, 33.5), (-86.49, 33.51)),
        _rt1_record(100102, "OAK AVE", "A41", (-86.48, 33.52),
                    (-86.47, 33.53)),
    ]) + "\r\n"
    rt2 = "\n".join([
        _rt2_record(100101, 1, [(-86.497, 33.503), (-86.493, 33.507)]),
    ]) + "\n"
    open(tmp_path / "TGR01001.RT1", "w").write(rt1)
    open(tmp_path / "TGR01001.RT2", "w").write(rt2)
    return str(tmp_path / "TGR01001.RT1")


def test_complete_chain(module):
    t = read_tiger(module)
    assert t.num_rows == 2
    d = t.to_pydict()
    assert d["TLID"] == [100101, 100102]
    assert d["FENAME"] == ["MAIN", "OAK AVE"]
    assert d["CFCC"] == ["A41", "A41"]
    assert d["ZIPL"] == [35004, 35004]
    assert d["STATEL"] == [1, 1]
    assert d["MODULE"] == ["TGR01001", "TGR01001"]
    # geometry: chain 1 gets the two RT2 interior vertices
    g = W.loads(d["wkb_geometry"][0])
    np.testing.assert_allclose(
        g.coords,
        [(-86.5, 33.5), (-86.497, 33.503), (-86.493, 33.507),
         (-86.49, 33.51)], atol=1e-9)
    g2 = W.loads(d["wkb_geometry"][1])
    assert len(g2.coords) == 2  # no shape points for chain 2


def test_open_directory_and_dispatch(module, tmp_path):
    t = read_tiger(str(tmp_path))
    assert t.num_rows == 2
    from gdal_ray.sources.drivers import read_vector
    t2 = read_vector(module)
    assert t2.num_rows == 2
    with pytest.raises(ValueError, match="not supported"):
        read_tiger(module, layer="AltName")
