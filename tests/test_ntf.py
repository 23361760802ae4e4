"""NTF (generic profile) reader — synthetic volume following the
transport-format record grammar (ntfrecord.cpp, ntffilereader.cpp)."""

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.ntf import read_ntf


def _rec(body, cont="0"):
    return body + cont + "%"


@pytest.fixture()
def volume(tmp_path):
    xy = 10
    def coords(*pts, line=False):
        sep = "0" if line else ""
        return "".join(f"{int(round(x*100)):0{xy}d}"
                       f"{int(round(y*100)):0{xy}d}{sep}"
                       for x, y in pts)
    lines = [
        _rec("01ORDNANCE SURVEY NTF VOLUME"),
        _rec("02OS_LANDLINE_SAMPLE"),
        # section: tile, XYLEN 10 at 15-19, XY_MULT 1000 (=1.0m? ->
        # /1000 = 1; our coords use 0.01 units so mult field 10)
        _rec("07SP300100  "         # 3-12 tile
             + "  " + f"{xy:05d}"   # 13-14 pad + XYLEN 15-19
             + " " + f"{10:010d}"   # 20 pad + XY_MULT 21-30
             + " " * 16             # 31-46
             + f"{400000:010d}"     # X_ORIGIN 47-56
             + f"{200000:010d}"),   # Y_ORIGIN 57-66
        # attribute descriptions
        _rec("40FC004     Feature Code\\"),
        _rec("40TX000     Text\\"),
        # point feature with attributes + geometry
        _rec("15000001"),
        _rec("14000001FC0042TXHello\\0"),
        _rec("2100000110001" + coords((12.5, 30.25))),
        # line feature (3 coords, one duplicate dropped)
        _rec("23000002"),
        _rec("14000002FC0117" + "0"),
        _rec("2100000220003" + coords((0, 0), (0, 0), (5, 7), line=True)),
        _rec("99"),
    ]
    p = str(tmp_path / "vol.ntf")
    open(p, "w").write("\n".join(lines) + "\n")
    return p


def test_generic_features(volume):
    t = read_ntf(volume)
    assert t.num_rows == 2
    d = t.to_pydict()
    assert d["KIND"] == ["POINT", "LINE"]
    assert d["FID"] == [1, 2]
    assert d["Feature Code"] == ["0042", "0117"]
    assert d["Text"] == ["Hello", None]
    g = W.loads(d["wkb_geometry"][0])
    # XY_MULT 10/1000 = 0.01; coords stored *100
    np.testing.assert_allclose(
        g.coords[0], [400012.5, 200030.25], atol=1e-9)
    g2 = W.loads(d["wkb_geometry"][1])
    assert len(g2.coords) == 2  # duplicate first vertex dropped
    np.testing.assert_allclose(g2.coords[-1], [400005.0, 200007.0])
    assert t.schema.metadata[b"tile"] == b"SP300100"


def test_continuation_merge(tmp_path):
    # a record split across two physical lines with the '1' flag
    lines = [
        _rec("01VOLUME"),
        "07SP300100    00010 00000010" + "1%",
        _rec("00" + " " * 18 + f"{400000:010d}" + f"{200000:010d}"),
        _rec("15000001"),
        _rec("2100000110001" + f"{1250:010d}" + f"{3025:010d}"),
        _rec("99"),
    ]
    p = str(tmp_path / "v.ntf")
    open(p, "w").write("\n".join(lines) + "\n")
    t = read_ntf(p)
    assert t.num_rows == 1
    g = W.loads(t["wkb_geometry"][0].as_py())
    np.testing.assert_allclose(g.coords[0], [400012.5, 200030.25])


def test_nitf_guard(tmp_path):
    from gdal_ray.sources.drivers import read_vector
    p = str(tmp_path / "x.ntf")
    open(p, "wb").write(b"NITF02.10" + b"\x00" * 100)
    with pytest.raises(ValueError, match="NITF raster"):
        read_vector(p)


def test_not_ntf():
    with pytest.raises(ValueError, match="volume header"):
        read_ntf(__file__)
