"""S-57 ENC reader (sources/iso8211.py + sources/s57.py) — behavior
goldens from autotest/ogr/ogr_s57.py."""

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.s57 import read_s57_layers

D = "/root/reference/autotest/ogr/data/s57"

LAYER_COUNTS = {
    "DSID": 1, "COALNE": 1, "DEPARE": 4, "DEPCNT": 4, "LNDARE": 1,
    "LNDELV": 2, "SBDARE": 2, "SLCONS": 1, "SLOTOP": 1, "SOUNDG": 2,
    "M_COVR": 1, "M_NSYS": 1, "M_QUAL": 1,
}

M_QUAL_RING = [
    (60.976834, -32.49534), (60.976834, -32.49762),
    (60.976834, -32.498666), (60.97869, -32.498666),
    (60.979426, -32.498666), (60.982152, -32.498666),
    (60.983166, -32.498666), (60.983166, -32.497558),
    (60.983166, -32.49477), (60.983166, -32.4935),
    (60.981468, -32.4935), (60.980298, -32.4935),
    (60.979474, -32.4935), (60.979016, -32.4935),
    (60.976834, -32.4935), (60.976834, -32.494426),
    (60.976834, -32.494698), (60.976834, -32.49534)]

SOUNDG_PTS = [(60.981644, -32.49449, 3.4), (60.981344, -32.496424, 1.4),
              (60.978142, -32.494874, -3.2), (60.980712, -32.495196, 1.2)]


class TestS57:
    def test_layers(self):
        L = read_s57_layers(f"{D}/1B5X02NE.000")
        assert {k: len(v) for k, v in L.items()} == LAYER_COUNTS

    def test_coalne(self):
        L = read_s57_layers(f"{D}/1B5X02NE.000")
        c = L["COALNE"].to_pylist()[0]
        assert c["RCID"] == 1
        assert c["LNAM"] == "FFFF7F4F0FB002D3"
        assert c["OBJL"] == 30
        assert c["AGEN"] == 65535
        g = W.loads(c["wkb"])
        assert g.type_name == "LineString"

    def test_m_qual_polygon(self):
        L = read_s57_layers(f"{D}/1B5X02NE.000")
        m = L["M_QUAL"].to_pylist()[0]
        assert m["RCID"] == 15 and m["OBJL"] == 308 and \
            m["AGEN"] == 65535
        g = W.loads(m["wkb"])
        assert g.type_name == "Polygon"
        assert np.allclose(g.rings[0], M_QUAL_RING, atol=1e-6)

    def test_soundg_multipoint_z(self):
        L = read_s57_layers(f"{D}/1B5X02NE.000")
        s = L["SOUNDG"].to_pylist()[0]
        assert s["RCID"] == 20 and s["OBJL"] == 129 and \
            s["AGEN"] == 65535
        assert s["QUASOU"] == ["1"]
        g = W.loads(s["wkb"])
        assert g.type_name == "MultiPoint"
        got = [(p.coords[0][0], p.coords[0][1], z)
               for p, z in zip(g.parts, s["z"])]
        assert np.allclose(got, SOUNDG_PTS, atol=1e-6)

    def test_double_byte_attrs(self):
        L = read_s57_layers(f"{D}/bug1526.000")
        f = L["FOGSIG"].to_pylist()[0]
        assert f["INFORM"] == ("During South winds nautophone is not "
                               "always heard in S direction from "
                               "lighthouse")
        assert len(f["NINFOM"]) >= 1

    def test_multilinestring(self):
        L = read_s57_layers(f"{D}/bug2147_3R7D0889.000")
        g = W.loads(L["ROADWY"]["wkb"][0].as_py())
        assert g.type_name == "MultiLineString"
        assert len(g.parts) == 8
        want_head = [(22.5659615, 44.5541942), (22.5652045, 44.5531651),
                     (22.5654315, 44.5517774)]
        assert np.allclose(g.parts[0].coords[:3], want_head, atol=1e-7)

    def test_dispatch(self):
        from gdal_ray.sources.drivers import read_vector
        t = read_vector(f"{D}/1B5X02NE.000")
        assert len(t) >= 1


class TestGtfs:
    def test_gtfs_extract(self):
        from gdal_ray.sources.gtfs import read_gtfs_layers
        L = read_gtfs_layers(
            "/root/reference/autotest/ogr/data/gtfs/gtfs_extract.zip")
        assert len(L) == 9
        assert L["agency"].to_pylist()[0]["agency_name"] == "SOLEA"
        assert L["calendar"].to_pylist()[0]["start_date"] == "2023/01/02"
        assert sum(1 for v in L["routes"]["route_type"].to_pylist()
                   if v == 3) == 30
        s = L["stops"].to_pylist()[0]
        assert s["arrival_time"] == "05:37:00"
        g = W.loads(s["wkb"])
        assert tuple(g.coords[0]) == (7.280823, 47.763704)
        t = L["trips"].to_pylist()[0]
        g = W.loads(t["wkb"])
        assert len(g.coords) == 35
        assert np.allclose(g.coords[:2],
                           [(7.280823, 47.763704), (7.278051, 47.762217)])
        sg = L["shapes_geom"].to_pylist()[0]
        assert sg["shape_id"] == "80013"
        g = W.loads(sg["wkb"])
        assert np.allclose(g.coords[0], (7.28084, 47.763684))


class TestMapml:
    def test_poly(self):
        from gdal_ray.sources.mapml import read_mapml_layers
        L = read_mapml_layers(
            "/root/reference/autotest/ogr/data/mapml/poly.mapml")
        assert list(L) == ["poly"]
        t = L["poly"]
        assert len(t) == 10
        r = t.to_pylist()[0]
        assert r["AREA"] == 215229.266
        assert r["EAS_ID"] == 168
        g = W.loads(r["wkb"])
        assert g.type_name == "Polygon"
