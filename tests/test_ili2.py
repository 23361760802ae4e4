"""INTERLIS 2 (.xtf) reader tests — parity with the autotest
ogr_ili.py interlis2 expectations (layer sets for 2.3 and 2.4
transfers, declared-structure layers with a model, FixpunktVersion
field/geometry values)."""

import os

import pytest

from gdal_ray.core import wkb
from gdal_ray.core.wkt import dumps_wkt
from gdal_ray.sources.ili2 import read_ili2

D = "/root/reference/autotest/ogr/data/ili"

pytestmark = pytest.mark.skipif(not os.path.exists(D),
                                reason="reference absent")


def test_ili2_layers_without_model():
    L = read_ili2(os.path.join(D, "RoadsExdm2ien.xml"))
    assert sorted(L) == sorted([
        "RoadsExdm2ben.Roads.LandCover",
        "RoadsExdm2ben.Roads.Street",
        "RoadsExdm2ien.RoadsExtended.StreetAxis",
        "RoadsExdm2ben.Roads.StreetNamePosition",
        "RoadsExdm2ien.RoadsExtended.RoadSign",
    ])


def test_ili2_layers_with_model():
    # the model adds the inline LINEATTR structure class
    L = read_ili2(os.path.join(D, "RoadsExdm2ien.xml"),
                  os.path.join(D, "RoadsExdm2ien.imd"))
    assert "RoadsExdm2ben.Roads.LAttrs" in L
    assert len(L) == 6


def test_ili2_surface_geometry():
    L = read_ili2(os.path.join(D, "RoadsExdm2ien.xml"))
    lc = L["RoadsExdm2ben.Roads.LandCover"]
    g = wkb.loads(lc["wkb"][0].as_py())
    assert g.geom_type == wkb.POLYGON
    assert lc["Type"][0].as_py() == "water"


def test_ili2_24_transfer():
    # INTERLIS 2.4 namespaced layout (test_ogr_interlis2_4)
    L = read_ili2(os.path.join(D, "fpds2_v1_1.xtf"))
    assert sorted(L) == sorted([
        "UebersichtGeodienst", "UebersichtMassstab", "Zustaendigkeit",
        "Fixpunkt", "FixpunktAktion", "FixpunkteNachfuehrung",
        "FixpunktVersion"])
    fv = L["FixpunktVersion"]
    assert fv.num_rows == 7
    r = {c: fv[c][0].as_py() for c in fv.column_names if c != "wkb"}
    assert r["TID"] == "1667a884-a4a8-461f-8db1-4fbb395b0e57"
    assert r["UntergegangenAm"] == "2006-11-13"
    assert float(r["HoeheGen"]) == 0.05
    assert float(r["HoeheGeom"]) == 535.36
    assert r["Koordinatenbestimmung"] == "transformiert"
    assert r["Punktzeichen"] == "Stein"
    assert r["FP"] == "72b72689-85cb-411a-9022-7de6fbd3277b"
    assert r["FPN"] == "ba10bace-1efc-4abb-8a59-ebd40a006c9e"
    g = wkb.loads(fv["wkb"][0].as_py())
    assert dumps_wkt(g) == "POINT (2761075.728 1198812.021)"
