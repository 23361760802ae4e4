"""INTERLIS 1 reader tests — parity with autotest/ogr/ogr_ili.py
(field values per transfer-element order, FORMAT blank/undefined/
continue handling, Latin-1 encoding, AREA polygonization with
reference-point assignment, arc stroking)."""

import os

import numpy as np
import pytest

from gdal_ray.core import wkb
from gdal_ray.sources.ili import read_ili1

D = "/root/reference/autotest/ogr/data/ili"

pytestmark = pytest.mark.skipif(not os.path.exists(D),
                                reason="reference absent")


def test_ili1_layers_and_fields():
    L = read_ili1(os.path.join(D, "Beispiel.itf"),
                  os.path.join(D, "Beispiel.imd"))
    assert set(L) == {"Bodenbedeckung__BoFlaechen",
                      "Bodenbedeckung__BoFlaechen_Form",
                      "Bodenbedeckung__Strasse",
                      "Bodenbedeckung__Gebaeude"}
    bo = L["Bodenbedeckung__BoFlaechen"]
    assert bo.num_rows == 3
    # 2nd feature of test_ogr_interlis1_2: [20, 1, 168.27, 170.85]
    vals = [bo[c][1].as_py() for c in
            ("TID", "Art", "Form_0", "Form_1")]
    assert vals == ["20", "1", "168.27", "170.85"]


def test_ili1_area_polygonization():
    L = read_ili1(os.path.join(D, "Beispiel.itf"),
                  os.path.join(D, "Beispiel.imd"))
    bo = L["Bodenbedeckung__BoFlaechen"]
    g = wkb.loads(bo["wkb"][0].as_py())
    assert g.geom_type == wkb.POLYGON
    exp = {(146.92, 174.98), (138.68, 187.51), (147.04, 193.0),
           (149.79, 188.82), (158.15, 194.31), (163.64, 185.96)}
    got = {(round(float(x), 2), round(float(y), 2))
           for x, y in g.rings[0]}
    assert got == exp                   # test_ogr_interlis1_10 ring
    pt = wkb.loads(bo["wkb_point"][0].as_py())
    assert tuple(np.round(pt.coords[0], 2)) == (148.2, 183.48)


def test_ili1_format_default():
    L = read_ili1(os.path.join(D, "format-default.itf"),
                  os.path.join(D, "format-default.imd"))
    t = L["FormatTests__FormatTable"]
    vals = [t[c][0].as_py() for c in t.column_names if c != "wkb"]
    assert vals == ["0", "aa bb", "cc^dd", None, "1"]


def test_ili1_format_custom():
    L = read_ili1(os.path.join(D, "format-test.itf"),
                  os.path.join(D, "format-test.imd"))
    t = L["FormatTests__FormatTable"]
    vals = [t[c][0].as_py() for c in t.column_names if c != "wkb"]
    assert vals == ["0", "aa_bb", "cc dd", None, "1"]


def test_ili1_latin1_encoding():
    L = read_ili1(os.path.join(D, "encoding-test.itf"),
                  os.path.join(D, "format-default.imd"))
    t = L["FormatTests__FormatTable"]
    vals = [t[c][0].as_py() for c in t.column_names if c != "wkb"]
    assert vals == ["0", "äöü", "ÄÖÜ", None, "1"]


def test_ili1_point_and_polyline():
    L = read_ili1(os.path.join(D, "Beispiel.itf"),
                  os.path.join(D, "Beispiel.imd"))
    g = L["Bodenbedeckung__Gebaeude"]
    assert [g[c][0].as_py() for c in
            ("TID", "AssNr", "Flaeche")] == ["40", "958", "10"]
    pt = wkb.loads(g["wkb"][0].as_py())
    assert tuple(np.round(pt.coords[0], 2)) == (148.41, 175.96)
    s = L["Bodenbedeckung__Strasse"]
    ls = wkb.loads(s["wkb"][0].as_py())
    assert ls.geom_type == wkb.LINESTRING
    assert len(ls.coords) > 4               # ARCP stroked


def test_ili1_multigeom():
    # test_ogr_interlis1_11: 5 fields (TID, Text1, Number, point
    # components) + a polyline geometry
    L = read_ili1(os.path.join(D, "multigeom.itf"),
                  os.path.join(D, "multigeom.imd"))
    t = L["MultigeomTests__MultigeomTable"]
    assert t.num_rows == 1
    assert [c for c in t.column_names if c != "wkb"] == \
        ["TID", "Text1", "Number", "GeomPoint_0", "GeomPoint_1"]
    assert t["Text1"][0].as_py() == "aa bb"
    g = wkb.loads(t["wkb"][0].as_py())
    assert g.geom_type in (wkb.LINESTRING, wkb.GEOMETRYCOLLECTION)


def test_ili1_multicoord():
    # test_ogr_interlis1_12: 6 fields over two coord attributes
    L = read_ili1(os.path.join(D, "multicoord.itf"),
                  os.path.join(D, "multicoord.imd"))
    t = L["MulticoordTests__MulticoordTable"]
    assert t.num_rows == 1
    assert len([c for c in t.column_names if c != "wkb"]) == 6


def test_ili1_surface():
    # test_ogr_interlis1_13: SURFACE-kind boundary helper tables with
    # per-owner ring assignment + declared Structure classes as layers
    L = read_ili1(os.path.join(D, "surface.itf"),
                  os.path.join(D, "surface.imd"))
    assert set(L) == {
        "SURFC_TOP__SURFC_TBL", "SURFC_TOP__SURFC_TBL_SHAPE",
        "SURFC_TOP__SURFC_TBL_TEXT_ID",
        "SURFC_TOP__SURFC_TBL_TEXT_ID_SHAPE",
        "SURFC_TOP__LineAttrib1", "SURFC_TOP__Flaechenelement",
        "SURFC_TOP__Flaechenelement_Geometrie"}
    t = L["SURFC_TOP__SURFC_TBL"]
    assert t.num_rows == 4
    assert L["SURFC_TOP__SURFC_TBL_SHAPE"].num_rows == 5
    vals = [t[c][0].as_py() for c in t.column_names if c != "wkb"]
    assert vals == ["103", "1", "3", "1", "23", "25000", "20060111"]
    g = wkb.loads(t["wkb"][0].as_py())
    assert g.geom_type == wkb.POLYGON
    assert tuple(np.round(g.rings[0][0], 3)) == (598600.961, 249487.174)
    # second feature's boundary includes a stroked arc
    g2 = wkb.loads(t["wkb"][1].as_py())
    assert len(g2.rings[0]) > 8
