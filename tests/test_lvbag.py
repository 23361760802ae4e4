"""LVBAG reader tests — parity with autotest/ogr/ogr_lvbag.py (layer
names, feature/field counts, first-feature values, zip archives)."""

import os

import pytest

from gdal_ray.core import wkb
from gdal_ray.sources.lvbag import read_lvbag

DATA = "/root/reference/autotest/ogr/data/lvbag"

pytestmark = pytest.mark.skipif(not os.path.exists(DATA),
                                reason="reference absent")


@pytest.mark.parametrize("fn,lname,nrows,nfields", [
    ("lig.xml", "Ligplaats", 3, 17),
    ("num.xml", "Nummeraanduiding", 3, 22),
    ("opr.xml", "Openbareruimte", 4, 19),
    ("pnd.xml", "Pand", 6, 16),
    ("sta.xml", "Standplaats", 2, 17),
    ("vbo.xml", "Verblijfsobject", 3, 20),
    ("wpl.xml", "Woonplaats", 2, 16),
])
def test_lvbag_layer_shape(fn, lname, nrows, nfields):
    layers = read_lvbag(os.path.join(DATA, fn))
    assert list(layers) == [lname]
    t = layers[lname]
    assert t.num_rows == nrows
    assert len(t.column_names) - 1 == nfields        # minus wkb


def test_lvbag_ligplaats_values():
    t = read_lvbag(os.path.join(DATA, "lig.xml"))["Ligplaats"]
    exp = {
        "hoofdadresnummeraanduidingref":
            "NL.IMBAG.Nummeraanduiding.0106200000005333",
        "nevenadresnummeraanduidingref": None,
        "identificatie": "NL.IMBAG.Ligplaats.0106020000000003",
        "status": "Plaats aangewezen",
        "geconstateerd": 0,
        "documentdatum": "2009/05/26",
        "documentnummer": "2009-01000",
        "voorkomenidentificatie": 1,
        "begingeldigheid": "2009/05/26",
        "eindgeldigheid": None,
        "tijdstipregistratie": "2009/11/06 13:37:22",
        "eindregistratie": None,
        "tijdstipregistratielv": "2009/11/06 14:07:51.498",
        "tijdstipnietbaglv": None,
    }
    for k, v in exp.items():
        assert t[k][0].as_py() == v, k
    g = wkb.loads(t["wkb"][0].as_py())
    assert g.geom_type == wkb.POLYGON
    assert t.schema.metadata[b"crs"] == b"EPSG:28992"


def test_lvbag_num_woonplaatsref():
    t = read_lvbag(os.path.join(DATA, "num.xml"))["Nummeraanduiding"]
    assert t["huisnummer"][0].as_py() == 23
    assert t["postcode"][0].as_py() == "9403KB"
    assert t["woonplaatsref"][0].as_py() is None
    assert t["woonplaatsref"][1].as_py() == "NL.IMBAG.Woonplaats.1050"
    assert t["openbareruimteref"][0].as_py() == \
        "NL.IMBAG.Openbareruimte.0106300000002560"
    assert t["tijdstipregistratielv"][0].as_py() == \
        "2009/11/06 12:38:46.603"


def test_lvbag_opr_verkorte_naam():
    t = read_lvbag(os.path.join(DATA, "opr.xml"))["Openbareruimte"]
    assert t["naam"][0].as_py() == "Twaalfsuurlaan"
    assert t["verkortenaam"][0].as_py() is None
    assert t["naam"][3].as_py() == "Schout bij Nacht Doormansingel"
    assert t["verkortenaam"][3].as_py() == "Sbn Doormansingel"


def test_lvbag_pnd_bouwjaar():
    t = read_lvbag(os.path.join(DATA, "pnd.xml"))["Pand"]
    bj = [v.as_py() for v in t["oorspronkelijkbouwjaar"]]
    assert bj[0] == 2009 and bj[3] == 2007 and bj[4] == 1975 \
        and bj[5] == 2001
    # srsDimension=3 posList decodes to 2-D rings
    g = wkb.loads(t["wkb"][0].as_py())
    assert g.geom_type == wkb.POLYGON


def test_lvbag_wpl_names():
    t = read_lvbag(os.path.join(DATA, "wpl.xml"))["Woonplaats"]
    assert [v.as_py() for v in t["naam"]] == ["Assen", "Loon"]
    assert t["identificatie"][0].as_py() == "NL.IMBAG.Woonplaats.2391"


def test_lvbag_zip_archives():
    z = read_lvbag(os.path.join(DATA, "archive_pnd.zip"))
    assert z["Pand"].num_rows == 4
    z2 = read_lvbag(os.path.join(DATA, "archive_mixed.zip"))
    assert sorted(z2) == ["Pand", "Standplaats"]
