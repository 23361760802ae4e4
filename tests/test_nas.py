"""NAS (ALKIS) reader parity against the reference autotest
expectations (autotest/ogr/ogr_nas.py tests 3-5 + billion-laugh,
fixtures in autotest/ogr/data/nas/)."""

import pytest

from gdal_ray.sources.nas import is_nas, read_nas, read_nas_layers

D = "/root/reference/autotest/ogr/data/nas"


def test_empty():
    # test_ogr_nas_3: empty file opens with 0 layers
    assert read_nas_layers(f"{D}/empty_nas.xml") == {}


def test_delete_transactions():
    # test_ogr_nas_4
    layers = read_nas_layers(f"{D}/delete_nas.xml")
    assert list(layers) == ["Delete"]
    t = layers["Delete"]
    assert t.num_rows == 3
    d = t.to_pydict()
    assert d["context"][0] == "Delete"
    assert d["typeName"][0] == "AX_Namensnummer"
    assert d["FeatureId"][0] == "DENW44AL00000HJU20100730T092847Z"
    assert d["FeatureId"][2] == "DENW44AL00000JLq20100730T092847Z"


def test_replace_transactions():
    # test_ogr_nas_5
    layers = read_nas_layers(f"{D}/replace_nas.xml")
    assert sorted(layers) == ["AX_Flurstueck", "Delete"]

    t = layers["Delete"]
    assert t.num_rows == 1
    d = t.to_pydict()
    assert d["context"][0] == "Replace"
    assert d["replacedBy"][0] == "DENW44AL00003IkM20110429T070635Z"
    assert d["safeToIgnore"][0] == "false"
    assert d["typeName"][0] == "AX_Flurstueck"
    assert d["FeatureId"][0] == "DENW44AL00003IkM20100809T071726Z"

    fl = layers["AX_Flurstueck"]
    assert fl.num_rows == 1
    fd = fl.to_pydict()
    assert fd["gml_id"][0] == "DENW44AL00003IkM20110429T070635Z"
    assert fd["stelle"][0] == 5212
    # the replacement feature's surface parses to a WKB polygon
    assert "wkb_geometry" in fl.column_names
    from gdal_ray.core import wkb as W
    g = W.loads(fd["wkb_geometry"][0])
    assert "POLYGON" in g.type_name.upper()


def test_billion_laugh_rejected():
    # test_ogr_nas_billion_laugh: refuse DTD entity expansion
    with pytest.raises(ValueError, match="probably corrupted"):
        read_nas_layers(f"{D}/billionlaugh.xml")


def test_is_nas_and_dispatch():
    assert is_nas(f"{D}/replace_nas.xml")
    from gdal_ray.sources.drivers import read_vector
    t = read_vector(f"{D}/replace_nas.xml")
    assert t.num_rows == 1  # first (object) layer: AX_Flurstueck


def test_read_nas_named_layer():
    t = read_nas(f"{D}/replace_nas.xml", layer="Delete")
    assert t.num_rows == 1
    with pytest.raises(ValueError, match="no layer"):
        read_nas(f"{D}/replace_nas.xml", layer="nope")
