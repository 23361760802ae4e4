"""SXF reader tests — parity with autotest/ogr/ogr_sxf.py: default
layer pair without a classifier (test_ogr_sxf_3's empty-RSC fallback)
and the 9 full-name layers with the default RSC (test_ogr_sxf_4)."""

import os

import pytest

from gdal_ray.core import wkb
from gdal_ray.sources.sxf import read_sxf

SXF = "/root/reference/autotest/ogr/data/sxf/100_test.sxf"
RSC = "/root/reference/ogr/ogrsf_frmts/sxf/data/default.rsc"

pytestmark = pytest.mark.skipif(not os.path.exists(SXF),
                                reason="reference absent")

FULL_NAMES = [
    "СИСТЕМНЫЙ",
    "ВОДНЫЕ ОБЪЕКТЫ",
    "НАСЕЛЕННЫЕ ПУНКТЫ",
    "ИНФРАСТРУКТУРА",
    "ЗЕМЛЕПОЛЬЗОВАНИЕ",
    "РЕЛЬЕФ СУШИ",
    "ГИДРОГРАФИЯ (РЕЛЬЕФ)",
    "МАТЕМАТИЧЕСКАЯ ОСНОВА",
    "Not_Classified",
]


def test_sxf_default_layers():
    # no classifier → SYSTEM + Not_Classified (test_ogr_sxf_3 with an
    # unparseable RSC expects exactly these names)
    layers = read_sxf(SXF)
    assert list(layers) == ["SYSTEM", "Not_Classified"]


def test_sxf_fullname_layers():
    if not os.path.exists(RSC):
        pytest.skip("default.rsc absent")
    layers = read_sxf(SXF, rsc_path=RSC, layer_fullname=True)
    assert list(layers) == FULL_NAMES


def test_sxf_geometry_in_passport_envelope():
    if not os.path.exists(RSC):
        pytest.skip("default.rsc absent")
    layers = read_sxf(SXF, rsc_path=RSC, layer_fullname=True)
    total = 0
    for t in layers.values():
        for v in t["wkb"]:
            b = v.as_py()
            if b is None:
                continue
            env = wkb.loads(b).envelope()
            assert 10311242 <= env[0] and env[2] <= 10344035
            assert 6174392 <= env[1] and env[3] <= 6212736
            total += 1
    assert total > 50


def test_sxf_text_and_semantics():
    layers = read_sxf(SXF)
    nc = layers["Not_Classified"]
    texts = [v.as_py() for v in nc["TEXT"] if v.as_py()]
    assert "Река" in texts            # CP1251-decoded text sign
    assert any(c.startswith("SC_") for c in nc.column_names)
    assert nc.schema.metadata[b"scale"] == b"100000"


def test_sxf_driver_registry():
    from gdal_ray.sources.drivers import read_vector
    t = read_vector(SXF)
    assert t.num_rows >= 1
