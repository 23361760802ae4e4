"""XLS (BIFF8) reader vs the reference's ogr_xls.py expectations."""

import pyarrow as pa
import pytest

from gdal_ray.sources.xls import read_xls_layers, read_xls_table

FIX = "/root/reference/autotest/ogr/data/xls/test972000xp.xls"


def test_xls_layers_and_types():
    # ogr_xls.py test_ogr_xls_1: 1 layer "Feuille1", 3 features,
    # 5 fields typed Integer/Real/String/Date/DateTime
    layers = read_xls_layers(FIX)
    assert list(layers) == ["Feuille1"]
    t = layers["Feuille1"]
    assert t.num_rows == 3
    assert t.column_names == ["fid", "FirstCol", "SecondCol", "ThirdCol",
                              "FourthCol", "FifthCol"]
    assert t.schema.field("FirstCol").type == pa.int64()
    assert t.schema.field("SecondCol").type == pa.float64()
    assert t.schema.field("ThirdCol").type == pa.string()
    # Date/DateTime surface as OGR-formatted strings
    assert t.schema.field("FourthCol").type == pa.string()
    assert t.schema.field("FifthCol").type == pa.string()


def test_xls_first_feature():
    t = read_xls_table(FIX)
    row = {k: v[0] for k, v in t.to_pydict().items()}
    assert row["FirstCol"] == 1
    assert row["SecondCol"] == 1.0
    assert row["ThirdCol"] is None            # unset field
    assert row["FourthCol"] == "1980/01/01"
    assert row["FifthCol"] == "1980/01/01 00:00:00"


def test_xls_all_rows():
    t = read_xls_table(FIX)
    d = t.to_pydict()
    assert d["FirstCol"] == [1, None, 3]
    assert d["SecondCol"] == [1.0, 2.5, 3.0]
    assert d["ThirdCol"] == [None, "Val2", "Val_avec_é"]
    assert d["FourthCol"] == ["1980/01/01", "1980/01/02", None]
    # mixed Date/Time/DateTime column promotes to DateTime
    # (ogrxlslayer.cpp:150-155 + OGRParseDate zero-fill)
    assert d["FifthCol"] == ["1980/01/01 00:00:00",
                             "1980/01/02 12:34:56",
                             "0000/00/00 12:34:56"]


def test_xls_headers_disable():
    # ogr_xls.py test_ogr_xls_2: OGR_XLS_HEADERS=DISABLE -> 4 features
    layers = read_xls_layers(FIX, headers=False)
    t = layers["Feuille1"]
    assert t.num_rows == 4
    assert t.column_names[1] == "Field1"


def test_xls_field_types_string():
    # ogr_xls.py test_ogr_xls_3: OGR_XLS_FIELD_TYPES=STRING
    layers = read_xls_layers(FIX, field_types="STRING")
    t = layers["Feuille1"]
    for name in t.column_names[1:]:
        assert t.schema.field(name).type == pa.string()
    assert t.num_rows == 3


def test_xls_driver_dispatch():
    from gdal_ray.sources.drivers import read_vector
    t = read_vector(FIX)
    assert t.num_rows == 3
