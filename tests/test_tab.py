"""MapInfo TAB binary driver (.tab/.dat/.map/.id) — parity with the
reference's mitab fixtures (autotest/ogr/data/mitab): all_geoms.tab vs
the golden CSV, utm31 precision rounding, poly_indexed attributes,
cp1251 charset, aspatial tables, dbf-backed attributes and the
non-default 32256-byte block size variant."""

import csv
import os
import re
import shutil
import tempfile
import zipfile

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.tab import read_tab_table

D = "/root/reference/autotest/ogr/data/mitab/"


def _golden():
    return list(csv.DictReader(open(D + "all_geoms.mif.golden.csv")))


def _wkt_coords(wkt: str) -> np.ndarray:
    nums = re.findall(r"-?\d+\.?\d*(?:[eE][-+]?\d+)?", wkt)
    return np.asarray(nums, np.float64).reshape(-1, 2)


class TestAllGeoms:
    def test_types_match_golden(self):
        t = read_tab_table(D + "all_geoms.tab")
        golden = _golden()
        assert t.num_rows == len(golden) == 16
        for i, row in enumerate(golden):
            g = W.loads(t["wkb"][i].as_py())
            exp = row["WKT"].split("(")[0].strip().replace(" ", "")
            assert g.type_name.upper() == exp, i

    def test_coords_match_golden(self):
        # the .map integer coords quantize the golden's doubles at the
        # header scale (1e-9 here); the curve discretization itself
        # (TABGenerateArc) must line up point-for-point
        t = read_tab_table(D + "all_geoms.tab")
        for i, row in enumerate(_golden()):
            g = W.loads(t["wkb"][i].as_py())
            ours = np.unique(W._all_coords(g).round(6), axis=0)
            theirs = np.unique(_wkt_coords(row["WKT"]).round(6), axis=0)
            assert ours.shape == theirs.shape, i
            assert np.allclose(ours, theirs, atol=1e-6), i

    def test_text_payload(self):
        t = read_tab_table(D + "all_geoms.tab")
        texts = t["mitab_text"].to_pylist()
        assert texts[12] == "text"

    def test_big_block_size_variant(self):
        # same table written with 32256-byte .map blocks
        d = tempfile.mkdtemp(prefix="tabz_", dir="/tmp")
        with zipfile.ZipFile(D + "all_geoms_block_32256.zip") as z:
            z.extractall(d)
        tab = None
        for root, _, files in os.walk(d):
            for f in files:
                if f.lower().endswith(".tab"):
                    tab = os.path.join(root, f)
        assert tab is not None
        a = read_tab_table(tab)
        b = read_tab_table(D + "all_geoms.tab")
        assert a.num_rows == b.num_rows
        for i in range(a.num_rows):
            ga = W.loads(a["wkb"][i].as_py())
            gb = W.loads(b["wkb"][i].as_py())
            assert np.allclose(W._all_coords(ga), W._all_coords(gb)), i
        shutil.rmtree(d, ignore_errors=True)


class TestPrecision:
    def test_utm31_exact_rounding(self):
        # test_ogr_mitab_19: strict text comparison to check precision
        t = read_tab_table(D + "utm31.TAB")
        g = W.loads(t["wkb"][0].as_py())
        assert (float(g.coords[0, 0]), float(g.coords[0, 1])) == \
            (485248.12, 2261.45)


class TestAttributes:
    def test_poly_indexed(self):
        # test_ogr_mitab_47: PRFEDEA = '35043413' selects one feature
        t = read_tab_table(D + "poly_indexed.tab")
        vals = t["PRFEDEA"].to_pylist()
        assert vals.count("35043413") == 1
        i = vals.index("35043413")
        g = W.loads(t["wkb"][i].as_py())
        assert g.type_name == "Polygon"

    def test_first_table_fields(self):
        t = read_tab_table(D + "first_table.tab")
        assert t.column_names[1:3] == ["joint_field", "foo"]
        assert t["joint_field"].type == "int64"

    def test_win1251_charset(self):
        # test_ogr_mitab_46: cp1251 field names and values
        t = read_tab_table(D + "tab-win1251.TAB")
        names = t.column_names[1:6]
        assert names == ["Поле_А", "Поле_Б", "Поле_В", "Поле_Г",
                         "Поле_Д"]
        assert t["Поле_А"].to_pylist()[:3] == [
            "Значение А", "Значение 1", "Полигон"]
        assert t["Поле_Д"].to_pylist()[2] == "ЪЫЁЩ"

    def test_aspatial_table(self):
        # .tab + .dat only, no .map/.id
        t = read_tab_table(D + "aspatial-table.tab")
        assert t.num_rows > 0
        assert t["wkb"].null_count == t.num_rows

    def test_aspatial_with_map(self):
        # test_ogr_mitab_49: aspatial.tab (geometry-less layer)
        t = read_tab_table(D + "aspatial.tab")
        assert t.num_rows == 3
        assert t["wkb"].null_count == 3

    def test_dbf_backed_with_delete_column(self):
        # test_ogr_mitab_read_dbf_with_delete_column: 2 visible fields
        t = read_tab_table(D + "tab_with_dbf_with_delete_column.tab")
        field_cols = [c for c in t.column_names
                      if c not in ("fid", "wkb", "minx", "miny", "maxx",
                                   "maxy", "mitab_text")]
        assert len(field_cols) == 2
        assert t["id"].to_pylist()[0] == 1
        assert t["str"].to_pylist()[0] == "foo"


class TestCRS:
    def test_lambert93(self):
        # test_ogr_mitab_18: EPSG:2154 proj parameters
        t = read_tab_table(D + "lambert93_francais.TAB")
        pj = t.schema.metadata[b"proj4"].decode()
        assert pj.startswith(
            "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 "
            "+x_0=700000 +y_0=6600000")

    def test_driver_registry(self):
        from gdal_ray.sources.drivers import read_vector
        assert read_vector(D + "all_geoms.tab").num_rows == 16
