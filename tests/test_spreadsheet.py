"""XLSX / ODS readers — behavior goldens from
autotest/ogr/{ogr_xlsx,ogr_ods}.py ogr_xlsx_check / ogr_ods_check:
sheet list, 26-row Feuille1, Feuille7 column types and values."""

import pytest

from gdal_ray.sources.spreadsheet import (read_ods_layers,
                                          read_xlsx_layers,
                                          read_xlsx_table)

D = "/root/reference/autotest/ogr/data"

WANT_TYPES = {"Col1": "string", "Col2": "int64", "Col3": "double",
              "Col4": "double", "Col5": "string", "Col6": "string",
              "Col7": "double", "Col8": "string", "Col9": "double",
              "Col10": "int64", "Col11": "double", "Col12": "string"}


def check_feuille7(t):
    got = {f.name: str(f.type) for f in t.schema if f.name != "fid"}
    assert got == WANT_TYPES
    r = t.to_pylist()[0]
    assert r["Col1"] == "val"
    assert r["Col2"] == 23
    assert r["Col3"] == 3.45
    assert r["Col4"] == 0.52
    assert r["Col5"] == "2012/01/22"
    assert r["Col6"] == "2012/01/22 18:49:00"
    assert r["Col8"] == "12:34:56"
    assert t.to_pylist()[1]["Col3"] is None


class TestXlsx:
    def test_layers_and_types(self):
        L = read_xlsx_layers(f"{D}/xlsx/test.xlsx")
        assert list(L)[0] == "Feuille1"
        assert len(L["Feuille1"]) == 26
        check_feuille7(L["Feuille7"])

    def test_inline_str(self):
        t = read_xlsx_table(f"{D}/xlsx/inlineStr.xlsx")
        vals = [v for col in t.itercolumns()
                for v in col.to_pylist() if isinstance(v, str)]
        assert vals  # inline strings surfaced

    def test_row_without_r(self):
        t = read_xlsx_table(f"{D}/xlsx/row_without_r_attribute.xlsx")
        assert len(t) >= 1

    def test_empty_last_field(self):
        t = read_xlsx_table(f"{D}/xlsx/test_empty_last_field.xlsx")
        assert len(t) >= 1

    def test_datetime_file(self):
        t = read_xlsx_table(f"{D}/xlsx/datetime.xlsx")
        assert len(t) >= 1


class TestOds:
    def test_layers_and_types(self):
        L = read_ods_layers(f"{D}/ods/test.ods")
        assert list(L)[0] == "Feuille1"
        assert len(L["Feuille1"]) == 26
        check_feuille7(L["Feuille7"])

    def test_repeated_columns(self):
        L = read_ods_layers(f"{D}/ods/testrepeatedcolatendofrow.ods")
        t = next(iter(L.values()))
        assert len(t) >= 1

    def test_ragged_rows(self):
        L = read_ods_layers(
            f"{D}/ods/first_line_3_cols_second_line_2_cols.ods")
        t = next(iter(L.values()))
        assert t.num_columns >= 4  # fid + 3 cols

    def test_multiple_text_p(self):
        L = read_ods_layers(f"{D}/ods/multiple_text_p_elements.ods")
        t = next(iter(L.values()))
        vals = [v for col in t.itercolumns()
                for v in col.to_pylist() if isinstance(v, str)]
        assert any("\n" in v for v in vals)
