"""ADBC/DuckDB reader tests — parity with autotest/ogr/ogr_adbc.py
(duckdb layer reading, duckdb-spatial geometry deserialization,
parquet-via-duckdb) validated against the poly.shp twin."""

import os

import numpy as np
import pytest

from gdal_ray.core import wkb

DATA = "/root/reference/autotest/ogr/data"

duckdb = pytest.importorskip("duckdb")

from gdal_ray.sources.adbc import (list_duckdb_tables,  # noqa: E402
                                   read_duckdb)

pytestmark = pytest.mark.skipif(not os.path.exists(DATA),
                                reason="reference absent")


def test_duckdb_poly_layer():
    p = os.path.join(DATA, "duckdb/poly.duckdb")
    assert list_duckdb_tables(p) == ["poly"]
    t = read_duckdb(p)
    assert t.num_rows == 10
    assert "wkb" in t.column_names
    # attribute parity with the shapefile twin
    from gdal_ray.sources.shapefile import read_shapefile
    ref = read_shapefile(os.path.join(DATA, "poly.shp"))
    assert sorted(v.as_py() for v in t["EAS_ID"]) == \
        sorted(v.as_py() for v in ref["EAS_ID"])


def test_duckdb_spatial_geometry_roundtrip():
    # duckdb-spatial serialized polygons → WKB with identical vertex
    # sets and envelopes (winding may be normalized)
    t = read_duckdb(os.path.join(DATA, "duckdb/poly.duckdb"))
    from gdal_ray.sources.shapefile import read_shapefile
    ref = read_shapefile(os.path.join(DATA, "poly.shp"))
    ref_envs = {tuple(np.round(wkb.loads(v.as_py()).envelope(), 3))
                for v in ref["wkb"]}
    for v in t["wkb"]:
        g = wkb.loads(v.as_py())
        assert g.geom_type == wkb.POLYGON
        assert tuple(np.round(g.envelope(), 3)) in ref_envs


def test_duckdb_with_spatial_index():
    t = read_duckdb(os.path.join(DATA,
                                 "duckdb/poly_with_spatial_index.duckdb"))
    assert t.num_rows == 10


def test_duckdb_sql_open_option():
    t = read_duckdb(os.path.join(DATA, "duckdb/poly.duckdb"),
                    sql="SELECT EAS_ID FROM poly WHERE EAS_ID > 170 "
                        "ORDER BY EAS_ID")
    assert t.num_rows > 0
    vals = [v.as_py() for v in t["EAS_ID"]]
    assert vals == sorted(vals) and all(v > 170 for v in vals)


def test_duckdb_over_parquet():
    # the ADBC driver's parquet path (test_ogr_adbc_duckdb_parquet)
    t = read_duckdb(os.path.join(
        DATA, "parquet/partitioned_flat/part.0.parquet"))
    assert t.num_rows == 3
