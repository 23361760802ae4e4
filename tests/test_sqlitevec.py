"""SQLite / SpatiaLite vector reader (sources/sqlitevec.py) —
reference fixtures poly_spatialite.sqlite (legacy text-typed
geometry_columns, compressed polygons), poly_spatialite4.sqlite
(v4 int-typed), first_geometry_null.db (OGR-style plain-WKB blobs
with a NULL geometry).  Geometry parity is checked against the
poly.shp source of the same layer (compressed coords are float32
deltas, so envelope-tolerance 0.5)."""

import numpy as np

from gdal_ray.core.wkb import envelopes_of_wkb, loads
from gdal_ray.sources.drivers import read_vector
from gdal_ray.sources.shapefile import read_shapefile
from gdal_ray.sources.sqlitevec import read_sqlite, spatialite_to_wkb

D = "/root/reference/autotest/ogr/data/sqlite"


class TestSpatialite:
    def test_legacy_v3(self):
        t = read_sqlite(f"{D}/poly_spatialite.sqlite")
        assert t.num_rows == 10
        assert t.column_names[:4] == ["fid", "area", "eas_id",
                                      "prfedea"]
        ps = read_shapefile("/root/reference/autotest/ogr/data/poly.shp")
        e1 = np.sort(envelopes_of_wkb(t["wkb"].to_pylist()), axis=0)
        e2 = np.sort(envelopes_of_wkb(ps["wkb"].to_pylist()), axis=0)
        assert np.allclose(e1, e2, atol=0.5)

    def test_v4(self):
        t = read_sqlite(f"{D}/poly_spatialite4.sqlite")
        assert t.num_rows == 10
        g = loads(t["wkb"][0].as_py())
        assert g.type_name.lower() == "polygon"

    def test_plain_wkb_and_null(self):
        t = read_sqlite(f"{D}/first_geometry_null.db")
        assert t.num_rows == 2
        assert t["wkb"].null_count == 1
        g = loads(t["wkb"][1].as_py())
        assert g.type_name.lower() in ("multipolygon", "polygon")

    def test_routing(self):
        t = read_vector(f"{D}/poly_spatialite.sqlite")
        assert t.num_rows == 10

    def test_bad_blob(self):
        import pytest
        with pytest.raises(ValueError):
            spatialite_to_wkb(b"\x55" * 50)
