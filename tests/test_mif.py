"""MapInfo MIF/MID driver — golden parity with the reference's own
all_geoms.mif + .golden.csv and all_possible_fields fixtures
(autotest/ogr/data/mitab)."""

import os
import re
import tempfile

import numpy as np
import pytest

from gdal_ray.core import wkb as W
from gdal_ray.sources.mif import read_mif_table, write_mif

D = "/root/reference/autotest/ogr/data/mitab/"

# indices whose WKT the golden derives from mitab's curve/label
# discretization (Ellipse, RoundRect, Arc×2, Text anchor) — compared
# loosely (type + envelope); everything else is coordinate-exact
_LOOSE = {8, 9, 10, 11, 12}


def _golden():
    import csv
    return list(csv.DictReader(open(D + "all_geoms.mif.golden.csv")))


def _wkt_coords(wkt: str) -> np.ndarray:
    nums = re.findall(r"-?\d+\.?\d*(?:[eE][-+]?\d+)?", wkt)
    return np.asarray(nums, np.float64).reshape(-1, 2)


class TestAllGeoms:
    def test_types_match_golden(self):
        t = read_mif_table(D + "all_geoms.mif")
        golden = _golden()
        assert t.num_rows == len(golden) == 16
        for i, row in enumerate(golden):
            g = W.loads(t["wkb"][i].as_py())
            exp = row["WKT"].split("(")[0].strip().replace(" ", "")
            assert g.type_name.upper() == exp, i

    def test_linear_coords_exact(self):
        t = read_mif_table(D + "all_geoms.mif")
        for i, row in enumerate(_golden()):
            if i in _LOOSE:
                continue
            g = W.loads(t["wkb"][i].as_py())
            ours = W._all_coords(g)
            theirs = _wkt_coords(row["WKT"])
            # ring closure may duplicate a vertex differently; compare
            # the unique vertex sets
            a = np.unique(ours.round(9), axis=0)
            b = np.unique(theirs.round(9), axis=0)
            assert np.array_equal(a, b), i

    def test_curved_envelopes(self):
        t = read_mif_table(D + "all_geoms.mif")
        for i in (8, 9, 10, 11):            # RoundRect/Ellipse/Arc/Arc
            g = W.loads(t["wkb"][i].as_py())
            env = g.envelope()
            theirs = _wkt_coords(_golden()[i]["WKT"])
            exp = (theirs[:, 0].min(), theirs[:, 1].min(),
                   theirs[:, 0].max(), theirs[:, 1].max())
            assert np.allclose(env, exp, atol=2e-3), i


class TestFields:
    def test_all_possible_fields(self):
        t = read_mif_table(D + "all_possible_fields.mif")
        assert t.num_rows == 2
        assert t["field1"].to_pylist() == ["test", "test"]
        assert t["Field2"].to_pylist() == [120, 120]
        assert t["Field4"].to_pylist() == [123456789012345] * 2
        assert t["Field5"].to_pylist() == [12.34, 12.34]
        assert t["Field10"].to_pylist() == [True, False]
        # both features are geometry-less ("none")
        assert t["wkb"].to_pylist() == [None, None]


class TestRoundtrip:
    def test_geoms_and_fields(self):
        src = read_mif_table(D + "all_geoms.mif")
        d = tempfile.mkdtemp(prefix="mif_", dir="/tmp")
        p = os.path.join(d, "rt.mif")
        n = write_mif(src, p)
        assert n == 16
        back = read_mif_table(p)
        assert back.num_rows == 16
        for i in range(16):
            a = W.loads(src["wkb"][i].as_py())
            b = W.loads(back["wkb"][i].as_py())
            # writer normalizes Rect/Ellipse/Arc/Text into their
            # discretized geometry kinds; coordinates must survive
            assert np.allclose(W._all_coords(a), W._all_coords(b))

    def test_fields_roundtrip(self):
        src = read_mif_table(D + "all_possible_fields.mif")
        d = tempfile.mkdtemp(prefix="mif2_", dir="/tmp")
        p = os.path.join(d, "rt.mif")
        write_mif(src, p)
        back = read_mif_table(p)
        assert back["Field2"].to_pylist() == [120, 120]
        assert back["Field10"].to_pylist() == [True, False]
        assert back["field1"].to_pylist() == ["test", "test"]

    def test_driver_registry(self):
        from gdal_ray.sources.drivers import read_vector
        assert read_vector(D + "all_geoms.mif").num_rows == 16
