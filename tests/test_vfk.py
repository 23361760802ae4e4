"""VFK Czech-cadastre reader (sources/vfk.py) — reference autotest
ogr_vfk.py expectations on bylany.vfk: 61 data blocks, PAR layer with
28 fields and one polygon of envelope area ~2010.5, one SOBR point
with CISLO_BODU 55, SBP chain 5 of integer length 10, HP
linestrings."""

import numpy as np

from gdal_ray.core.wkb import loads
from gdal_ray.sources.drivers import read_vector
from gdal_ray.sources.vfk import read_vfk

F = "/root/reference/autotest/ogr/data/vfk/bylany.vfk"


class TestVfk:
    def test_layers_and_par(self):
        layers = read_vfk(F)
        assert len(layers) == 61
        par = layers["PAR"]
        assert par.num_rows == 1
        attrs = [c for c in par.column_names
                 if c not in ("fid", "wkb", "minx", "miny", "maxx",
                              "maxy")]
        assert len(attrs) == 28
        g = loads(par["wkb"][0].as_py())
        assert g.type_name == "Polygon"
        e = g.envelope()
        assert abs((e[2] - e[0]) * (e[3] - e[1]) - 2010.5) <= 0.5

    def test_sobr_points(self):
        sobr = read_vfk(F)["SOBR"]
        hits = [v for v in sobr["CISLO_BODU"].to_pylist() if v == 55]
        assert len(hits) == 1
        assert loads(sobr["wkb"][0].as_py()).type_name == "Point"

    def test_sbp_chain_length(self):
        sbp = read_vfk(F)["SBP"]
        pts = loads(sbp["wkb"][4].as_py()).coords   # FID 5
        L = np.sum(np.hypot(np.diff(pts[:, 0]), np.diff(pts[:, 1])))
        assert int(L) == 10

    def test_hp_and_routing(self):
        hp = read_vfk(F)["HP"]
        assert loads(hp["wkb"][0].as_py()).type_name == "LineString"
        t = read_vector(F)
        assert t.num_rows == 1      # PAR is the default layer
