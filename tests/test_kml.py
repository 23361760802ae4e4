"""KML superoverlay sink: structure, bounds, child links."""
import os
import re

import numpy as np
import pytest

from gdal_ray.core import mercator as merc
from gdal_ray.pipelines.kml import (doc_kml, tile_kml, tile_latlon_bounds,
                                    write_superoverlay)
from gdal_ray.pipelines.tiles import tile_pyramid


def test_tile_latlon_bounds_roundtrip():
    z, x, y = 6, 33, 21
    s, w, n, e = tile_latlon_bounds(z, x, y)
    assert s < n and w < e
    # center of the box maps back to the same tile
    mx, my = merc.latlon_to_meters((s + n) / 2, (w + e) / 2)
    tx, ty_tms = merc.meters_to_tile(np.array([mx]), np.array([my]), z)
    assert int(tx[0]) == x
    assert int(merc.tms_to_xyz(ty_tms, z)[0]) == y


def test_tile_kml_structure():
    body = tile_kml(5, 10, 11, [(20, 22), (21, 23)], max_zoom=6)
    assert body.startswith('<?xml version="1.0"')
    assert body.count("<NetworkLink>") == 2
    assert "<href>11.png</href>" in body               # own overlay
    assert "../../6/20/22.kml" in body                 # child link
    assert "<minLodPixels>128</minLodPixels>" in body
    # mid-pyramid level limits its visibility range
    assert "<maxLodPixels>2048</maxLodPixels>" in body


def test_deepest_level_unbounded_lod():
    body = tile_kml(6, 1, 2, [], max_zoom=6)
    assert "<maxLodPixels>-1</maxLodPixels>" in body
    assert "<NetworkLink>" not in body


def test_doc_kml_links_top_tiles():
    body = doc_kml([(3, 4), (3, 5)], 5)
    assert body.count("<NetworkLink>") == 2
    assert "<href>5/3/4.kml</href>" in body


@pytest.fixture(scope="module")
def pyramid():
    return tile_pyramid(24, zoom=6, min_z=5)


def test_write_superoverlay_tree(pyramid, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("so"))
    man = write_superoverlay(pyramid, out)
    assert os.path.exists(os.path.join(out, "doc.kml"))
    for z, ds in pyramid.items():
        rows = ds.select_columns(["x", "y"]).take_all()
        assert man[f"z={z}"]["n_kml"] == len(rows)
        for r in rows[:5]:
            p = os.path.join(out, str(z), str(r["x"]), f"{r['y']}.kml")
            assert os.path.exists(p)
            assert os.path.exists(p[:-4] + ".png")
    # every NetworkLink target in doc.kml exists on disk
    doc = open(os.path.join(out, "doc.kml")).read()
    for href in re.findall(r"<href>([^<]+\.kml)</href>", doc):
        assert os.path.exists(os.path.join(out, href)), href
    # child links from a min-zoom tile resolve too
    z0 = min(pyramid)
    r = pyramid[z0].select_columns(["x", "y"]).take(1)[0]
    body = open(os.path.join(out, str(z0), str(r["x"]),
                             f"{r['y']}.kml")).read()
    for href in re.findall(r"<href>(\.\./\.\./[^<]+\.kml)</href>", body):
        full = os.path.normpath(os.path.join(out, str(z0), str(r["x"]),
                                             href))
        assert os.path.exists(full), href
